"""Multi-host initialization and cross-host utilities.

The reference is strictly single-process/single-GPU (SURVEY.md §2.8). For
multi-host TPU pods, JAX needs `jax.distributed.initialize` before any
backend use; this module wraps that plus the host-local batch-sharding
helpers used by the training CLIs. On a pod slice, intra-slice collectives
ride ICI and cross-slice traffic rides DCN — both are emitted by XLA from
the same `PartitionSpec` annotations in `parallel.mesh`, so no code changes
are needed between 1-host and N-host runs.

Not exercisable in this single-chip environment; kept API-compatible with
`jax.distributed` so a pod deployment is `initialize_multihost()` + the
existing mesh helpers.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> dict:
    """Initialize jax.distributed (no-op when single-process).

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or TPU
    pod auto-detection when all are None.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_local_batch_slice(global_batch: int) -> slice:
    """Rows of the global batch owned by this host (DP over hosts)."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def make_global_batch(local_array: np.ndarray, mesh, spec):
    """Assemble a jax.Array spanning hosts from per-host shards.

    Wraps `jax.make_array_from_process_local_data` — each host passes its
    local rows; the result is a global array laid out by (mesh, spec).
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding, local_array)
