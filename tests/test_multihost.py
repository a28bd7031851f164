"""2-process CPU `jax.distributed` smoke for `parallel/multihost.py`
(VERDICT r3 #9: the pod-entry wrapper had zero coverage — unavoidable for
real pods on one chip, but the process-group init, host-local batch
slicing, and cross-process global-array assembly ARE testable with two
local CPU processes).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # subprocess spin-up + distributed init

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import jax
jax.config.update("jax_platforms", "cpu")  # override axon sitecustomize
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from llm_qat_tpu.parallel.multihost import (
    host_local_batch_slice, initialize_multihost, make_global_batch,
)

info = initialize_multihost()
assert info["process_count"] == 2, info
assert info["process_index"] in (0, 1)

devs = np.asarray(jax.devices())
mesh = Mesh(devs, ("data",))
GLOBAL_B = 8
full = np.arange(GLOBAL_B * 4, dtype=np.float32).reshape(GLOBAL_B, 4)
sl = host_local_batch_slice(GLOBAL_B)
arr = make_global_batch(full[sl], mesh, P("data", None))
assert arr.shape == (GLOBAL_B, 4)

total = jax.jit(jnp.sum)(arr)
# the global sum spans BOTH processes' rows
assert abs(float(total) - full.sum()) < 1e-3, (float(total), full.sum())
print("MULTIHOST_OK", info["process_index"], info["process_count"],
      len(jax.devices()), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CHILD], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "MULTIHOST_OK" in out, (out, err)
    # 2 processes x 2 virtual devices = 4 global devices on both
    for rc, out, err in outs:
        fields = out.strip().split()
        assert fields[-2:] == ["2", "4"], out
