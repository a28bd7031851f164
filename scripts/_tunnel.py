"""Shared axon-tunnel timing correction for the bench scripts.

A device->host roundtrip through the axon tunnel costs a fixed ~25-30 ms
per call regardless of payload (r4 measurement: a trivial jitted op + fetch
takes the same wall time as 32 chained 29-GFLOP matmuls + one fetch).
Benches must subtract the same-run baseline from per-call wall times or
they report the tunnel, not the chip.
"""
import time

import numpy as np


def fetch_baseline_s(reps: int = 10) -> float:
    """Median wall time of a trivial jitted call + host fetch (seconds)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 8), jnp.int32)
    np.asarray(tiny(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(tiny(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))
