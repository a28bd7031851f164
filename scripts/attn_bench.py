"""Honest flash-vs-dense attention timing (in-jit loops, single fetch).

Round-3's flash-vs-dense conclusions were drawn with per-call timing that
carried a ~25-30 ms tunnel-fetch artifact; this re-measures with N
iterations chained inside one jit. Shapes: GPT-2 (B=8, H=12, D=64), bf16
inputs (the AMP path), fwd-only and fwd+bwd (sum-of-outputs cotangent).

Usage: python scripts/attn_bench.py [inner=16] [reps=5]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.attention import (
    causal_attention_reference, flash_attention_trainable, flash_blocks,
)

INNER = int(sys.argv[1]) if len(sys.argv) > 1 else 16
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
B, H, D = 8, 12, 64


def fetch_baseline():
    f = jax.jit(lambda x: x.sum())
    x = jnp.ones((8, 8))
    float(f(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def bench(label, fn, q, k, v, fetch_ms):
    def run(q, k, v):
        def body(c, _):
            out = fn(q + c.astype(q.dtype) * 1e-6, k, v)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=INNER)
        return c

    rj = jax.jit(run)
    float(rj(q, k, v))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(rj(q, k, v))
        ts.append(time.perf_counter() - t0)
    per = (np.median(ts) * 1e3 - fetch_ms) / INNER
    print(f"  {label}: {per:.2f} ms", flush=True)
    return per


if __name__ == "__main__":
    fetch_ms = fetch_baseline()
    print(f"fetch baseline {fetch_ms:.1f} ms", flush=True)
    for T in (256, 512, 1024):
        print(f"T={T}:", flush=True)
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                     (B, H, T, D), jnp.bfloat16)
                   for i in range(3))
        bq, bk = flash_blocks(T)
        flash = lambda q, k, v: flash_attention_trainable(q, k, v, bq, bk,
                                                          False)
        dense = lambda q, k, v: causal_attention_reference(q, k, v)
        bench("flash fwd", flash, q, k, v, fetch_ms)
        bench("dense fwd", dense, q, k, v, fetch_ms)

        def wgrad(fn):
            def g(q, k, v):
                return jax.grad(
                    lambda qq: jnp.sum(fn(qq, k, v).astype(jnp.float32) ** 2)
                )(q).astype(jnp.float32).sum()
            return g
        bench("flash fwd+bwd", wgrad(flash), q, k, v, fetch_ms)
        bench("dense fwd+bwd", wgrad(dense), q, k, v, fetch_ms)
