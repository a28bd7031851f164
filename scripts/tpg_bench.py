"""On-chip A/B of megakernel tiles_per_step (grid-step count reduction).

Times a bare decode scan (kernel only: no LM head/sampling) over the kv8
kernel at production size (L=12, d=768, r=64, B=8), synthetic weights.
Usage: python scripts/tpg_bench.py [steps=256] [reps=5]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.mega_decode import MegaWeights, mega_decode_step_kv8
from _tunnel import fetch_baseline_s

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
L, B, d, H, r = 12, 8, 768, 12, 64
P0 = 256           # starting prefix length
TC = -(-(P0 + STEPS) // 64) * 64

rng = np.random.default_rng(0)


def build_mw(wbits, lora_i8=False):
    dk = d if wbits == 8 else d // 2
    if lora_i8:
        at = jnp.asarray(rng.integers(-127, 127, (L, 12, d, r)), jnp.int8)
        bt = jnp.asarray(rng.integers(-127, 127, (L, 12, r, d)), jnp.int8)
    else:
        at = jnp.asarray(rng.random((L, 12, d, r)) * 0.02 - 0.01,
                         jnp.bfloat16)
        bt = jnp.asarray(rng.random((L, 12, r, d)) * 0.02 - 0.01,
                         jnp.bfloat16)
    return MegaWeights(
        wt=jnp.asarray(rng.integers(-120, 120, (L, 12, dk, d)), jnp.int8),
        ws=jnp.asarray(rng.random((L, 12, 1, d)) * 1e-3 + 1e-4, jnp.float32),
        bias=jnp.zeros((L, 12, 1, d), jnp.float32),
        at=at,
        bt=bt,
        at_s=jnp.full((L, 12), 1e-4, jnp.float32),
        bt_s=jnp.full((L, 12), 1e-4, jnp.float32),
        ln=jnp.asarray(np.concatenate([
            np.ones((L, 1, d)), np.zeros((L, 1, d)),
            np.ones((L, 1, d)), np.zeros((L, 1, d))], axis=1), jnp.float32),
        xs=jnp.full((L, 4), 0.05, jnp.float32),
    )


def bench(wbits, kv_bits, tpg, tbp, fetch, lora_i8=False):
    mw = build_mw(wbits, lora_i8=lora_i8)
    dc = d if kv_bits == 8 else d // 2
    kc = jnp.asarray(rng.integers(-100, 100, (L, B, TC, dc)), jnp.int8)
    vc = jnp.asarray(rng.integers(-100, 100, (L, B, TC, dc)), jnp.int8)
    ks = jnp.asarray(rng.random((L, TC, 128)) * 1e-2 + 1e-3, jnp.float32)
    vs = jnp.asarray(rng.random((L, TC, 128)) * 1e-2 + 1e-3, jnp.float32)
    h0 = jnp.asarray(rng.standard_normal((B, d)) * 0.1, jnp.float32)

    def run(h, kc, vc, ks, vs):
        def body(i, carry):
            h, kc, vc, ks, vs = carry
            h, kc, vc, ks, vs = mega_decode_step_kv8(
                h, mw, kc, vc, ks, vs, P0 + i, n_head=H, head_dim=d // H,
                has_lora=True, kv_bits=kv_bits, tbp=tbp,
                tiles_per_step=tpg)
            return (h * 0.1, kc, vc, ks, vs)
        return jax.lax.fori_loop(0, STEPS, body, (h, kc, vc, ks, vs))

    rj = jax.jit(run, donate_argnums=(1, 2, 3, 4))
    host = tuple(np.asarray(x) for x in (kc, vc, ks, vs))

    def fresh():
        arrs = tuple(jnp.asarray(x) for x in host)
        jax.block_until_ready(arrs)
        return arrs

    out = rj(h0, *fresh())
    np.asarray(out[0])
    ts = []
    for _ in range(REPS):
        arrs = fresh()
        t0 = time.perf_counter()
        out = rj(h0, *arrs)
        np.asarray(out[0])
        ts.append(time.perf_counter() - t0 - fetch)
    us = float(np.median(ts)) / STEPS * 1e6
    print(f"W{wbits} KV{kv_bits} tpg={tpg} tbp={tbp} "
          f"lora={'i8' if lora_i8 else 'bf16'}: {us:.0f} us/step "
          f"({B/us*1e6:,.0f} tok/s)", flush=True)
    return us


if __name__ == "__main__":
    fetch = fetch_baseline_s()
    print(f"fetch {fetch*1e3:.1f} ms; steps={STEPS} prefix {P0}..{P0+STEPS}",
          flush=True)
    if len(sys.argv) > 3 and sys.argv[3] == "i8lora":
        # r5: int8 LoRA banks halve the per-step VMEM bank residency —
        # retest the tiles_per_step ceiling (r4: tpg=6 regressed on VMEM)
        for tpg in (4, 6, 12):
            bench(4, 4, tpg, 64, fetch, lora_i8=True)
        bench(4, 4, 4, 64, fetch, lora_i8=False)
    else:
        for tpg in (1, 2, 4, 6):
            bench(4, 4, tpg, 64, fetch)
        for tpg in (1, 4):
            bench(8, 8, tpg, 64, fetch)
