"""Decompose the continuous-batching megakernel step (VERDICT r4 #4).

Bare-kernel timing in the tpg_bench style: N steps chained inside ONE jit
(state-carried), one fetch, minus the same-run tunnel baseline. Rows:

  kv8-single    — `mega_decode_step_kv8` (the single-stream kernel the
                  decode matrix benchmarks) at matched prefix length
  cb-uniform    — `mega_decode_step_cb`, all slot lengths equal
  cb-mixed      — per-slot lengths 64..512 (maxpos streams the longest)
  cb-norecent   — rpos pinned 0: the chunk-local recent-buffer stream
                  contributes zero blocks (isolates its cost)
  merge         — one `cb_merge_recent` of a 64-row chunk (paid per chunk)

Run: python scripts/cb_profile.py [steps=64] [reps=5]   (needs the TPU)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.ops.mega_decode import (
    MegaWeights, cb_merge_recent, mega_decode_step_cb, mega_decode_step_kv8,
)
from _tunnel import fetch_baseline_s

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
L, B, d, H, r = 12, 8, 768, 12, 64
TC = 512
TR = 64
KVB = 4
DC = d // 2 if KVB == 4 else d
WBITS = 4
DK = d // 2 if WBITS == 4 else d

rng = np.random.default_rng(0)


def build_mw():
    return MegaWeights(
        wt=jnp.asarray(rng.integers(-120, 120, (L, 12, DK, d)), jnp.int8),
        ws=jnp.asarray(rng.random((L, 12, 1, d)) * 1e-3 + 1e-4, jnp.float32),
        bias=jnp.zeros((L, 12, 1, d), jnp.float32),
        at=jnp.asarray(rng.random((L, 12, d, r)) * 0.02 - 0.01, jnp.bfloat16),
        bt=jnp.asarray(rng.random((L, 12, r, d)) * 0.02 - 0.01, jnp.bfloat16),
        at_s=jnp.ones((L, 12), jnp.float32),
        bt_s=jnp.ones((L, 12), jnp.float32),
        ln=jnp.asarray(np.concatenate([
            np.ones((L, 1, d)), np.zeros((L, 1, d)),
            np.ones((L, 1, d)), np.zeros((L, 1, d))], axis=1), jnp.float32),
        xs=jnp.full((L, 4), 0.05, jnp.float32),
    )


def caches(T):
    return (jnp.asarray(rng.integers(-100, 100, (L, B, T, DC)), jnp.int8),
            jnp.asarray(rng.integers(-100, 100, (L, B, T, DC)), jnp.int8),
            jnp.asarray(rng.random((L, T, 128)) * 1e-2 + 1e-3, jnp.float32),
            jnp.asarray(rng.random((L, T, 128)) * 1e-2 + 1e-3, jnp.float32))


def timeit(fn, args, label, fetch):
    out = fn(*args)
    np.asarray(out[0])  # compile + sync
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out[0])
        ts.append(time.perf_counter() - t0)
    per = (np.median(ts) - fetch) / STEPS * 1e6
    print(f"{label}: {per:8.1f} us/step  "
          f"(raw {np.median(ts)*1e3:.1f} ms / {STEPS})", flush=True)
    return per


def main():
    mw = build_mw()
    fetch = fetch_baseline_s()
    print(f"fetch baseline {fetch*1e3:.1f} ms; B={B} steps={STEPS} "
          f"W{WBITS} KV{KVB} Tc={TC}", flush=True)
    h0 = jnp.asarray(rng.standard_normal((B, d)) * 0.02, jnp.float32)

    # --- single-stream kernel, prefix grows 256..256+STEPS
    @jax.jit
    def single(h, kc, vc, ks, vs):
        def body(carry, i):
            h, kc, vc, ks, vs = carry
            h, kc, vc, ks, vs = mega_decode_step_kv8(
                h, mw, kc, vc, ks, vs, 256 + i, n_head=H, head_dim=d // H,
                has_lora=True, act_dtype=jnp.bfloat16, tbp=64, kv_bits=KVB,
                tiles_per_step=4)
            return (h, kc, vc, ks, vs), h[0, 0]
        (h, *_), _ = jax.lax.scan(body, (h, kc, vc, ks, vs),
                                  jnp.arange(STEPS))
        return (h,)

    kc, vc, ks, vs = caches(TC)
    timeit(single, (h0, kc, vc, ks, vs), "kv8-single (pos~256)", fetch)

    # --- CB kernel variants
    def make_cb(lengths, use_rpos):
        lengths = jnp.asarray(lengths, jnp.int32)

        @jax.jit
        def run(h, main, rec):
            def body(carry, i):
                h, rec = carry
                rpos = i if use_rpos else jnp.int32(0)
                h, *rec = mega_decode_step_cb(
                    h, mw, *main, *rec, lengths, rpos, n_head=H,
                    head_dim=d // H, has_lora=True, act_dtype=jnp.bfloat16,
                    tbp=64, kv_bits=KVB, tiles_per_step=4)
                return (h, tuple(rec)), h[0, 0]
            (h, rec), _ = jax.lax.scan(body, (h, rec), jnp.arange(STEPS))
            return (h,)
        return run

    main_c = caches(TC)
    rec_c = caches(TR)
    uni = [256] * B
    mixed = [64, 128, 192, 256, 320, 384, 448, 500][:B]
    timeit(make_cb(uni, True), (h0, main_c, rec_c),
           "cb-uniform  (len 256)", fetch)
    timeit(make_cb(mixed, True), (h0, main_c, rec_c),
           "cb-mixed    (64..500)", fetch)
    timeit(make_cb(uni, False), (h0, main_c, rec_c),
           "cb-norecent (len 256)", fetch)

    # --- merge cost (paid once per chunk of STEPS tokens)
    # chain N merges in one jit and return a SCALAR — fetching the merged
    # cache itself would pull ~19 MB through the tunnel and time the link
    @jax.jit
    def merge_n(mainc, recc):
        def body(c, i):
            out = cb_merge_recent(*c, *recc, jnp.asarray(uni, jnp.int32)
                                  + i, TR)
            return out, out[0][0, 0, 0, 0]
        c, last = jax.lax.scan(body, mainc, jnp.arange(8))
        return last[-1].astype(jnp.int32)

    int(merge_n(main_c, rec_c))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        int(merge_n(main_c, rec_c))
        ts.append(time.perf_counter() - t0)
    per = (np.median(ts) - fetch) / 8 * 1e6
    print(f"merge (per chunk of {TR}): {per:8.1f} us "
          f"= {per/TR:6.2f} us/token", flush=True)


if __name__ == "__main__":
    main()
