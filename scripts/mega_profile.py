"""Per-phase decomposition of the megakernel via the PRODUCTION decode scan.

Times `InferenceEngine._decode_mega{,_kv8}` (decode-only — no prefill, no
dense->mega conversion) for short n_new windows at several start positions
`length0`, ≥5 reps each, median reported. Fitting time = intercept +
slope * mean_pos per config separates the KV-prefix streaming cost (slope;
HBM bandwidth) from weights + LoRA + fixed compute (intercept) — the
decomposition VERDICT r3 asked for on the KV8/int4 variants, using the exact
production code path (scan body includes the ln_f + int8 LM head, which
overlaps the next step's weight stream).

Run: python scripts/mega_profile.py [n_new] [reps]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig, init_sp_params
from llm_qat_tpu.models.inference import InferenceEngine, init_layer_caches
from llm_qat_tpu.train.calibration_manager import (
    calibrate_input_quantizers, calibrate_weight_quantizers)

B, TC = 8, 576
N_NEW = int(sys.argv[1]) if len(sys.argv) > 1 else 64
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
# every start must satisfy start + N_NEW <= TC: the megakernel appends at
# `pos` without bounds checks (its contract), and an overflowing window
# DMAs past the cache -> TPU ABORT (hit in r4 with N_NEW=128 and start 504).
STARTS = (64, 192, 320, 440)
assert max(STARTS) + N_NEW <= TC, (STARTS, N_NEW, TC)

cfg = SPModelConfig(
    model=GPT2Config(),
    quant=QuantConfig(bit_widths=(4, 8, 32), quantizer_per_bit={8: "minmax"},
                      per_channel=False),
    compute_dtype="bfloat16",
)
m = cfg.model
params = init_sp_params(jax.random.PRNGKey(0), cfg)
params = calibrate_weight_quantizers(params, cfg)
rng0 = np.random.default_rng(5)
params = calibrate_input_quantizers(
    params, cfg, [jnp.asarray(rng0.integers(0, 50257, (2, 64))) for _ in range(3)])
rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, 50257, (B, 64)))

results = {}
print(f"B={B} Tc={TC} n_new={N_NEW} reps={REPS}", flush=True)
CONFIGS = [("int8_xla", 8, 16, 8), ("int8_xla", 8, 8, 8),
           ("int8_xla", 8, 4, 8), ("int4_xla", 4, 16, 8),
           ("int4_xla", 4, 8, 8), ("int4_xla", 4, 4, 8),
           # r5 diet headline: int4 head (int8 LoRA banks are default)
           ("int4_xla", 4, 4, 4)]
for wf, bits, kvb, headb in CONFIGS:
    if True:
        eng = InferenceEngine(params, cfg, bits=bits, max_batch=B, max_len=TC,
                              weight_format=wf, lm_head_bits=headb,
                              kv_layout="mega", kv_bits=kvb)
        caches = init_layer_caches(cfg, B, TC, jnp.bfloat16, kv_layout="dense")
        logits, caches, _ = eng._prefill(eng.iparams, prompt, caches)
        l0 = logits[:, -1]
        cs = eng._to_mega(caches)
        kw = dict(n_new=N_NEW, temperature=1.0, top_k=None, top_p=None,
                  do_sample=False, eos_token_id=None)

        def run(cs, start):
            if kvb in (8, 4):
                toks, *cs = eng._decode_mega_kv8(
                    eng.iparams, eng.mega, l0, *cs, jnp.int32(start),
                    jax.random.PRNGKey(0), **kw)
            else:
                toks, *cs = eng._decode_mega(
                    eng.iparams, eng.mega, l0, *cs, jnp.int32(start),
                    jax.random.PRNGKey(0), **kw)
            jax.block_until_ready(cs)
            return tuple(cs)

        cs = run(cs, 64)  # compile
        from _tunnel import fetch_baseline_s
        fetch = fetch_baseline_s()
        xs, ys = [], []
        for start in STARTS:
            ts = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                cs = run(cs, start)
                ts.append(max(time.perf_counter() - t0 - fetch, 0.0)
                          / N_NEW * 1e6)
            med = float(np.median(ts))
            xs.append(start + N_NEW / 2)  # mean live prefix over the window
            ys.append(med)
            print(f"  W{bits} KV{kvb} H{headb} pos~{xs[-1]:.0f}: {med:.1f} us/step "
                  f"(min {min(ts):.1f}, max {max(ts):.1f})", flush=True)
        A = np.vstack([np.ones(len(xs)), np.asarray(xs)]).T
        (icept, slope), *_ = np.linalg.lstsq(A, np.asarray(ys), rcond=None)
        results[(bits, kvb, headb)] = (icept, slope)
        print(f"W{bits} KV{kvb} H{headb}: intercept {icept:.1f} us + "
              f"{slope*1000:.2f} ns/prefix-token", flush=True)

print("\nsummary (intercept us | slope ns/token | KV GB/s effective):")
for (bits, kvb, headb), (icept, slope) in sorted(results.items()):
    kv_bytes = {16: 2.0, 8: 1.0, 4: 0.5}[kvb]
    bpt = 2 * 12 * B * 768 * kv_bytes
    eff = bpt / (slope * 1e-6) / 1e9 if slope > 0 else float("inf")
    print(f"  W{bits} KV{kvb} H{headb}: {icept:7.1f} | {slope*1000:7.2f} "
          f"| ~{eff:.0f}")
