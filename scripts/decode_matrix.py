"""Decode-throughput matrix on the real chip: W{8,4} x KV{16,8,4} megakernel.

Methodology (round-4, VERDICT r3 #10): decode-ONLY timing — the dense->mega
cache conversion runs once outside the timed region and the donated caches
returned by each decode are fed to the next rep — with >=5 reps and both
median and min reported, so spread is visible instead of hand-waved as
"±5% variance".

Round-4 same-run measurements (median of 5, tbp=64; scripts/ab_decode.py):
    W8 KV8: 20.7k   W4 KV16: 19.1k   W4 KV8: 23.0k   W4 KV4: 23.6k tok/s
The ordering tracks HBM traffic exactly; round 3's "W4KV8 slowest" was the
tbp=32 KV block size + cross-session chip variance (docs/RESULTS_R4.md).

Run: python scripts/decode_matrix.py [new_tokens] [reps]  (needs the TPU)
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

import os
B, PROMPT = int(os.environ.get("DM_B", 8)), 64
NEW = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
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
params = calibrate_input_quantizers(params, cfg, [jnp.asarray(rng0.integers(0, 50257, (2, 64))) for _ in range(3)])
rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, 50257, (B, PROMPT)))
T_all = -(-(PROMPT + NEW) // 32) * 32


def bench(wf, bits, kvb, label, tbp=64, lm_head_bits=8, lora_int8=True):
    eng = InferenceEngine(params, cfg, bits=bits, max_batch=B,
                          max_len=PROMPT + NEW, weight_format=wf,
                          lm_head_bits=lm_head_bits, kv_layout="mega",
                          kv_bits=kvb, mega_tbp=tbp,
                          mega_lora_int8=lora_int8)
    caches = init_layer_caches(cfg, B, T_all, jnp.bfloat16, kv_layout="dense")
    logits, caches, _ = eng._prefill(eng.iparams, prompt, caches)
    l0 = logits[:, -1]
    cs = eng._to_mega(caches)  # conversion OUTSIDE the timed region
    kw = dict(n_new=NEW, temperature=1.0, top_k=None, top_p=None,
              do_sample=False, eos_token_id=None)

    def dec(cs):
        if kvb in (8, 4):
            toks, *cs = eng._decode_mega_kv8(
                eng.iparams, eng.mega, l0, *cs, jnp.int32(PROMPT),
                jax.random.PRNGKey(0), **kw)
        else:
            toks, *cs = eng._decode_mega(
                eng.iparams, eng.mega, l0, *cs, jnp.int32(PROMPT),
                jax.random.PRNGKey(0), **kw)
        # np.asarray(toks) forces the whole (single) computation; an extra
        # block_until_ready(cs) here costs a SECOND ~25 ms tunnel roundtrip
        # (the r3/r4 artifact — see scripts/_tunnel.py).
        return np.asarray(toks), tuple(cs)

    toks, cs = dec(cs)  # compile
    from _tunnel import fetch_baseline_s
    fetch = fetch_baseline_s()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        toks, cs = dec(cs)
        ts.append(max(time.perf_counter() - t0 - fetch, 1e-9))
    med, mn = float(np.median(ts)), float(np.min(ts))
    print(f"{label}: median {med*1e3:.1f} ms -> {B*NEW/med:,.0f} tok/s "
          f"(min-based {B*NEW/mn:,.0f}; {med/NEW*1e6:.0f} us/step; "
          f"spread {min(ts)*1e3:.1f}-{max(ts)*1e3:.1f} ms)", flush=True)
    return toks, B * NEW / med


if len(sys.argv) > 3 and sys.argv[3] == "diet":
    # r5 stream-diet A/B on the headline config: int8 LoRA banks (−14 MB)
    # and the int4 LM head (−19 MB) against the r4 defaults
    bench("int4_xla", 4, 4, "W4 KV4 bf16lora head8", lm_head_bits=8,
          lora_int8=False)
    bench("int4_xla", 4, 4, "W4 KV4 i8lora   head8", lm_head_bits=8)
    bench("int4_xla", 4, 4, "W4 KV4 i8lora   head4", lm_head_bits=4)
    bench("int4_xla", 4, 8, "W4 KV8 i8lora   head4", lm_head_bits=4)
else:
    t16, _ = bench("int8_xla", 8, 16, "W8 KV16")
    t8, _ = bench("int8_xla", 8, 8, "W8 KV8 ")
    t84, _ = bench("int8_xla", 8, 4, "W8 KV4 ")
    t4, _ = bench("int4_xla", 4, 16, "W4 KV16")
    t44, _ = bench("int4_xla", 4, 8, "W4 KV8 ")
    t444, _ = bench("int4_xla", 4, 4, "W4 KV4 ")
    print("W8 token agreement KV8 vs KV16:", float((t16 == t8).mean()),
          flush=True)
    print("W8 token agreement KV4 vs KV16:", float((t16 == t84).mean()),
          flush=True)
