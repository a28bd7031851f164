"""Same-run A/B harness for megakernel variants (round-4 tuning).

Variants are (weight_format, kv_bits, lora_banks, tbp) tuples; every
configuration is timed decode-only (median of reps) in ONE process so
chip/day variance cancels. Usage:
    python scripts/ab_decode.py            # default sweep
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

import llm_qat_tpu.ops.mega_decode as md
from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig, init_sp_params
from llm_qat_tpu.models.inference import InferenceEngine, init_layer_caches
from llm_qat_tpu.train.calibration_manager import (
    calibrate_input_quantizers, calibrate_weight_quantizers)

B, PROMPT, NEW, REPS = 8, 64, 512, 5
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
prompt = jnp.asarray(rng.integers(0, 50257, (B, PROMPT)))
T_all = -(-(PROMPT + NEW) // 32) * 32


cfg_nolora = SPModelConfig(
    model=GPT2Config(),
    quant=QuantConfig(bit_widths=(4, 8, 32), quantizer_per_bit={8: "minmax"},
                      per_channel=False,
                      lora_rank_per_bit={b: 0 for b in range(2, 33)},
                      lora_alpha_per_bit={b: 0 for b in range(2, 33)}),
    compute_dtype="bfloat16",
)
params_nolora = init_sp_params(jax.random.PRNGKey(0), cfg_nolora)
params_nolora = calibrate_weight_quantizers(params_nolora, cfg_nolora)
params_nolora = calibrate_input_quantizers(
    params_nolora, cfg_nolora,
    [jnp.asarray(np.random.default_rng(5).integers(0, 50257, (2, 64)))
     for _ in range(3)])


def bench(wf, bits, kvb, banks, tbp, label, lora=True):
    md.LORA_BANKS = banks
    p, c = (params, cfg) if lora else (params_nolora, cfg_nolora)
    eng = InferenceEngine(p, c, bits=bits, max_batch=B,
                          max_len=PROMPT + NEW, weight_format=wf,
                          lm_head_int8=True, kv_layout="mega", kv_bits=kvb,
                          mega_tbp=tbp)
    caches = init_layer_caches(c, B, T_all, jnp.bfloat16, kv_layout="dense")
    logits, caches, _ = eng._prefill(eng.iparams, prompt, caches)
    l0 = logits[:, -1]
    cs = eng._to_mega(caches)
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
        # np.asarray forces completion; a block_until_ready here would cost
        # a second ~25 ms tunnel roundtrip (scripts/_tunnel.py).
        return np.asarray(toks), tuple(cs)

    toks, cs = dec(cs)
    from _tunnel import fetch_baseline_s
    fetch = fetch_baseline_s()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        toks, cs = dec(cs)
        ts.append(max(time.perf_counter() - t0 - fetch, 1e-9))
    med = float(np.median(ts))
    print(f"{label}: {med*1e3:.1f} ms median -> {B*NEW/med:,.0f} tok/s "
          f"({med/NEW*1e6:.0f} us/step; spread "
          f"{min(ts)*1e3:.1f}-{max(ts)*1e3:.1f})", flush=True)
    return B * NEW / med


VARIANTS = [
    ("int8_xla", 8, 8, "full", 32, "W8 KV8  full tbp32", True),
    ("int8_xla", 8, 8, "full", 64, "W8 KV8  full tbp64", True),
    ("int4_xla", 4, 8, "full", 64, "W4 KV8  full tbp64", True),
    ("int4_xla", 4, 8, "full", 128, "W4 KV8  full tbp128", True),
    ("int4_xla", 4, 16, "full", 64, "W4 KV16 full tbp64", True),
    ("int4_xla", 4, 4, "full", 64, "W4 KV4  full tbp64", True),
    ("int4_xla", 4, 8, "full", 64, "W4 KV8  full tbp64 NOLORA", False),
]

if __name__ == "__main__":
    for v in VARIANTS:
        bench(*v)
