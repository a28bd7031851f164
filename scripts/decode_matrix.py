"""Decode-throughput matrix on the real chip: W{8,4} x KV{16,8} megakernel.

Round-3 measurements (same run; chip-to-chip variance ~±5%):
    W8 KV16: 19.8k tok/s   W8 KV8: 21.7k tok/s
    W4 KV16: 21.5k tok/s   W4 KV8: 19.7k tok/s
(the per-rep timings here include the dense->mega cache conversion, so
bench.py's decode-only number reads slightly higher). Token agreement
KV8-vs-KV16 on a random-weight model is ~0.6 — 8-bit attention noise
flips near-tie argmaxes; quality semantics are the reference's KV8 axis.

Run: python scripts/decode_matrix.py  (needs the TPU backend)
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

B, PROMPT, NEW = 8, 64, 512
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
T_all = -(-(PROMPT+NEW)//32)*32

def bench(wf, bits, kvb, label):
    eng = InferenceEngine(params, cfg, bits=bits, max_batch=B, max_len=PROMPT+NEW,
                          weight_format=wf, lm_head_int8=True, kv_layout="mega",
                          kv_bits=kvb)
    caches = init_layer_caches(cfg, B, T_all, jnp.bfloat16, kv_layout="dense")
    logits, caches, _ = eng._prefill(eng.iparams, prompt, caches)
    l0 = logits[:, -1]
    def dec():
        cs = eng._to_mega(caches)
        if kvb == 8:
            toks, *_ = eng._decode_mega_kv8(
                eng.iparams, eng.mega, l0, *cs, jnp.int32(PROMPT),
                jax.random.PRNGKey(0), n_new=NEW, temperature=1.0,
                top_k=None, top_p=None, do_sample=False, eos_token_id=None)
        else:
            toks, _, _ = eng._decode_mega(
                eng.iparams, eng.mega, l0, *cs, jnp.int32(PROMPT),
                jax.random.PRNGKey(0), n_new=NEW, temperature=1.0,
                top_k=None, top_p=None, do_sample=False, eos_token_id=None)
        return np.asarray(toks)
    toks = dec()  # compile
    t0 = time.perf_counter()
    for _ in range(3): toks = dec()
    dt = (time.perf_counter()-t0)/3
    print(f"{label}: {dt*1e3:.1f} ms -> {B*NEW/dt:,.0f} tok/s "
          f"({dt/NEW*1e6:.0f} us/step)", flush=True)
    return toks

t16 = bench("int8_xla", 8, 16, "W8 KV16")
t8  = bench("int8_xla", 8, 8,  "W8 KV8 ")
t4  = bench("int4_xla", 4, 16, "W4 KV16")
t44 = bench("int4_xla", 4, 8,  "W4 KV8 ")
print("W8 token agreement KV8 vs KV16:",
      float((t16 == t8).mean()), flush=True)
