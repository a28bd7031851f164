"""Quick A/B: cond-based fake_quant vs flat (select-based) in one INT4 forward.

Hypothesis from scripts/train_profile.py (r4): a single INT4 forward costs
~80 ms on chip vs ~4 ms of roofline compute because every fake_quant is a
lax.cond(lax.switch(...)) — ~300 unfusable conditional dispatches per forward.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import (
    GPT2Config, QuantConfig, SPModelConfig, init_sp_params, prec_tables,
    sp_forward,
)
from llm_qat_tpu.train import CalibrationManager
from llm_qat_tpu.quant.functional import fake_quant_flat, KIND_LOG
from llm_qat_tpu.quant.calibration import reduction_axes
import llm_qat_tpu.models.sp_model as sp_model

B, T = 8, 256
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def dynamic_scale_flat(x, bits, kind, channel_dim, symmetric=True, eps=1e-5):
    axes = reduction_axes(jnp.ndim(x), channel_dim)
    xf = jnp.asarray(x, jnp.float32)
    mn = jnp.min(xf, axis=axes, keepdims=True)
    mx = jnp.max(xf, axis=axes, keepdims=True)
    abs_max = jnp.maximum(jnp.maximum(jnp.abs(mn), jnp.abs(mx)), eps)
    mm_scale = abs_max / (jnp.exp2(bits - 1.0) - 1.0)
    la = jnp.log2(jnp.maximum(jnp.abs(xf), eps))
    lmn = jnp.min(la, axis=axes, keepdims=True)
    lmx = jnp.max(la, axis=axes, keepdims=True)
    is_log = jnp.asarray(kind, jnp.int32) == KIND_LOG
    scale = jnp.where(is_log, lmx - lmn, mm_scale)
    zp = jnp.where(is_log, lmn, jnp.zeros_like(mm_scale))
    return scale, zp


def build():
    cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(
            bit_widths=(4, 8, 32),
            lora_rank_per_bit={b: 64 for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 128 for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="bfloat16",
        attention_impl="auto",
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, T)))
    params = CalibrationManager(cfg, 1).calibrate_all_precisions(
        params, [batch[:2, :64]])
    return cfg, params, batch


def time_fwd(label, cfg, params, batch, prec_bits=4):
    tables = prec_tables(cfg.quant)

    @jax.jit
    def fwd(p, ids):
        return sp_forward(p, ids, jnp.int32(cfg.quant.prec_index(prec_bits)),
                          cfg, tables=tables, labels=ids,
                          output_hidden_states=True)["loss"]

    out = fwd(params, batch)
    jax.block_until_ready(out)
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(params, batch))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {float(np.median(ts))*1e3:.1f} ms median "
          f"loss={float(out):.4f}", flush=True)
    return float(out)


if __name__ == "__main__":
    cfg, params, batch = build()
    l_cond = time_fwd("cond fwd INT4", cfg, params, batch)
    l_cond8 = time_fwd("cond fwd INT8(log)", cfg, params, batch, 8)

    sp_model.fake_quant = fake_quant_flat
    sp_model.dynamic_scale = dynamic_scale_flat
    l_flat = time_fwd("flat fwd INT4", cfg, params, batch)
    l_flat8 = time_fwd("flat fwd INT8(log)", cfg, params, batch, 8)
    print("loss match int4:", abs(l_cond - l_flat) < 1e-4,
          "int8:", abs(l_cond8 - l_flat8) < 1e-4)
