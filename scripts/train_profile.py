"""SP train-step cost decomposition by ablation (round-4, VERDICT r3 weak #3).

The r3 measurement: full multi-precision train step (GPT-2 124M, B=8,
T=256, accum=4) = 182.6 ms ≈ 17% MFU. Before writing a fused
dequant-matmul training kernel, find out where the time actually goes —
every ablation below times the SAME jitted step with one ingredient
removed:

  full        — production step (attention_impl auto -> flash)
  dense-attn  — dense T×T attention instead of the flash kernel
  no-quant    — fake_quant monkeypatched to identity (STE chain cost)
  no-lora     — rank-0 config (LoRA banks + dynamic scales cost)
  no-distill  — students use plain CE, no teacher-cache KL/feature terms
  fwd-only    — value (no grad) of the teacher CE forward, full config

Run: python scripts/train_profile.py [iters]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import (
    GPT2Config, QuantConfig, SPModelConfig, TrainConfig, init_sp_params,
    prec_tables, sp_forward,
)
from llm_qat_tpu.train import CalibrationManager
from llm_qat_tpu.train.sp_trainer import make_sp_train_step
import llm_qat_tpu.models.sp_model as sp_model

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
B, T = 8, 256


def build(bit_widths=(4, 8, 32), rank=64, attention_impl="auto"):
    cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(
            bit_widths=bit_widths,
            lora_rank_per_bit={b: rank for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 2 * rank for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="bfloat16",
        attention_impl=attention_impl,
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, T)))
    params = CalibrationManager(cfg, 1).calibrate_all_precisions(
        params, [batch[:2, :64]])
    return cfg, params, batch


def time_step(label, cfg, params, batch, **mk_kwargs):
    tcfg = TrainConfig(batch_size=B, max_seq_length=T,
                      gradient_accumulation_steps=4, num_iterations=100,
                      eval_interval=10_000, **mk_kwargs.pop("tcfg_kw", {}))
    init_state, train_step = make_sp_train_step(cfg, tcfg, **mk_kwargs)
    # donate_argnums below consumes the state's buffers; hand the step its own
    # copy so later ablations can reuse the same calibrated params.
    state = init_state(jax.tree.map(jnp.array, params))
    step = jax.jit(train_step, donate_argnums=(0,))
    state, m = step(state, batch, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(m["loss"])
    ts = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        state, m = step(state, batch, jax.random.fold_in(
            jax.random.PRNGKey(1), i))
        jax.block_until_ready(m["loss"])
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"{label}: {med:.1f} ms median (spread "
          f"{min(ts)*1e3:.1f}-{max(ts)*1e3:.1f}) loss={float(m['loss']):.3f}",
          flush=True)
    return med


def time_fwd_only(cfg, params, batch):
    tables = prec_tables(cfg.quant)

    @jax.jit
    def fwd(p, ids):
        return sp_forward(p, ids, jnp.int32(cfg.quant.prec_index(4)), cfg,
                          tables=tables, labels=ids,
                          output_hidden_states=True)["loss"]

    out = fwd(params, batch)
    jax.block_until_ready(out)
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(params, batch))
        ts.append(time.perf_counter() - t0)
    print(f"fwd-only (1 micro-step, INT4): "
          f"{float(np.median(ts))*1e3:.1f} ms median", flush=True)


if __name__ == "__main__":
    cfg, params, batch = build()
    full = time_step("full (flash attn)", cfg, params, batch)

    cfg_d, params_d, _ = build(attention_impl="dense")
    time_step("dense-attn", cfg_d, params_d, batch)

    # no-quant: identity fake_quant (keeps LoRA + distillation machinery)
    real_fq = sp_model.fake_quant
    sp_model.fake_quant = lambda x, *a, **k: jnp.asarray(x)
    try:
        time_step("no-quant", cfg, params, batch)
    finally:
        sp_model.fake_quant = real_fq

    cfg_nl, params_nl, _ = build(rank=0)
    time_step("no-lora", cfg_nl, params_nl, batch)

    time_step("no-distill (alpha_kl=0, alpha_feat=0)", cfg, params, batch,
              tcfg_kw=dict(distill_alpha_kl=0.0, distill_alpha_feature=0.0))

    time_fwd_only(cfg, params, batch)
