"""Surgical ablation of one SP forward (B=8, T=256, GPT-2 124M) on chip.

flat_fq_check.py showed cond-vs-flat fake_quant makes no difference (33.7 vs
33.1 ms), so the conditional-dispatch hypothesis is dead. This script times
the forward with individual ingredients removed to find the real cost.
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

B, T = 8, 256
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def build(vocab=50257, rank=64, attention_impl="auto", bit_widths=(4, 8, 32)):
    cfg = SPModelConfig(
        model=GPT2Config(vocab_size=vocab),
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
    batch = jnp.asarray(rng.integers(0, min(vocab, 50257), (B, T)))
    params = CalibrationManager(cfg, 1).calibrate_all_precisions(
        params, [batch[:2, :64]])
    return cfg, params, batch


def timeit(label, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {float(np.median(ts))*1e3:.1f} ms", flush=True)


def make_fwd(cfg, bits=4, labels=True, hidden=True, attention_fn=None):
    tables = prec_tables(cfg.quant)
    slot = cfg.quant.prec_index(bits)

    @jax.jit
    def fwd(p, ids):
        out = sp_forward(p, ids, jnp.int32(slot), cfg, tables=tables,
                         labels=ids if labels else None,
                         output_hidden_states=hidden,
                         attention_fn=attention_fn)
        return out["loss"] if labels else out["logits"][..., :8]
    return fwd


if __name__ == "__main__":
    cfg, params, batch = build()
    timeit("full INT4 fwd (labels+hidden)", make_fwd(cfg), params, batch)
    timeit("teacher fwd (32-bit slot)", make_fwd(cfg, bits=32), params, batch)
    timeit("no labels (skip CE)", make_fwd(cfg, labels=False), params, batch)
    timeit("no hidden states", make_fwd(cfg, hidden=False), params, batch)
    timeit("no labels+hidden", make_fwd(cfg, labels=False, hidden=False),
           params, batch)
    timeit("attention=V passthrough",
           make_fwd(cfg, attention_fn=lambda q, k, v: v), params, batch)

    cfg_d, params_d, _ = build(attention_impl="dense")
    timeit("dense attention", make_fwd(cfg_d), params_d, batch)

    cfg_v, params_v, batch_v = build(vocab=512)
    timeit("vocab=512 (cheap lm_head+CE)", make_fwd(cfg_v), params_v, batch_v)

    cfg_nl, params_nl, _ = build(rank=0)
    timeit("rank=0 (no LoRA)", make_fwd(cfg_nl), params_nl, batch)

    cfg_v2, params_v2, _ = build(vocab=512, rank=0)
    timeit("vocab=512 + rank=0", make_fwd(cfg_v2), params_v2, batch_v)
