"""Cyclic-Precision-Training GPT-2 (reference part2) as pure functions.

Re-design of `part2_cyclic_precision_training/cpt_model.py`:
- `LoRAAdapter` (`cpt_model.py:11-35`): ONE shared A (in, r) / B (r, out) pair
  used at every bit-width (vs part1's per-bit banks), with 8-bit gradient
  quantization on the LoRA grads (`GradientQuantizer`, part2
  `quantization.py:14-26`, applied at `cpt_model.py:109-110`).
- `CPTLinear` (`cpt_model.py:37-114`): trainable base linear; ONE multi-bit
  weight + input quantizer pair whose per-bit scales live in stacked
  (P, ch) tables (the reference's `scales: {bits→tensor}` dicts,
  part2 `quantization.py:42-141`, become a bank indexed by the traced
  precision); per-bit LoRA weight quantizers are computed inline from the
  shared A/B (equivalent to `calibrate_lora_weight_quantizers`,
  `calibration.py:154-210`, which recalibrates from the same tensors).
  Forward: `Q(x)@Q(W) + Q_in(x)@Q_b(A)@Q_b(B)·scaling` — note the LoRA branch
  uses the *quantized* input (`cpt_model.py:105-110`), unlike part1.
- `CPTSelfAttention`/`CPTBlock`/`CPTModel` (`cpt_model.py:116-319`): standard
  shared `LayerNorm` (no per-precision banks, `:174-175`), additive attention
  mask -10000 (`:259-261`), KV-cache-capable attention (`:141-146`), and a
  quantizable (NOT weight-tied) `lm_head` CPTLinear (`:223-227`);
  random-normal(0.02) init (`:232-238`).

Unlike part1, `set_precision` in the reference rebinds `num_bits` on the
single quantizer (`cpt_model.py:84-90`) without resetting calibration
(part2 `quantization.py:143-160`); here precision is the same traced bank
index used everywhere else.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.calibration import dynamic_scale_flat
# fake_quant_flat: the conditional-free fake-quant (identical semantics to
# the cond/switch form, tested in tests/test_fused_linear.py) — the SP
# train-step A/B (scripts/train_bench.py r4) showed the lax.cond chains
# cost ~30 ms/step in fusion fencing at GPT-2 size.
from ..quant.functional import (
    KIND_LOG, KIND_MINMAX, fake_quant_flat as fake_quant,
    quantize_gradient,
)
from .config import CPTConfig


class CPTTables(NamedTuple):
    bits: jax.Array  # float32[P]
    kind: jax.Array  # int32[P]


def cpt_tables(cfg: CPTConfig) -> CPTTables:
    kind = KIND_LOG if cfg.quantizer_kind == "log" else KIND_MINMAX
    return CPTTables(
        bits=jnp.asarray(np.asarray(cfg.bit_widths, np.float32)),
        kind=jnp.asarray(np.full(len(cfg.bit_widths), kind, np.int32)),
    )


def prec_index(cfg: CPTConfig, bits: int) -> int:
    return cfg.bit_widths.index(bits)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_cpt_linear(rng, d_in: int, d_out: int, cfg: CPTConfig) -> Dict[str, Any]:
    P = len(cfg.bit_widths)
    r = cfg.lora_rank
    k_w, k_a = jax.random.split(rng)
    ch_w = d_out if cfg.per_channel else 1
    ch_i = d_in if cfg.per_channel else 1
    return {
        "w": 0.02 * jax.random.normal(k_w, (d_in, d_out), jnp.float32),
        "b": jnp.zeros((d_out,), jnp.float32),
        "wq_scale": jnp.ones((P, ch_w), jnp.float32),
        "wq_zp": jnp.zeros((P, ch_w), jnp.float32),
        "iq_scale": jnp.ones((P, ch_i), jnp.float32),
        "iq_zp": jnp.zeros((P, ch_i), jnp.float32),
        # shared LoRA pair (reference LoRAAdapter: A kaiming, B zeros)
        "lora_A": jax.random.uniform(
            k_a, (d_in, r), jnp.float32, -1.0 / math.sqrt(r), 1.0 / math.sqrt(r)
        ),
        "lora_B": jnp.zeros((r, d_out), jnp.float32),
        # gradient-quantizer scales for LoRA grads (calibrated via
        # calibrate_gradient_quantizers; see train/cpt_trainer.py)
        "gq_scale_A": jnp.ones((1, 1), jnp.float32),
        "gq_zp_A": jnp.zeros((1, 1), jnp.float32),
        "gq_scale_B": jnp.ones((1, 1), jnp.float32),
        "gq_zp_B": jnp.zeros((1, 1), jnp.float32),
    }


def init_cpt_params(rng, cfg: CPTConfig) -> Dict[str, Any]:
    m = cfg.model
    keys = jax.random.split(rng, 4)

    def init_block(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        d = m.n_embd
        return {
            "ln1": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "c_attn": _init_cpt_linear(k1, d, 3 * d, cfg),
            "attn_proj": _init_cpt_linear(k2, d, d, cfg),
            "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "c_fc": _init_cpt_linear(k3, d, 4 * d, cfg),
            "mlp_proj": _init_cpt_linear(k4, 4 * d, d, cfg),
        }

    block_keys = jax.random.split(keys[2], m.n_layer)
    return {
        "wte": 0.02 * jax.random.normal(keys[0], (m.vocab_size, m.n_embd)),
        "wpe": 0.02 * jax.random.normal(keys[1], (m.n_positions, m.n_embd)),
        "blocks": jax.vmap(init_block)(block_keys),
        "ln_f": {"g": jnp.ones((m.n_embd,)), "b": jnp.zeros((m.n_embd,))},
        "lm_head": _init_cpt_linear(keys[3], m.n_embd, m.vocab_size, cfg),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def cpt_linear(x, p, prec, tables: CPTTables, cfg: CPTConfig,
               calibration_mode: bool = False, collect_stats: bool = False,
               grad_quant: bool = False):
    """Quantized linear with shared quantized LoRA (`cpt_model.py:92-114`)."""
    bits = tables.bits[prec]
    kind = tables.kind[prec]
    eps = cfg.eps

    stats = None
    if collect_stats:
        axes = tuple(range(x.ndim - 1)) if cfg.per_channel else tuple(range(x.ndim))
        xf = jnp.asarray(x, jnp.float32)
        la = jnp.log2(jnp.maximum(jnp.abs(xf), eps))
        stats = {
            "mm_min": jnp.min(xf, axis=axes), "mm_max": jnp.max(xf, axis=axes),
            "lg_min": jnp.min(la, axis=axes), "lg_max": jnp.max(la, axis=axes),
        }
        xq = x  # collecting: input quantizer passes through
    else:
        xq = fake_quant(x, p["iq_scale"][prec], p["iq_zp"][prec], bits, kind,
                        cfg.symmetric, eps)

    wq = fake_quant(p["w"], p["wq_scale"][prec][None, :],
                    p["wq_zp"][prec][None, :], bits, kind, cfg.symmetric, eps)
    cdt = jnp.dtype(cfg.compute_dtype)
    out = jnp.dot(xq.astype(cdt), wq.astype(cdt),
                  preferred_element_type=jnp.float32) + p["b"]

    if not calibration_mode and cfg.lora_rank > 0:
        A, B = p["lora_A"], p["lora_B"]
        if grad_quant:
            gbits = jnp.float32(cfg.gradient_bits)
            gkind = jnp.float32(KIND_MINMAX)
            A = quantize_gradient(A, p["gq_scale_A"], p["gq_zp_A"], gbits, gkind)
            B = quantize_gradient(B, p["gq_scale_B"], p["gq_zp_B"], gbits, gkind)
        ch = 1 if cfg.per_channel else None
        a_s, a_z = dynamic_scale_flat(A, bits, kind, ch, cfg.symmetric, eps)
        b_s, b_z = dynamic_scale_flat(B, bits, kind, ch, cfg.symmetric, eps)
        Aq = fake_quant(A, a_s, a_z, bits, kind, cfg.symmetric, eps)
        Bq = fake_quant(B, b_s, b_z, bits, kind, cfg.symmetric, eps)
        scaling = cfg.lora_alpha / cfg.lora_rank
        # LoRA consumes the *quantized* input (cpt_model.py:105-110)
        lora = jnp.dot(jnp.dot(xq.astype(cdt), Aq.astype(cdt),
                               preferred_element_type=jnp.float32).astype(cdt),
                       Bq.astype(cdt), preferred_element_type=jnp.float32)
        out = out + scaling * lora

    return out, stats


def _layernorm(x, ln, eps):
    xf = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (ln["g"] * (xf - mean) * jax.lax.rsqrt(var + eps) + ln["b"]).astype(x.dtype)


def cpt_block(x, bp, prec, tables, cfg: CPTConfig, *, attention_mask=None,
              calibration_mode=False, collect_stats=False, grad_quant=False):
    """Pre-LN block with additive attention mask (`cpt_model.py:171-204`)."""
    m = cfg.model
    B, T, C = x.shape

    h = _layernorm(x, bp["ln1"], m.layer_norm_epsilon)
    qkv, s1 = cpt_linear(h, bp["c_attn"], prec, tables, cfg,
                         calibration_mode, collect_stats, grad_quant)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, m.n_head, m.head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(m.head_dim)
    causal = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(causal[None, None], scores, -1e30)
    if attention_mask is not None:
        # reference additive mask: (1-mask) * -10000 (cpt_model.py:259-261)
        scores = scores + (1.0 - attention_mask[:, None, None, :]) * -10000.0
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, T, C)
    attn_out, s2 = cpt_linear(attn, bp["attn_proj"], prec, tables, cfg,
                              calibration_mode, collect_stats, grad_quant)
    x = x + attn_out

    h2 = _layernorm(x, bp["ln2"], m.layer_norm_epsilon)
    fc, s3 = cpt_linear(h2, bp["c_fc"], prec, tables, cfg,
                        calibration_mode, collect_stats, grad_quant)
    fc = jax.nn.gelu(fc, approximate=False)
    proj, s4 = cpt_linear(fc, bp["mlp_proj"], prec, tables, cfg,
                          calibration_mode, collect_stats, grad_quant)
    x = x + proj

    stats = None
    if collect_stats:
        stats = {"c_attn": s1, "attn_proj": s2, "c_fc": s3, "mlp_proj": s4}
    return x, stats


def cpt_forward(params, input_ids, prec, cfg: CPTConfig, *,
                tables: Optional[CPTTables] = None, attention_mask=None,
                labels=None, calibration_mode=False, collect_stats=False,
                grad_quant=False):
    """Full CPT LM forward (`cpt_model.py:246-296`). Returns dict with
    logits/loss/stats. The lm_head is a quantized CPTLinear, not weight-tied
    (`cpt_model.py:223-227`)."""
    if tables is None:
        tables = cpt_tables(cfg)
    prec = jnp.asarray(prec, jnp.int32)
    B, T = input_ids.shape

    h = params["wte"][input_ids] + params["wpe"][:T][None]

    def body(carry, bp):
        x, _ = carry
        out, s = cpt_block(x, bp, prec, tables, cfg,
                           attention_mask=attention_mask,
                           calibration_mode=calibration_mode,
                           collect_stats=collect_stats, grad_quant=grad_quant)
        return (out, 0), s

    (h, _), stats = jax.lax.scan(body, (h, 0), params["blocks"])
    h = _layernorm(h, params["ln_f"], cfg.model.layer_norm_epsilon)

    logits, head_stats = cpt_linear(h, params["lm_head"], prec, tables, cfg,
                                    calibration_mode, collect_stats, grad_quant)

    out = {"logits": logits}
    if collect_stats:
        out["stats"] = stats
        out["lm_head_stats"] = head_stats
    if labels is not None:
        from .sp_model import lm_cross_entropy

        out["loss"] = lm_cross_entropy(logits, labels)
    return out


def cpt_generate(params, input_ids, prec, cfg: CPTConfig, *,
                 max_new_tokens: int = 32, temperature: float = 1.0,
                 do_sample: bool = True, rng=None,
                 tables: Optional[CPTTables] = None):
    """Sampling generation for the CPT model (`cpt_model.py:298-319`).

    The reference's generate does NOT use its KV-cache plumbing (`:304` calls
    the full forward each token); we keep one jitted full forward and a host
    loop for parity — the SP `InferenceEngine` is the production decode path.
    """
    if tables is None:
        tables = cpt_tables(cfg)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    prec = jnp.asarray(prec, jnp.int32)

    @jax.jit
    def last_logits(params, ids, prec):
        return cpt_forward(params, ids, prec, cfg, tables=tables)["logits"][:, -1]

    ids = jnp.asarray(input_ids)
    for _ in range(max_new_tokens):
        if ids.shape[1] >= cfg.model.n_positions:
            break
        logits = last_logits(params, ids, prec)
        if do_sample:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, logits / max(temperature, 1e-6),
                                         axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
    return ids
