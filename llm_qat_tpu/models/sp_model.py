"""Switchable-precision GPT-2 as pure functions over stacked parameter banks.

TPU-native re-design of the reference SP model stack
(`part1_switchable_precision/models_sp.py`, `lora.py`,
`switchable_batchnorm.py`): instead of ModuleDicts keyed by `'{bits}bit'`
strings and mutable `set_precision` fan-out (`models_sp.py:224-234`,
`lora.py:105-121`), every per-precision quantity lives in an array bank with a
leading precision axis `P`, and the active precision is a *traced* int32 index
`prec` — so one jitted executable serves every bit-width, and "switching
precision" is free.

Bank layout per quantized linear (reference `SPLinearWithLoRA`, `lora.py:56-150`):
- `w`:        (in, out) float32 — frozen base weight (JAX x@W convention; the
              reference's (out,in) torch layout is transposed at import)
- `b`:        (out,)
- `wq_scale`: (P, out) per-channel (ref channel_dim=0 over out_features) or (P, 1)
- `wq_zp`:    same shape (log kind: zp slot holds log_min, scale slot log_range)
- `iq_scale`: (P, in) per-channel (ref channel_dim=-1) or (P, 1)
- `iq_zp`:    same shape
- `lora_A`:   (P, in, r) — per-bit LoRA bank (ref `lora.py:35-38`); the 32-bit
              slot is zeros with scaling 0 (ref `lora.py:23-29`)
- `lora_B`:   (P, r, out)

LoRA quantizer scales are computed *dynamically* from the current A/B each
forward: the reference re-calibrates LoRA quantizers on every low-bit
micro-step anyway (`train_sp.py:362-364`), so inline dynamic calibration is
semantically equivalent and removes host-side state.

Switchable LayerNorm (`switchable_batchnorm.py:7-109`) becomes gamma/beta
banks of shape (P, d) gathered by `prec`.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import causal_attention
from ..ops.matmul import matmul_bf16
from ..quant.calibration import dynamic_scale_flat, reduction_axes
from ..quant.functional import KIND_LOG, fake_quant, fake_quant_flat
from .config import GPT2Config, QuantConfig, SPModelConfig


class PrecTables(NamedTuple):
    """Static per-precision lookup tables, indexed by the traced `prec`."""

    bits: jax.Array  # float32[P]
    kind: jax.Array  # int32[P]
    scaling: jax.Array  # float32[P] — LoRA alpha/rank (0 when disabled)


def prec_tables(qcfg: QuantConfig) -> PrecTables:
    return PrecTables(
        bits=jnp.asarray(qcfg.bits_table()),
        kind=jnp.asarray(qcfg.kind_table()),
        scaling=jnp.asarray(qcfg.scaling_table()),
    )


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_linear(rng, d_in: int, d_out: int, qcfg: QuantConfig) -> Dict[str, Any]:
    P, r = qcfg.n_prec, qcfg.max_rank
    k_w, k_a = jax.random.split(rng)
    # base linear: torch nn.Linear default init (kaiming uniform, bound 1/sqrt(in))
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(k_w, (d_in, d_out), jnp.float32, -bound, bound)
    ch_w = d_out if qcfg.per_channel else 1
    ch_i = d_in if qcfg.per_channel else 1
    # LoRA A: torch kaiming_uniform(a=sqrt(5)) on (in, r) → U(±1/sqrt(r))
    # (reference lora.py:37); zero the slots whose rank is 0 (the 32-bit slot).
    a_bound = 1.0 / math.sqrt(max(r, 1))
    lora_A = jax.random.uniform(k_a, (P, d_in, r), jnp.float32, -a_bound, a_bound)
    enabled = jnp.asarray(
        [1.0 if s > 0 else 0.0 for s in qcfg.scaling_table()], jnp.float32
    )
    lora_A = lora_A * enabled[:, None, None]
    return {
        "w": w,
        "b": jnp.zeros((d_out,), jnp.float32),
        "wq_scale": jnp.ones((P, ch_w), jnp.float32),
        "wq_zp": jnp.zeros((P, ch_w), jnp.float32),
        "iq_scale": jnp.ones((P, ch_i), jnp.float32),
        "iq_zp": jnp.zeros((P, ch_i), jnp.float32),
        "lora_A": lora_A,
        "lora_B": jnp.zeros((P, r, d_out), jnp.float32),
    }


def _init_ln(d: int, P: int) -> Dict[str, Any]:
    return {
        "g": jnp.ones((P, d), jnp.float32),
        "b": jnp.zeros((P, d), jnp.float32),
    }


def _init_block(rng, cfg: SPModelConfig) -> Dict[str, Any]:
    d = cfg.model.n_embd
    P = cfg.quant.n_prec
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "ln1": _init_ln(d, P),
        "c_attn": _init_linear(k1, d, 3 * d, cfg.quant),
        "attn_proj": _init_linear(k2, d, d, cfg.quant),
        "ln2": _init_ln(d, P),
        "c_fc": _init_linear(k3, d, 4 * d, cfg.quant),
        "mlp_proj": _init_linear(k4, 4 * d, d, cfg.quant),
    }


def init_sp_params(rng, cfg: SPModelConfig) -> Dict[str, Any]:
    """Initialize the full SP parameter pytree, blocks stacked over layer axis.

    Block parameters carry a leading `n_layer` axis so the forward pass is a
    `lax.scan` over layers (one compiled block body instead of 12 unrolled).
    """
    m = cfg.model
    k_wte, k_wpe, k_blocks = jax.random.split(rng, 3)
    block_keys = jax.random.split(k_blocks, m.n_layer)
    blocks = jax.vmap(lambda k: _init_block(k, cfg))(block_keys)
    return {
        "wte": 0.02 * jax.random.normal(k_wte, (m.vocab_size, m.n_embd), jnp.float32),
        "wpe": 0.01 * jax.random.normal(k_wpe, (m.n_positions, m.n_embd), jnp.float32),
        "blocks": blocks,
        "ln_f": _init_ln(m.n_embd, cfg.quant.n_prec),
    }


# ---------------------------------------------------------------------------
# Dynamic (inline) quantizer calibration — used for LoRA A/B
# ---------------------------------------------------------------------------


def dynamic_scale(x, bits, kind, channel_dim: Optional[int], symmetric: bool = True,
                  eps: float = 1e-5):
    """(scale, zero_point) computed from `x` with traced bits/kind.

    Traced-kind version of `calibrate_tensor` — both stat domains are computed
    and `lax.switch` selects, so precision stays a runtime index. Matches the
    per-step LoRA re-calibration of the reference (`train_sp.py:125-163`).
    """
    axes = reduction_axes(jnp.ndim(x), channel_dim)
    xf = jnp.asarray(x, jnp.float32)

    def _mm(_):
        mn = jnp.min(xf, axis=axes, keepdims=True)
        mx = jnp.max(xf, axis=axes, keepdims=True)
        if symmetric:
            abs_max = jnp.maximum(jnp.maximum(jnp.abs(mn), jnp.abs(mx)), eps)
            scale = abs_max / (jnp.exp2(bits - 1.0) - 1.0)
            return scale, jnp.zeros_like(scale)
        rng_val = jnp.maximum(mx - mn, eps)
        scale = rng_val / (jnp.exp2(bits) - 1.0)
        return scale, jnp.round(-mn / scale)

    def _lg(_):
        la = jnp.log2(jnp.maximum(jnp.abs(xf), eps))
        mn = jnp.min(la, axis=axes, keepdims=True)
        mx = jnp.max(la, axis=axes, keepdims=True)
        return mx - mn, mn  # scale=log_range, zp=log_min

    return jax.lax.switch(jnp.asarray(kind, jnp.int32), [_mm, _lg], None)


# ---------------------------------------------------------------------------
# Forward pieces
# ---------------------------------------------------------------------------


def _input_stats(x, per_channel: bool, eps: float):
    """Min/max stats of a linear's input in both quantizer domains.

    Collected during input-quantizer calibration forwards (the reference runs
    10 batches through the model with LoRA disabled, `train_sp.py:90-123`).
    Both domains are collected so `finalize` can build each precision's params
    from one pass regardless of its minmax/log kind.
    """
    axes = tuple(range(x.ndim - 1)) if per_channel else tuple(range(x.ndim))
    xf = jnp.asarray(x, jnp.float32)
    la = jnp.log2(jnp.maximum(jnp.abs(xf), eps))
    return {
        "mm_min": jnp.min(xf, axis=axes),
        "mm_max": jnp.max(xf, axis=axes),
        "lg_min": jnp.min(la, axis=axes),
        "lg_max": jnp.max(la, axis=axes),
    }


def sp_linear(x, p, prec, tables: PrecTables, cfg: SPModelConfig,
              calibration_mode: bool = False, collect_stats: bool = False,
              input_passthrough: bool = False):
    """Quantized linear with per-bit LoRA (reference `lora.py:127-150`).

    Returns (out, stats|None). At the 32-bit slot `fake_quant` passes through
    and scaling==0 zeroes the LoRA branch, reproducing the reference's plain
    `F.linear` teacher path (`lora.py:129-131`).

    `input_passthrough=True` reproduces the stat-collection phase: the input
    quantizer returns x unquantized while collecting (reference
    `quantization.py:214-216`) but the (already-calibrated) weight quantizer
    stays active, which is exactly the state during the reference's 10
    input-calibration forwards (`train_sp.py:90-123`).
    """
    q = cfg.quant
    bits = tables.bits[prec]
    kind = tables.kind[prec]

    stats = _input_stats(x, q.per_channel, q.eps) if collect_stats else None

    impl = getattr(cfg, "linear_impl", "auto")
    if impl == "auto":
        # "flat" measured fastest on v5e for the full train step
        # (scripts/train_bench.py r4: cond 176.6 / flat 142.5 / fused 188.1
        # ms at B=8 T=256 accum=4, rolled layer scan) — the Pallas fused
        # path re-streams fp32 weight tiles per M-block and loses to XLA's
        # dot emitters at GPT-2 sizes; it remains available as
        # linear_impl="fused" (numerics-tested) for larger models where
        # weight re-streaming amortizes.
        impl = "flat"
    if impl == "fused" and not (input_passthrough or calibration_mode):
        from ..ops.fused_linear import fused_linear_supported, sp_linear_fused

        if fused_linear_supported(x, p, q):
            out = sp_linear_fused(
                x, p, prec, bits, kind, tables.scaling[prec], cfg
            )
            return out, stats
        impl = "flat"
    flatish = impl in ("flat", "fused")
    fq = fake_quant_flat if flatish else fake_quant
    dyn = dynamic_scale_flat if flatish else dynamic_scale
    cdt = jnp.dtype(cfg.compute_dtype)
    if flatish:
        # AMP-faithful matmuls: bf16 operands in both directions (the
        # reference's autocast backward runs in fp16); plain-dot autodiff
        # would run the transpose dots at fp32 MXU rate.
        mm = lambda a, b: matmul_bf16(a, b, cdt)
    else:
        mm = lambda a, b: jnp.dot(a.astype(cdt), b.astype(cdt),
                                  preferred_element_type=jnp.float32)

    if input_passthrough:
        xq = x
    else:
        xq = fq(x, p["iq_scale"][prec], p["iq_zp"][prec], bits, kind,
                q.symmetric, q.eps)
    wq = fq(p["w"], p["wq_scale"][prec][None, :], p["wq_zp"][prec][None, :],
            bits, kind, q.symmetric, q.eps)

    base = mm(xq, wq) + p["b"]

    if not calibration_mode and q.max_rank > 0:
        A = p["lora_A"][prec]
        B = p["lora_B"][prec]
        # reference LoRA quantizers: channel_dim=1 (lora.py:39-40)
        ch = 1 if q.per_channel else None
        a_s, a_z = dyn(A, bits, kind, ch, q.symmetric, q.eps)
        b_s, b_z = dyn(B, bits, kind, ch, q.symmetric, q.eps)
        Aq = fq(A, a_s, a_z, bits, kind, q.symmetric, q.eps)
        Bq = fq(B, b_s, b_z, bits, kind, q.symmetric, q.eps)
        # reference feeds the *raw* input to LoRA (lora.py:149)
        lora = mm(mm(x, Aq), Bq)
        base = base + tables.scaling[prec] * lora

    return base, stats


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layernorm_cvjp(x, g, b, eps):
    xf = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (g * xn + b).astype(x.dtype)


def _layernorm_cvjp_fwd(x, g, b, eps):
    xf = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xn = (xf - mean) * rstd
    y = (g * xn + b).astype(x.dtype)
    # residuals: x + the two (N, 1) row stats — xn is recomputed in the
    # backward (one fused elementwise) instead of saved (a (B, T, d) f32
    # residency the autodiff path was carrying between passes)
    return y, (x, mean, rstd, g)


def _layernorm_cvjp_bwd(eps, res, dy):
    x, mean, rstd, g = res
    dyf = jnp.asarray(dy, jnp.float32)
    xn = (jnp.asarray(x, jnp.float32) - mean) * rstd
    dg = jnp.sum(dyf * xn, axis=tuple(range(dyf.ndim - 1)))
    db = jnp.sum(dyf, axis=tuple(range(dyf.ndim - 1)))
    t = dyf * g
    dx = (t - jnp.mean(t, axis=-1, keepdims=True)
          - xn * jnp.mean(t * xn, axis=-1, keepdims=True)) * rstd
    return dx.astype(x.dtype), dg, db


_layernorm_cvjp.defvjp(_layernorm_cvjp_fwd, _layernorm_cvjp_bwd)


LN_IMPL = "cvjp"  # "cvjp" (hand-written backward) | "autodiff" (A/B switch)


def switchable_layernorm(x, ln, prec, eps: float):
    """Per-precision-affine LayerNorm (reference `switchable_batchnorm.py:102-109`).

    Manual mean/var over the feature dim (biased variance), then the gamma/beta
    pair gathered from the (P, d) bank by the traced `prec` index. The
    backward is a hand-written single-pass custom_vjp (the standard LN
    gradient identity) — XLA's autodiff of the mean/var chain emitted
    several extra fused reductions per LN, ~8.4 ms/step across the 96
    fwd+bwd LN calls of a train iteration (r4 trace, VERDICT r4 #7); the
    bank gather/scatter stays outside and differentiates as usual.
    Gradients match autodiff to fp rounding (tests/test_sp_model.py).
    """
    if LN_IMPL == "cvjp":
        return _layernorm_cvjp(x, ln["g"][prec], ln["b"][prec], eps)
    xf = jnp.asarray(x, jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (ln["g"][prec] * xn + ln["b"][prec]).astype(x.dtype)


def sp_block(x, bp, prec, tables, cfg: SPModelConfig, *, mask=None,
             calibration_mode=False, collect_stats=False,
             input_passthrough=False, attention_fn=None):
    """Pre-LN residual block (reference `models_sp.py:130-171`)."""
    m = cfg.model
    B, T, C = x.shape

    h = switchable_layernorm(x, bp["ln1"], prec, m.layer_norm_epsilon)
    qkv, s1 = sp_linear(h, bp["c_attn"], prec, tables, cfg,
                        calibration_mode, collect_stats, input_passthrough)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, T, m.n_head, m.head_dim).transpose(0, 2, 1, 3)

    # AMP-faithful attention on the flat/fused linear paths: q/k/v in
    # compute_dtype (the reference's autocast attention runs in fp16,
    # `train_sp.py:319`); the flash kernel keeps softmax stats in f32 and
    # the result is cast back to the residual dtype below.
    lin_impl = getattr(cfg, "linear_impl", "auto")
    amp = lin_impl != "cond" and jnp.dtype(cfg.compute_dtype) != jnp.float32
    cast = (lambda t: t.astype(cfg.compute_dtype)) if amp else (lambda t: t)

    if attention_fn is None:
        from ..ops.attention import FLASH_MIN_T

        impl = getattr(cfg, "attention_impl", "auto")
        # auto: flash only from FLASH_MIN_T up — below it the dense T×T
        # path measures faster on v5e (ops/attention.py crossover table);
        # "flash" forces the kernel at any supported length.
        use_flash = impl == "flash" or (
            impl == "auto" and jax.default_backend() == "tpu"
            and T >= FLASH_MIN_T)
        attn = causal_attention(cast(heads(q)), cast(heads(k)),
                                cast(heads(v)), mask=mask,
                                use_flash=use_flash, trainable=True,
                                interpret=jax.default_backend() != "tpu")
    else:
        attn = attention_fn(heads(q), heads(k), heads(v))
    attn = attn.astype(x.dtype).transpose(0, 2, 1, 3).reshape(B, T, C)
    attn_out, s2 = sp_linear(attn, bp["attn_proj"], prec, tables, cfg,
                             calibration_mode, collect_stats, input_passthrough)
    x = x + attn_out

    h2 = switchable_layernorm(x, bp["ln2"], prec, m.layer_norm_epsilon)
    fc, s3 = sp_linear(h2, bp["c_fc"], prec, tables, cfg,
                       calibration_mode, collect_stats, input_passthrough)
    fc = jax.nn.gelu(fc, approximate=False)  # reference nn.GELU() exact erf
    proj, s4 = sp_linear(fc, bp["mlp_proj"], prec, tables, cfg,
                         calibration_mode, collect_stats, input_passthrough)
    x = x + proj

    stats = None
    if collect_stats:
        stats = {"c_attn": s1, "attn_proj": s2, "c_fc": s3, "mlp_proj": s4}
    return x, stats


def sp_forward(
    params,
    input_ids,
    prec,
    cfg: SPModelConfig,
    *,
    tables: Optional[PrecTables] = None,
    inputs_embeds=None,
    mask=None,
    labels=None,
    deterministic: bool = True,
    dropout_rng=None,
    calibration_mode: bool = False,
    collect_stats: bool = False,
    input_passthrough: bool = False,
    output_hidden_states: bool = False,
    hidden_states_grad: bool = False,
    remat: bool = False,
    attention_fn=None,
):
    """Full SP LM forward (reference `SPModel.forward` `models_sp.py:300-336` +
    `SPLMHeadModel.forward` `models_sp.py:423-458`).

    Returns a dict with `logits`, optional `loss` (shifted CE ignoring -100
    labels), optional `hidden_states` ((L+1, B, T, d): embeddings + each
    block's input h + final ln_f output, detached exactly like the reference's
    `.clone().detach()` collection at `models_sp.py:322,331` — note the
    reference detaches for the STUDENT pass too, so its feature-distillation
    term carries no gradient and its published all-layers-vs-random ablation
    cannot be produced by the released code; `hidden_states_grad=True` opts
    into gradient-carrying collection for testing that ablation's premise
    (scripts/parity_scale.py)), and optional
    `stats` (input-quantizer calibration statistics per layer/linear).
    """
    if tables is None:
        tables = prec_tables(cfg.quant)
    prec = jnp.asarray(prec, jnp.int32)

    if inputs_embeds is not None:
        h = inputs_embeds
        B, T = h.shape[:2]
    else:
        B, T = input_ids.shape
        tok = params["wte"][input_ids]
        pos = params["wpe"][:T][None]
        h = tok + pos

    if not deterministic and cfg.model.embd_pdrop > 0.0:
        keep = 1.0 - cfg.model.embd_pdrop
        mask_drop = jax.random.bernoulli(dropout_rng, keep, h.shape)
        h = jnp.where(mask_drop, h / keep, 0.0)

    if remat:
        # reference optional gradient checkpointing (models_sp.py:154-158)
        def _plain_block(x, bp, prec_, tables_):
            return sp_block(x, bp, prec_, tables_, cfg, mask=mask,
                            calibration_mode=calibration_mode,
                            collect_stats=False)[0]

        block_fn = jax.checkpoint(_plain_block)

    def body(carry, bp):
        x = carry
        if remat:
            out = block_fn(x, bp, prec, tables)
            s = None
        else:
            out, s = sp_block(x, bp, prec, tables, cfg, mask=mask,
                              calibration_mode=calibration_mode,
                              collect_stats=collect_stats,
                              input_passthrough=input_passthrough,
                              attention_fn=attention_fn)
        ys = {}
        if output_hidden_states:
            ys["h_in"] = x if hidden_states_grad else jax.lax.stop_gradient(x)
        if collect_stats and s is not None:
            ys["stats"] = s
        return out, ys

    unroll = max(1, min(int(getattr(cfg, "scan_unroll", 1)),
                        cfg.model.n_layer))
    h, ys = jax.lax.scan(body, h, params["blocks"], unroll=unroll)

    h = switchable_layernorm(h, params["ln_f"], prec, cfg.model.layer_norm_epsilon)

    # lm_head in compute_dtype (bf16 on TPU), both directions: mirrors the
    # quantized linears' MXU convention and the reference's AMP autocast,
    # which runs this matmul in fp16 (`train_sp.py:319`). f32 inputs here
    # would be the single most expensive matmul in the model at 1/4 MXU rate.
    logits = matmul_bf16(h, params["wte"].T, jnp.dtype(cfg.compute_dtype))

    # live (gradient-carrying) trunk output for task heads (QA); the entries
    # in `hidden_states` are detached to mirror the reference's collection.
    out = {"logits": logits, "trunk": h}

    if output_hidden_states:
        final = (h if hidden_states_grad else jax.lax.stop_gradient(h))[None]
        out["hidden_states"] = jnp.concatenate([ys["h_in"], final], axis=0)
    if collect_stats:
        out["stats"] = ys.get("stats")

    if labels is not None:
        out["loss"] = lm_cross_entropy(logits, labels)

    return out


def lm_cross_entropy(logits, labels):
    """Shifted LM cross-entropy, mean over labels != -100.

    Matches `SPLMHeadModel.forward` (`models_sp.py:441-449`) with torch
    CrossEntropyLoss's default ignore_index=-100.
    """
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
