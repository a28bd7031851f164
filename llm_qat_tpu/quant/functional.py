"""Pure-functional fake-quantization primitives with straight-through estimators.

TPU-native re-design of the reference quantization kernels
(`part1_switchable_precision/quantization_methods.py:5-98`,
`part2_cyclic_precision_training/quantization_methods.py:3-57`): the reference
implements min-max and log-domain fake quantization as `torch.autograd.Function`s
with STE backward; here they are pure jnp functions wrapped in `jax.custom_vjp`,
designed so that `num_bits` can be a *traced* scalar — the key departure that
lets a jitted step switch precision without recompiling.

Semantics matched to the reference:
- minmax symmetric:  q = clamp(round(x/s), -(2^(b-1)-1), 2^(b-1)-1); out = q*s
  (`quantization_methods.py:13-16`)
- minmax asymmetric: q = clamp(round(x/s + zp), 0, 2^b-1); out = (q-zp)*s
  (`quantization_methods.py:17-20`)
- minmax backward: identity STE (`quantization_methods.py:24-28`)
- log: sign/magnitude quantization of log2|x| normalized into
  [log_min, log_min+log_range], zeros (|x|<eps) preserved exactly
  (`quantization_methods.py:30-79`)
- log backward: gradient *values* clamped to [-10, 10]
  (`quantization_methods.py:81-90`)

All functions operate on arbitrary-rank arrays; `scale`/`zero_point` (or
`log_min`/`log_range`) broadcast against `x`, which covers both per-tensor
(scalar) and per-channel (keepdims-reduced) granularity. Traced quantizer
operands (`scale`, `zero_point`, `num_bits`, `kind`) are float32 so the STE
backward can return plain zero cotangents for them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

KIND_MINMAX = 0
KIND_LOG = 1


# ---------------------------------------------------------------------------
# MinMax fake quantization
# ---------------------------------------------------------------------------


def _minmax_fwd_math(x, scale, zero_point, num_bits, symmetric):
    """Forward math of minmax fake-quant. `num_bits` may be traced."""
    b = jnp.asarray(num_bits, x.dtype)
    scale = jnp.asarray(scale, x.dtype)
    zero_point = jnp.asarray(zero_point, x.dtype)
    if symmetric:
        # 2^(b-1) - 1 computed in float so b may be traced; exact for b <= 24.
        qmax = jnp.exp2(b - 1.0) - 1.0
        q = jnp.round(x / scale)
        q = jnp.clip(q, -qmax, qmax)
        return q * scale
    else:
        qmax = jnp.exp2(b) - 1.0
        q = jnp.round(x / scale + zero_point)
        q = jnp.clip(q, 0.0, qmax)
        return (q - zero_point) * scale


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def fake_quant_minmax(x, scale, zero_point, num_bits, symmetric=True):
    """Min-max fake quantization with identity STE backward.

    Mirrors `MinMaxQuantizationFunction` (reference
    `part1_switchable_precision/quantization_methods.py:5-28`).
    """
    return _minmax_fwd_math(x, scale, zero_point, num_bits, symmetric)


def _minmax_vjp_fwd(x, scale, zero_point, num_bits, symmetric):
    out = _minmax_fwd_math(x, scale, zero_point, num_bits, symmetric)
    return out, (scale, zero_point, num_bits)


def _minmax_vjp_bwd(symmetric, res, g):
    scale, zero_point, num_bits = res
    # Identity STE: gradient flows unchanged to x; zero grads for quant params.
    return (
        g,
        jnp.zeros_like(scale),
        jnp.zeros_like(zero_point),
        jnp.zeros_like(num_bits),
    )


fake_quant_minmax.defvjp(_minmax_vjp_fwd, _minmax_vjp_bwd)


# ---------------------------------------------------------------------------
# Log-domain fake quantization
# ---------------------------------------------------------------------------


def _log_fwd_math(x, log_min, log_range, num_bits, symmetric, eps):
    """Forward math of log fake-quant (reference `quantization_methods.py:33-79`)."""
    b = jnp.asarray(num_bits, x.dtype)
    log_min = jnp.asarray(log_min, x.dtype)
    log_range = jnp.asarray(log_range, x.dtype)

    zero_mask = jnp.abs(x) < eps
    sign_x = jnp.sign(x)
    abs_x = jnp.maximum(jnp.abs(x), eps)
    log_abs = jnp.log2(abs_x)

    log_norm = (log_abs - log_min) / jnp.maximum(log_range, eps)
    log_norm = jnp.clip(log_norm, 0.0, 1.0)

    full = jnp.exp2(b) - 1.0  # 2^b - 1
    if symmetric:
        n_levels = jnp.exp2(b - 1.0) - 1.0  # 2^(b-1) - 1
        centered = log_norm - 0.5
        q = jnp.round(centered * 2.0 * n_levels)
        q = jnp.clip(q, -n_levels, n_levels)
        q = (q / (2.0 * n_levels) + 0.5) * full
        q_norm = q / full
    else:
        q = jnp.round(log_norm * full)
        q = jnp.clip(q, 0.0, full)
        q_norm = q / full

    x_hat = q_norm * log_range + log_min
    magnitude = jnp.exp2(x_hat)
    out = magnitude * sign_x
    return jnp.where(zero_mask, jnp.zeros_like(x), out)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fake_quant_log(x, log_min, log_range, num_bits, symmetric=True, eps=1e-5):
    """Log-domain fake quantization; STE backward clamps grads to [-10, 10].

    Mirrors `LogQuantizationFunction` (reference
    `part1_switchable_precision/quantization_methods.py:30-90`). Note the
    reference stores `log_min` in the quantizer's `zero_point` buffer and
    `log_range` in `scale` (`quantization.py:115-116`).
    """
    return _log_fwd_math(x, log_min, log_range, num_bits, symmetric, eps)


def _log_vjp_fwd(x, log_min, log_range, num_bits, symmetric, eps):
    out = _log_fwd_math(x, log_min, log_range, num_bits, symmetric, eps)
    return out, (log_min, log_range, num_bits)


def _log_vjp_bwd(symmetric, eps, res, g):
    log_min, log_range, num_bits = res
    # Reference clamps the gradient *values* to +-10 (quantization_methods.py:88).
    return (
        jnp.clip(g, -10.0, 10.0),
        jnp.zeros_like(log_min),
        jnp.zeros_like(log_range),
        jnp.zeros_like(num_bits),
    )


fake_quant_log.defvjp(_log_vjp_fwd, _log_vjp_bwd)


# ---------------------------------------------------------------------------
# Unified dispatch: kind/bits as traced operands
# ---------------------------------------------------------------------------


def fake_quant(x, scale, zero_point, num_bits, kind, symmetric=True, eps=1e-5):
    """Dispatch between minmax/log/pass-through with traced `num_bits`/`kind`.

    `kind` selects KIND_MINMAX or KIND_LOG; `num_bits >= 32` passes through
    unquantized (reference `quantization.py:212-213`). For the log kind,
    `zero_point` holds log_min and `scale` holds log_range, matching the
    reference's buffer reuse (`quantization.py:115-116,235-239`). Both `kind`
    and `num_bits` may be traced scalars, so one compiled executable serves
    every precision in a parameter bank.
    """
    x = jnp.asarray(x)
    num_bits = jnp.asarray(num_bits, jnp.float32)
    kind = jnp.asarray(kind, jnp.int32)
    scale = jnp.asarray(scale, jnp.float32)
    zero_point = jnp.asarray(zero_point, jnp.float32)

    def _passthrough(operands):
        xx, _s, _z, _b = operands
        return xx

    def _quantize(operands):
        xx, s, z, b = operands

        def _mm(ops):
            x2, s2, z2, b2 = ops
            return fake_quant_minmax(x2, s2, z2, b2, symmetric)

        def _lg(ops):
            x2, s2, z2, b2 = ops
            # zero_point buffer == log_min, scale buffer == log_range
            return fake_quant_log(x2, z2, s2, b2, symmetric, eps)

        return jax.lax.switch(kind, [_mm, _lg], (xx, s, z, b))

    return jax.lax.cond(
        num_bits >= 32.0, _passthrough, _quantize, (x, scale, zero_point, num_bits)
    )


# ---------------------------------------------------------------------------
# Flat (conditional-free) dispatch — the hot-path variant
# ---------------------------------------------------------------------------


def _flat_fwd_math(x, scale, zero_point, num_bits, kind, symmetric, eps):
    """Both quantizer domains computed, selected by `kind`/`num_bits` with
    elementwise `where` — no `lax.cond`/`lax.switch`.

    Semantically identical to `fake_quant` (the log kind reads log_min from
    the zero_point slot and log_range from the scale slot, reference
    `quantization.py:115-116`), but emits one straight-line fused elementwise
    HLO instead of nested conditionals. Conditionals cannot fuse with their
    surroundings, so on the training hot path (8 fake-quants per block, 12
    blocks, 4 micro-steps, fwd+bwd) the `fake_quant` version costs hundreds
    of unfused kernel launches per step; this version is the remedy measured
    in `scripts/train_profile.py`.
    """
    mm = _minmax_fwd_math(x, scale, zero_point, num_bits, symmetric)
    lg = _log_fwd_math(x, zero_point, scale, num_bits, symmetric, eps)
    q = jnp.where(jnp.asarray(kind, jnp.int32) == KIND_LOG, lg, mm)
    return jnp.where(jnp.asarray(num_bits, x.dtype) >= 32.0, x, q)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fake_quant_flat_core(x, scale, zero_point, num_bits, kind_f, symmetric,
                          eps):
    return _flat_fwd_math(x, scale, zero_point, num_bits, kind_f, symmetric,
                          eps)


def _flat_vjp_fwd(x, scale, zero_point, num_bits, kind_f, symmetric, eps):
    out = _flat_fwd_math(x, scale, zero_point, num_bits, kind_f, symmetric,
                         eps)
    return out, (scale, zero_point, num_bits, kind_f)


def _flat_vjp_bwd(symmetric, eps, res, g):
    scale, zero_point, num_bits, kind_f = res
    clamp = jnp.logical_and(
        jnp.asarray(kind_f, jnp.int32) == KIND_LOG,
        jnp.asarray(num_bits, jnp.float32) < 32.0,
    )
    gx = jnp.where(clamp, jnp.clip(g, -10.0, 10.0), g)
    return (
        gx,
        jnp.zeros_like(scale),
        jnp.zeros_like(zero_point),
        jnp.zeros_like(num_bits),
        jnp.zeros_like(kind_f),
    )


_fake_quant_flat_core.defvjp(_flat_vjp_fwd, _flat_vjp_bwd)


def fake_quant_flat(x, scale, zero_point, num_bits, kind, symmetric=True,
                    eps=1e-5):
    """`fake_quant` with conditional-free forward and a single fused STE.

    Backward: identity for minmax/passthrough, ±10 clamp for the log kind
    below 32 bits (`quantization_methods.py:24-28,81-90`) — selected by the
    same traced `kind`/`num_bits` operands. All quantizer operands are cast
    to float32 at this boundary so STE cotangents are plain zeros.
    """
    x = jnp.asarray(x)
    return _fake_quant_flat_core(
        x,
        jnp.asarray(scale, jnp.float32),
        jnp.asarray(zero_point, jnp.float32),
        jnp.asarray(num_bits, jnp.float32),
        jnp.asarray(kind, jnp.float32),
        symmetric,
        eps,
    )


# ---------------------------------------------------------------------------
# Gradient quantization (reference part2 `quantization.py:14-26`)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def quantize_gradient(x, scale, zero_point, num_bits, kind):
    """Identity forward; backward fake-quantizes the cotangent.

    TPU-native equivalent of `GradientQuantizer` (reference
    `part2_cyclic_precision_training/quantization.py:14-26`), which quantizes
    LoRA gradients to `gradient_bits` (8) during CPT training. All quantizer
    operands are float32 traced scalars/arrays.
    """
    del scale, zero_point, num_bits, kind
    return x


def _qgrad_fwd(x, scale, zero_point, num_bits, kind):
    return x, (scale, zero_point, num_bits, kind)


def _qgrad_bwd(res, g):
    scale, zero_point, num_bits, kind = res
    gq = fake_quant(g, scale, zero_point, num_bits, kind, symmetric=True)
    return (
        gq,
        jnp.zeros_like(scale),
        jnp.zeros_like(zero_point),
        jnp.zeros_like(num_bits),
        jnp.zeros_like(kind),
    )


quantize_gradient.defvjp(_qgrad_fwd, _qgrad_bwd)
