"""Functional calibration state for fake quantizers.

The reference implements calibration as a mutable three-phase state machine on
`LearnableFakeQuantize` (`part1_switchable_precision/quantization.py:96-209`):
`start_calibration()` → N forwards collecting running min/max →
`finish_calibration()` computes scale/zero_point. Here the same math is a pure
fold over batches: `init_stats` / `update_stats` produce a `QuantStats` pytree
(safe to carry through `jax.lax.scan` or a jitted update), and `finalize` turns
it into `(scale, zero_point)` with exactly the reference's formulas
(`quantization.py:104-139`).

Granularity follows the reference (`quantization.py:141-150`): per-channel
keeps `channel_dim` and reduces everything else (keepdims), per-tensor reduces
all dims to a scalar.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .functional import KIND_LOG, KIND_MINMAX


class QuantStats(NamedTuple):
    """Running min/max statistics (the reference's temp_min/temp_max buffers)."""

    running_min: jax.Array
    running_max: jax.Array
    count: jax.Array  # number of batches folded in (num_batches_collected)


def reduction_axes(ndim: int, channel_dim: Optional[int]) -> tuple:
    """Axes to reduce for stat collection (reference `quantization.py:141-150`).

    `channel_dim=None` → per-tensor (reduce all axes). Otherwise reduce every
    axis except `channel_dim` (negative dims allowed).
    """
    if channel_dim is None:
        return tuple(range(ndim))
    actual = channel_dim if channel_dim >= 0 else ndim + channel_dim
    return tuple(d for d in range(ndim) if d != actual)


def batch_min_max(x, axes: Sequence[int], kind: int, eps: float = 1e-5):
    """Per-batch (min, max) with keepdims, in the quantizer's stat domain.

    minmax kind: plain min/max of x (reference `quantization.py:198-200`).
    log kind: min/max of log2(clamp(|x|, eps)) (reference
    `quantization.py:177-186`; values below eps clamp to log2(eps), matching
    the reference when the batch has any non-zero element).
    """
    x = jnp.asarray(x, jnp.float32)
    if kind == KIND_LOG:
        stat = jnp.log2(jnp.maximum(jnp.abs(x), eps))
        return (
            jnp.min(stat, axis=tuple(axes), keepdims=True),
            jnp.max(stat, axis=tuple(axes), keepdims=True),
        )
    return (
        jnp.min(x, axis=tuple(axes), keepdims=True),
        jnp.max(x, axis=tuple(axes), keepdims=True),
    )


def init_stats(shape=()) -> QuantStats:
    """Empty stats; first `update_stats` overwrites min/max entirely."""
    return QuantStats(
        running_min=jnp.full(shape, jnp.inf, jnp.float32),
        running_max=jnp.full(shape, -jnp.inf, jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def update_stats(stats: QuantStats, x, channel_dim: Optional[int], kind: int,
                 eps: float = 1e-5) -> QuantStats:
    """Fold one batch into the running stats (reference `quantization.py:174-209`)."""
    axes = reduction_axes(jnp.ndim(x), channel_dim)
    bmin, bmax = batch_min_max(x, axes, kind, eps)
    return QuantStats(
        running_min=jnp.minimum(stats.running_min, bmin),
        running_max=jnp.maximum(stats.running_max, bmax),
        count=stats.count + 1,
    )


def finalize(stats: QuantStats, num_bits, kind: int, symmetric: bool = True,
             eps: float = 1e-5):
    """Compute (scale, zero_point) from collected stats.

    Reference `finish_calibration` (`quantization.py:104-139`):
    - log: zero_point ← log_min, scale ← log_range = log_max - log_min
    - minmax symmetric: scale = max(|min|,|max|).clamp(eps) / (2^(b-1)-1), zp=0
    - minmax asymmetric: scale = clamp(max-min, eps) / (2^b-1),
      zp = round(-min/scale)

    `num_bits` may be traced. Returns float32 arrays shaped like the stats.
    """
    rmin = stats.running_min
    rmax = stats.running_max
    b = jnp.asarray(num_bits, jnp.float32)
    if kind == KIND_LOG:
        log_range = rmax - rmin
        return log_range, rmin  # (scale=log_range, zero_point=log_min)
    if symmetric:
        abs_max = jnp.maximum(jnp.abs(rmin), jnp.abs(rmax))
        abs_max = jnp.maximum(abs_max, eps)
        scale = abs_max / (jnp.exp2(b - 1.0) - 1.0)
        return scale, jnp.zeros_like(scale)
    range_val = jnp.maximum(rmax - rmin, eps)
    scale = range_val / (jnp.exp2(b) - 1.0)
    zero_point = jnp.round(-rmin / scale)
    return scale, zero_point


def calibrate_tensor(x, num_bits, kind: int, channel_dim: Optional[int] = None,
                     symmetric: bool = True, eps: float = 1e-5):
    """One-shot calibration of a single tensor (weights, LoRA A/B).

    Equivalent to start_calibration → one stat pass → finish_calibration, the
    flow the reference uses for weight quantizers
    (`train_sp.py:58-88`) and for its every-micro-step LoRA re-calibration
    (`train_sp.py:125-163,362-364`). Returns (scale, zero_point).
    """
    stats = update_stats(init_stats(), x, channel_dim, kind, eps)
    return finalize(stats, num_bits, kind, symmetric, eps)


def dynamic_scale_flat(x, bits, kind, channel_dim: Optional[int],
                       symmetric: bool = True, eps: float = 1e-5):
    """Inline (per-forward) quantizer calibration without `lax.switch`.

    Both stat domains are computed from one pass over `x` and selected
    elementwise by the traced `kind` — the conditional-free counterpart of
    `models.sp_model.dynamic_scale`, with identical semantics (symmetric
    minmax abs-max scale; log range/min, reference `train_sp.py:125-163`).
    Used by the flat/fused linear paths so LoRA re-calibration stays one
    fusable elementwise+reduce chain.
    """
    axes = reduction_axes(jnp.ndim(x), channel_dim)
    xf = jnp.asarray(x, jnp.float32)
    bits = jnp.asarray(bits, jnp.float32)
    mn = jnp.min(xf, axis=axes, keepdims=True)
    mx = jnp.max(xf, axis=axes, keepdims=True)
    if symmetric:
        abs_max = jnp.maximum(jnp.maximum(jnp.abs(mn), jnp.abs(mx)), eps)
        mm_scale = abs_max / (jnp.exp2(bits - 1.0) - 1.0)
        mm_zp = jnp.zeros_like(mm_scale)
    else:
        rng_val = jnp.maximum(mx - mn, eps)
        mm_scale = rng_val / (jnp.exp2(bits) - 1.0)
        mm_zp = jnp.round(-mn / mm_scale)
    la = jnp.log2(jnp.maximum(jnp.abs(xf), eps))
    lmn = jnp.min(la, axis=axes, keepdims=True)
    lmx = jnp.max(la, axis=axes, keepdims=True)
    is_log = jnp.asarray(kind, jnp.int32) == KIND_LOG
    return (
        jnp.where(is_log, lmx - lmn, mm_scale),
        jnp.where(is_log, lmn, mm_zp),
    )
