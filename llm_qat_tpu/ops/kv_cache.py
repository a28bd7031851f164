"""Quantized KV-cache storage (the KV axis of the W-A-KV bit configurations).

The reference's bit configurations carry a KV width (`bit_configurations.py`:
W4A8KV8 etc.) but only use it for the model-size formula — `set_kv_cache_bits`
is attempted and silently skipped (`sp_metrics.py:_apply_bit_config`). Here
KV quantization is real: cache rows are stored as int8 codes with one
float32 scale per (batch, head, position) row, written at append time and
dequantized on read. Cache HBM traffic halves vs bf16 (4x vs f32), which is
a first-order decode cost (see docs/RESULTS_R1.md).

Symmetric per-row quantization: scale = max|row| / 127, code = round(x/s).
Row granularity keeps the dequant a cheap broadcast multiply in the
attention einsum's operand.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class QuantizedKV(NamedTuple):
    """int8 codes + per-row scales for one cache (K or V)."""

    codes: jax.Array  # (B, H, T, D) int8
    scales: jax.Array  # (B, H, T, 1) float32


def init_quantized_kv(batch: int, n_head: int, max_len: int,
                      head_dim: int) -> QuantizedKV:
    return QuantizedKV(
        codes=jnp.zeros((batch, n_head, max_len, head_dim), jnp.int8),
        scales=jnp.zeros((batch, n_head, max_len, 1), jnp.float32),
    )


def quantize_rows(x) -> Tuple[jax.Array, jax.Array]:
    """x (..., S, D) → (int8 codes, f32 scales (..., S, 1))."""
    xf = jnp.asarray(x, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8)
    scale = amax / 127.0
    codes = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return codes, scale


def append_rows(cache: QuantizedKV, new, start) -> QuantizedKV:
    """Write new (B, H, S, D) rows at position `start` (scalar)."""
    codes, scales = quantize_rows(new)
    return QuantizedKV(
        codes=jax.lax.dynamic_update_slice(cache.codes, codes,
                                           (0, 0, start, 0)),
        scales=jax.lax.dynamic_update_slice(cache.scales, scales,
                                            (0, 0, start, 0)),
    )


def dequantize(cache: QuantizedKV, dtype=jnp.float32) -> jax.Array:
    return (cache.codes.astype(jnp.float32) * cache.scales).astype(dtype)


def attention_with_quantized_kv(q, k_cache: QuantizedKV, v_cache: QuantizedKV,
                                start, t_len, n_positions: int):
    """Causal attention over quantized caches for q (B, H, S, D).

    Scores dequantize K per-row via the scale broadcast; the value side
    applies scales to the probability-weighted sum. Numerically equal to
    dequantize-then-attend (tested), but written so XLA can fuse the scale
    multiplies into the einsums.
    """
    import math

    B, H, S, D = q.shape
    T_max = k_cache.codes.shape[2]
    sm_scale = 1.0 / math.sqrt(D)

    kf = k_cache.codes.astype(jnp.float32)
    scores = jnp.einsum("bhsd,bhtd->bhst", q.astype(jnp.float32), kf,
                        preferred_element_type=jnp.float32)
    scores = scores * k_cache.scales[..., 0][:, :, None, :] * sm_scale

    q_pos = start + jax.lax.broadcasted_iota(jnp.int32, (S, T_max), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T_max), 1)
    valid = k_pos <= jnp.minimum(q_pos, start + t_len - 1)
    scores = jnp.where(valid[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)

    # out = P @ (codes * scales) == (P * scalesᵀ) @ codes
    pw = probs * v_cache.scales[..., 0][:, :, None, :]
    out = jnp.einsum("bhst,bhtd->bhsd",
                     pw, v_cache.codes.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
