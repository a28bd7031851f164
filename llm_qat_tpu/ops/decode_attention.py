"""Fused single-token decode attention with in-place KV-cache update.

Decode profiling (bench.py path) shows a ~1.2 ms/step floor dominated by
per-layer cache handling: `dynamic_update_slice` materializes a full cache
copy (read+write) per layer, then the attention einsum reads it again, plus
a chain of mask/softmax kernels. This kernel fuses the whole per-layer
decode-attention sequence into ONE Pallas program per (batch, head):

    cache[b, h, pos, :] = k_new / v_new          (in-place, aliased buffers)
    scores = q · cacheᵀ  (masked to t <= pos)
    out    = softmax(scores) · cache

Cache traffic per layer drops from ~3x cache size (copy read+write + attend
read) to ~1x (attend read) + one row write. `input_output_aliases` makes the
caches update in place — callers must treat the passed caches as consumed
(donated), exactly like the existing decode loop already does.

Supports per-slot positions (continuous batching) via a (B,) position vector.

Measured on v5e (GPT-2 124M decode, batch 8): parity with the XLA unfused
path (~4.7k vs ~4.9k tok/s in the same contended run) — the masked
whole-block cache write costs the same HBM traffic as XLA's copy, and the
96-program grid adds per-program overhead. Kept opt-in
(`infer_forward_unrolled(fused_attention=True)`); the win requires manual
HBM-resident caches with row-only DMA (no full-block write-back), which
needs `pltpu.ANY` refs + async copies — future round.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_attn_kernel(pos_ref, q_ref, kn_ref, vn_ref, kc_ref, vc_ref,
                        o_ref, kc_out, vc_out, *, sm_scale):
    """One (batch*head) program. pos_ref is the FULL (B*H, 1) array in SMEM
    (TPU lowering requires whole-array or tile-aligned blocks for SMEM);
    q/kn/vn blocks (1, D); kc/vc aliased (T, D) VMEM."""
    pos = pos_ref[pl.program_id(0), 0]
    T = kc_out.shape[0]

    # row update via masked whole-block select: Mosaic cannot lower a
    # single-row dynamic store at an arbitrary sublane offset for narrow
    # dtypes, and the out_specs write the full block back regardless.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    sel = row_ids == pos
    k_all = jnp.where(sel, kn_ref[:].astype(kc_out.dtype), kc_ref[:])
    v_all = jnp.where(sel, vn_ref[:].astype(vc_out.dtype), vc_ref[:])
    kc_out[:] = k_all
    vc_out[:] = v_all

    q = q_ref[:].astype(jnp.float32) * sm_scale  # (1, D)
    k_all = k_all.astype(jnp.float32)  # (T, D)
    v_all = v_all.astype(jnp.float32)

    s = jnp.dot(q, k_all.T, preferred_element_type=jnp.float32)  # (1, T)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
    s = jnp.where(t_ids <= pos, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jnp.dot(p, v_all, preferred_element_type=jnp.float32) / jnp.maximum(
        l, 1e-30)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(3, 4))
def decode_attention(q, k_new, v_new, k_cache, v_cache, pos, *,
                     interpret: bool = False):
    """Fused decode attention.

    q, k_new, v_new: (B, H, 1, D); k_cache/v_cache: (B, H, T, D) — DONATED
    and updated in place at position `pos` ((B,) int32 or scalar).
    Returns (out (B, H, 1, D), k_cache, v_cache).
    """
    B, H, _, D = q.shape
    T = k_cache.shape[2]
    sm_scale = 1.0 / math.sqrt(D)

    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    pos_bh = jnp.repeat(pos, H).reshape(B * H, 1)  # (B*H, 1)

    def flat(x, t):
        return x.reshape(B * H, t, D)

    grid = (B * H,)
    out, kc, vc = pl.pallas_call(
        functools.partial(_decode_attn_kernel, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B*H, 1) pos array
            pl.BlockSpec((None, 1, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, 1, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, T, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, T, D), lambda b: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, 1, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, T, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((None, T, D), lambda b: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, 1, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, T, D), k_cache.dtype),
            jax.ShapeDtypeStruct((B * H, T, D), v_cache.dtype),
        ),
        input_output_aliases={4: 1, 5: 2},  # caches update in place
        interpret=interpret,
    )(pos_bh, flat(q, 1), flat(k_new, 1), flat(v_new, 1),
      flat(k_cache, T), flat(v_cache, T))

    return (out.reshape(B, H, 1, D), kc.reshape(B, H, T, D),
            vc.reshape(B, H, T, D))


def decode_attention_reference(q, k_new, v_new, k_cache, v_cache, pos):
    """jnp reference (the existing decode path's math) for testing."""
    B, H, _, D = q.shape
    T = k_cache.shape[2]
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,))
    rows = jnp.arange(B)
    kc = k_cache.at[rows, :, pos, :].set(k_new[:, :, 0, :].astype(k_cache.dtype))
    vc = v_cache.at[rows, :, pos, :].set(v_new[:, :, 0, :].astype(v_cache.dtype))
    scale = 1.0 / math.sqrt(D)
    s = jnp.einsum("bhsd,bhtd->bhst", q, kc,
                   preferred_element_type=jnp.float32) * scale
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    valid = t_ids <= pos[:, None]
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(vc.dtype)
    out = jnp.einsum("bhst,bhtd->bhsd", p, vc)
    return out, kc, vc
