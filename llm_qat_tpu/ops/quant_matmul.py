"""Fused dequantize→matmul Pallas kernels for packed low-bit weights.

The SURVEY.md §7 "native" work: the reference stores fake-quantized weights in
full fp32 and pays full-precision HBM traffic on every matmul
(`part1_switchable_precision/lora.py:141-150`). Here weights live in HBM as
int8 (or nibble-packed int4) plus per-output-channel scales; the Pallas
kernel streams the packed tile into VMEM, dequantizes on the VPU, and feeds
the MXU — weight memory traffic drops 4x/8x vs fp32, which is the decode
bottleneck (decode is weight-bandwidth-bound at small batch).

Numerics match `fake_quant_minmax` symmetric: w ≈ w_q * scale with
w_q ∈ [-(2^(b-1)-1), 2^(b-1)-1] (reference `quantization_methods.py:13-16`).
Packing helpers return (packed, scale); `quant_matmul` computes
x @ dequant(packed) with a jnp fallback for CPU/interpret testing.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Packing
# ---------------------------------------------------------------------------


def pack_int8(w, per_channel: bool = True) -> Tuple[jax.Array, jax.Array]:
    """w (K, N) float → (w_q int8 (K, N), scale f32 (N,) or (1,))."""
    w = jnp.asarray(w, jnp.float32)
    axes = (0,) if per_channel else (0, 1)
    abs_max = jnp.maximum(jnp.max(jnp.abs(w), axis=axes), 1e-8)
    scale = abs_max / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, jnp.atleast_1d(scale)


def pack_int4(w, per_channel: bool = True) -> Tuple[jax.Array, jax.Array]:
    """w (K, N) float → (packed int8 (K//2, N) holding two nibbles along K,
    scale (N,)). K must be even. Nibbles store q+8 in [1, 15] (q in [-7, 7]).
    """
    w = jnp.asarray(w, jnp.float32)
    K, N = w.shape
    assert K % 2 == 0, "K must be even for int4 packing"
    axes = (0,) if per_channel else (0, 1)
    abs_max = jnp.maximum(jnp.max(jnp.abs(w), axis=axes), 1e-8)
    scale = abs_max / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int32) + 8  # [1,15]
    lo = q[0::2]  # (K//2, N)
    hi = q[1::2]
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return packed, jnp.atleast_1d(scale)


def unpack_int4(packed) -> jax.Array:
    """(K//2, N) uint8 → (K, N) int32 values in [-7, 7]."""
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = ((p >> 4) & 0xF) - 8
    K2, N = p.shape
    out = jnp.stack([lo, hi], axis=1).reshape(2 * K2, N)
    return out


# ---------------------------------------------------------------------------
# jnp reference paths
# ---------------------------------------------------------------------------


def quant_matmul_int8_reference(x, w_q, scale):
    wf = w_q.astype(jnp.float32) * scale[None, :]
    return jnp.dot(x.astype(jnp.float32), wf, preferred_element_type=jnp.float32)


def quant_matmul_int4_reference(x, packed, scale):
    wf = unpack_int4(packed).astype(jnp.float32) * scale[None, :]
    return jnp.dot(x.astype(jnp.float32), wf, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:].astype(jnp.bfloat16)  # (M, K)
    w = w_ref[:].astype(jnp.bfloat16)  # (K, bn) — int8 tile dequant on VPU
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[:].astype(jnp.float32)  # (1, bn) broadcast


def _int4_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:].astype(jnp.bfloat16)  # (M, K)
    p = w_ref[:].astype(jnp.int32)  # (K//2, bn)
    lo = ((p & 0xF) - 8).astype(jnp.bfloat16)
    hi = (((p >> 4) & 0xF) - 8).astype(jnp.bfloat16)
    K2 = p.shape[0]
    # interleave back to (K, bn): even rows lo, odd rows hi
    w = jnp.stack([lo, hi], axis=1).reshape(2 * K2, p.shape[1])
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = acc * s_ref[:].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def quant_matmul_int8(x, w_q, scale, *, block_n: int = 512,
                      interpret: bool = False):
    """x (M, K) @ dequant(w_q (K, N) int8, scale (N,)) → (M, N) f32.

    Grid over N tiles; x replicated per tile (decode M is small). Weight
    tiles stream HBM→VMEM as int8 — 4x less traffic than fp32.
    """
    M, K = x.shape
    Kw, N = w_q.shape
    assert K == Kw
    block_n = min(block_n, N)
    scale2d = jnp.broadcast_to(scale.reshape(1, -1), (1, N))

    return pl.pallas_call(
        _int8_kernel,
        grid=(pl.cdiv(N, block_n),),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x, w_q, scale2d)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def quant_matmul_int4(x, packed, scale, *, block_n: int = 512,
                      interpret: bool = False):
    """x (M, K) @ dequant(packed (K//2, N) nibbles, scale (N,)) → (M, N)."""
    M, K = x.shape
    K2, N = packed.shape
    assert K == 2 * K2
    block_n = min(block_n, N)
    scale2d = jnp.broadcast_to(scale.reshape(1, -1), (1, N))

    return pl.pallas_call(
        _int4_kernel,
        grid=(pl.cdiv(N, block_n),),
        in_specs=[
            pl.BlockSpec((M, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K2, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(x, packed, scale2d)


def quant_matmul(x, w_packed, scale, bits: int = 8, *,
                 use_pallas: Optional[bool] = None, interpret: bool = False):
    """Dispatch: Pallas on TPU, jnp reference elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if bits == 8:
        if use_pallas:
            return quant_matmul_int8(x, w_packed, scale, interpret=interpret)
        return quant_matmul_int8_reference(x, w_packed, scale)
    if bits == 4:
        if use_pallas:
            return quant_matmul_int4(x, w_packed, scale, interpret=interpret)
        return quant_matmul_int4_reference(x, w_packed, scale)
    raise ValueError(f"unsupported packed bits: {bits}")
