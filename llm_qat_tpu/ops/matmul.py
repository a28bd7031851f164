"""AMP-faithful matmul: bf16 MXU inputs in BOTH directions, f32 accumulation.

XLA's autodiff of `dot(a_bf16, b_bf16, preferred_element_type=f32)` feeds the
f32 cotangent straight into the transpose dots, producing mixed f32×bf16
matmuls that run at the MXU's fp32 rate (~4x slower on v5e). The reference
trains under `torch.amp.autocast` (`train_sp.py:319,452`), whose backward
runs the transposed matmuls in fp16 — so casting the cotangent to bf16 before
the backward dots is the faithful TPU equivalent, not a shortcut. Measured in
scripts/train_bench.py (r4): the SP train step's backward matmul time drops
~4x with this wrapper.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def matmul_bf16(a, b, compute_dtype=jnp.bfloat16):
    """a @ b with both operands cast to `compute_dtype` and f32 accumulation.

    Gradients: da = g @ bᵀ, db = aᵀ @ g, with g also cast to `compute_dtype`
    (AMP-faithful backward). Output is f32.
    """
    cdt = jnp.dtype(compute_dtype)
    return jnp.dot(a.astype(cdt), b.astype(cdt),
                   preferred_element_type=jnp.float32)


def _mm_fwd(a, b, compute_dtype):
    cdt = jnp.dtype(compute_dtype)
    ab = a.astype(cdt)
    bb = b.astype(cdt)
    out = jnp.dot(ab, bb, preferred_element_type=jnp.float32)
    return out, (ab, bb)


def _mm_bwd(compute_dtype, res, g):
    ab, bb = res
    cdt = jnp.dtype(compute_dtype)
    gb = g.astype(cdt)
    # a: (..., K), b: (K, N), g: (..., N)
    lead = tuple(range(ab.ndim - 1))
    da = jax.lax.dot_general(gb, bb, (((gb.ndim - 1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    db = jax.lax.dot_general(ab, gb, ((lead, lead), ((), ())),
                             preferred_element_type=jnp.float32)
    return da, db


matmul_bf16.defvjp(_mm_fwd, _mm_bwd)
