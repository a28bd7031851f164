"""Causal self-attention ops: jnp reference + Pallas flash-attention kernel.

Replaces the reference's dense materialized T×T attention
(`part1_switchable_precision/models_sp.py:58-76`: QK^T/sqrt(d), tril mask,
softmax, V) with a blockwise Pallas kernel on TPU. The jnp path is the
numerics reference and the CPU-test fallback; both compute exactly the same
math (softmax in float32).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def causal_attention_reference(q, k, v, *, mask=None):
    """Dense causal attention (numerics reference).

    q,k,v: (B, H, T, D). Returns (B, H, T, D). Matches the reference math
    (`models_sp.py:68-73`): scores/sqrt(D), causal mask to -inf, softmax, V.
    `mask` optionally adds a padding mask of shape (B, T) (1=keep).
    """
    B, H, T, D = q.shape
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(D)
    causal = jnp.tril(jnp.ones((T, T), jnp.bool_))
    scores = jnp.where(causal[None, None], scores, NEG_INF)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :].astype(bool), scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention (causal, no materialized T×T)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, block_k,
                  sm_scale, seq_len):
    """One (batch*head, q-block) program: stream K/V blocks, online softmax."""
    q_blk = pl.program_id(1)
    block_q = q_ref.shape[0]

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    # MXU dots run in the operand dtype (bf16 under AMP — the reference's
    # autocast attention is fp16, `train_sp.py:319`); softmax statistics and
    # the accumulator stay f32. sm_scale is applied to the f32 scores, not
    # the operands, so bf16 inputs lose nothing to the pre-scaling.
    q = q_ref[:]
    q_offset = q_blk * block_q

    num_k_blocks = pl.cdiv(seq_len, block_k)
    # causal: only K blocks with start <= q_end
    max_kb = jnp.minimum(num_k_blocks, (q_offset + block_q + block_k - 1) // block_k)

    def body(kb, _):
        k_off = kb * block_k
        k_tile = k_ref[pl.ds(k_off, block_k), :]
        v_tile = v_ref[pl.ds(k_off, block_k), :]

        s = jnp.dot(q, k_tile.T, preferred_element_type=jnp.float32) * sm_scale

        q_ids = q_offset + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_ids = k_off + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(q_ids >= k_ids, s, NEG_INF)

        m_prev = m_scr[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p.astype(v_tile.dtype), v_tile, preferred_element_type=jnp.float32
        )
        m_scr[:] = m_cur
        return 0

    jax.lax.fori_loop(0, max_kb, body, 0)

    o_ref[:] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, *, block_q=128, block_k=128, interpret=False):
    """Blockwise causal flash attention on TPU.

    q,k,v: (B, H, T, D) with T a multiple of block sizes (pad upstream).
    Softmax statistics kept in VMEM scratch; no T×T materialization, so HBM
    traffic is O(T·D) per head instead of the reference's O(T²).
    """
    B, H, T, D = q.shape
    sm_scale = 1.0 / math.sqrt(D)
    block_q = min(block_q, T)
    block_k = min(block_k, T)
    if T % block_q or T % block_k:
        raise ValueError(
            f"flash_attention: blocks ({block_q},{block_k}) must divide T={T} "
            "(the k-loop has no tail mask); use flash_blocks(T)")

    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, T, D)
    vf = v.reshape(B * H, T, D)

    grid = (B * H, pl.cdiv(T, block_q))

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, sm_scale=sm_scale, seq_len=T
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, T, D)


def flash_blocks(T: int) -> tuple:
    """(block_q, block_k) choices for the flash kernel, per T.

    Note flash only WINS at T >= FLASH_MIN_T = 1024 — see the r4 in-jit
    crossover table above `FLASH_MIN_T` below (dense is faster at T=256
    and T=512; the round-3 numbers that crowned flash at every length
    carried the ~25 ms tunnel-fetch artifact, scripts/attn_bench.py).
    These block sizes only matter when the auto policy or `use_flash`
    actually selects the kernel.

    Blocks must DIVIDE T: the kernel's k-loop reads
    `k_ref[pl.ds(k_off, block_k)]` with no tail mask, so a block that
    overhangs T (e.g. 256 at T=384) reads out of bounds and silently
    corrupts the last K/V tile. `flash_supported` guarantees T % 128 == 0,
    so 128 is always a safe fallback."""
    if T <= 256:
        bq, bk = 128, 128
    elif T <= 512:
        bq, bk = 128, 256
    else:
        bq, bk = 256, 256
    if T % bk:
        bk = 128
    if T % bq:
        bq = 128
    return bq, bk


def flash_supported(T: int, D: int, mask) -> bool:
    return mask is None and T % 128 == 0 and D in (64, 128)


# Crossover measured on v5e with in-jit loops (scripts/attn_bench.py, r4 —
# earlier per-call timings carried a ~25 ms tunnel-fetch artifact and wrongly
# crowned flash at every length): per (B=8,H=12,D=64) attention call,
#   T=256:  dense 0.01/0.04 ms (fwd / fwd+bwd) vs flash 0.18/0.29
#   T=512:  dense 0.08/0.22 vs flash 0.48/0.68
#   T=1024: dense 1.24/3.07 vs flash 1.01/1.74
# Dense's T×T materialization only starts to lose at T≥1024; below that the
# flash kernel's per-program overhead dominates its bandwidth savings.
FLASH_MIN_T = 1024


def causal_attention(q, k, v, *, mask=None, use_flash=False, interpret=False,
                     trainable=False):
    """Dispatch: Pallas flash kernel (opt-in) or dense jnp reference.

    The flash path requires no padding mask and T % block == 0; `use_flash`
    forces flash whenever the shape supports it (callers implementing an
    "auto" policy should gate on FLASH_MIN_T themselves — see
    `models.sp_model.sp_block`). `trainable=True` routes through
    `flash_attention_trainable` (custom-vjp Pallas backward) so the same
    dispatch serves the training forward."""
    T, D = q.shape[2], q.shape[3]
    if use_flash and flash_supported(T, D, mask):
        bq, bk = flash_blocks(T)
        if trainable:
            return flash_attention_trainable(q, k, v, bq, bk, interpret)
        return flash_attention(q, k, v, block_q=bq, block_k=bk,
                               interpret=interpret)
    return causal_attention_reference(q, k, v, mask=mask)


# ---------------------------------------------------------------------------
# Flash attention with custom VJP (training-capable)
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                      acc_scr, *, block_k, sm_scale, seq_len):
    """Forward that also writes the log-sum-exp rows for the backward."""
    q_blk = pl.program_id(1)
    block_q = q_ref.shape[0]

    m_scr[:] = jnp.full_like(m_scr, NEG_INF)
    l_scr[:] = jnp.zeros_like(l_scr)
    acc_scr[:] = jnp.zeros_like(acc_scr)

    # Same AMP convention as _flash_kernel: operand-dtype MXU dots, f32
    # softmax statistics, post-dot sm_scale.
    q = q_ref[:]
    q_offset = q_blk * block_q
    num_k_blocks = pl.cdiv(seq_len, block_k)
    max_kb = jnp.minimum(num_k_blocks,
                         (q_offset + block_q + block_k - 1) // block_k)

    def body(kb, _):
        k_off = kb * block_k
        k_tile = k_ref[pl.ds(k_off, block_k), :]
        v_tile = v_ref[pl.ds(k_off, block_k), :]
        s = jnp.dot(q, k_tile.T, preferred_element_type=jnp.float32) * sm_scale
        q_ids = q_offset + jax.lax.broadcasted_iota(jnp.int32,
                                                    (block_q, block_k), 0)
        k_ids = k_off + jax.lax.broadcasted_iota(jnp.int32,
                                                 (block_q, block_k), 1)
        s = jnp.where(q_ids >= k_ids, s, NEG_INF)
        m_prev = m_scr[:]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_cur)
        alpha = jnp.exp(m_prev - m_cur)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
            p.astype(v_tile.dtype), v_tile, preferred_element_type=jnp.float32)
        m_scr[:] = m_cur
        return 0

    jax.lax.fori_loop(0, max_kb, body, 0)
    l_final = jnp.maximum(l_scr[:], 1e-30)
    o_ref[:] = (acc_scr[:] / l_final).astype(o_ref.dtype)
    lse_ref[:] = m_scr[:] + jnp.log(l_final)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, block_q, sm_scale, seq_len):
    """Backward: one program per (batch*head); loops q and k blocks.

    Standard flash backward: with P = exp(q·kᵀ·scale − lse),
    dV = Pᵀ·dO; dS = P ∘ (dO·Vᵀ − D) where D = rowsum(dO ∘ O);
    dQ = dS·K·scale; dK = dSᵀ·Q·scale.
    """
    T = seq_len
    # operand-dtype (AMP) MXU dots; s/p/ds stay f32. ds is cast to the
    # operand dtype for the dq/dk dots — the fp16-autocast backward the
    # reference's GradScaler serves (`train_sp.py:319,452`).
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    cdt = q.dtype
    o = o_ref[:].astype(jnp.float32)
    lse = lse_ref[:]
    do = do_ref[:]
    do_f = do.astype(jnp.float32)

    D = jnp.sum(do_f * o, axis=1, keepdims=True)  # (T, 1)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    mask = q_ids >= k_ids
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)

    dv = jnp.dot(p.astype(cdt).T, do.astype(cdt),
                 preferred_element_type=jnp.float32)
    dp = jnp.dot(do.astype(cdt), v.T, preferred_element_type=jnp.float32)
    ds = (p * (dp - D)).astype(cdt)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale
    dk = jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * sm_scale

    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_fwd_call(q, k, v, block_q, block_k, interpret):
    B, H, T, D = q.shape
    if T % block_q or T % block_k:
        raise ValueError(
            f"flash_attention_trainable: blocks ({block_q},{block_k}) must "
            f"divide T={T}; use flash_blocks(T)")
    sm_scale = 1.0 / math.sqrt(D)
    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, T, D)
    vf = v.reshape(B * H, T, D)
    grid = (B * H, pl.cdiv(T, block_q))
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=block_k,
                          sm_scale=sm_scale, seq_len=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, T, D), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((None, block_q, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, T, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, T, D), lse.reshape(B, H, T, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_trainable(q, k, v, block_q=128, block_k=128,
                              interpret=False):
    """Causal flash attention with a Pallas backward (training-capable).

    Forward = `flash_attention` + saved log-sum-exp; backward recomputes the
    probability matrix per (batch, head) in one program (T×T in VMEM —
    adequate for GPT-2's T<=1024; block the backward before scaling past
    ~2k sequence lengths).
    """
    out, _ = _flash_fwd_call(q, k, v, min(block_q, q.shape[2]),
                             min(block_k, q.shape[2]), interpret)
    return out


def _flash_train_fwd(q, k, v, block_q, block_k, interpret):
    out, lse = _flash_fwd_call(q, k, v, min(block_q, q.shape[2]),
                               min(block_k, q.shape[2]), interpret)
    return out, (q, k, v, out, lse)


def _flash_train_bwd(block_q, block_k, interpret, res, g):
    q, k, v, out, lse = res
    B, H, T, D = q.shape
    sm_scale = 1.0 / math.sqrt(D)

    def flat(x, d=D):
        return x.reshape(B * H, T, d)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, block_q=min(block_q, T),
                          sm_scale=sm_scale, seq_len=T),
        grid=(B * H,),
        in_specs=[pl.BlockSpec((None, T, D), lambda b: (b, 0, 0))] * 4
        + [pl.BlockSpec((None, T, 1), lambda b: (b, 0, 0)),
           pl.BlockSpec((None, T, D), lambda b: (b, 0, 0))],
        out_specs=tuple(
            pl.BlockSpec((None, T, D), lambda b: (b, 0, 0)) for _ in range(3)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B * H, T, D), q.dtype) for _ in range(3)
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat(v), flat(out), flat(lse, 1), flat(g))

    unflat = lambda x: x.reshape(B, H, T, D)
    return unflat(dq), unflat(dk), unflat(dv)


flash_attention_trainable.defvjp(_flash_train_fwd, _flash_train_bwd)
