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

# --- raw-lax helpers -------------------------------------------------------
# jnp.round/clip/where and traced // % lower through tiny nested `jit`s
# (closed_call). Several pallas kernels inside one lax.scan body trip XLA's
# MLIR lowering cache on those shared sub-jaxprs (KeyError 'closed_call'),
# so kernels use these jit-free equivalents instead.


def _rne(x):
    """round-half-even (jnp.round semantics) without the nested jit."""
    return jax.lax.round(x, jax.lax.RoundingMethod.TO_NEAREST_EVEN)


def _clamp(x, lo, hi):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def _sel(pred, a, b):
    """jnp.where(pred, a, b) without the nested jit (explicit broadcast)."""
    shape = jnp.broadcast_shapes(pred.shape, jnp.shape(a), jnp.shape(b))
    return jax.lax.select_n(jnp.broadcast_to(pred, shape),
                            jnp.broadcast_to(b, shape),
                            jnp.broadcast_to(a, shape))


def _idiv(a, b):
    """a // b for nonnegative ints without the nested jit."""
    return jax.lax.div(a, b)


def _irem(a, b):
    """a % b for nonnegative ints without the nested jit."""
    return jax.lax.rem(a, b)



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


def _hbm_kernel(pos_ref, q_ref, qm_ref, kn_ref, vn_ref, kc_in, vc_in,
                o_ref, kc, vc, kbuf, vbuf, rmwk, rmwv, sem, rsem,
                *, sm_scale, tbp, D, P):
    """Single program, whole batch, PACKED caches: (BH, T/P, P*D) — P
    timesteps share one 128-lane row (P = 128 // head_dim), so the HBM
    layout is unpadded (Mosaic tile-pads a <128-lane minor dim to 128,
    silently multiplying cache capacity AND traffic in the standard
    (…, T, D) layout). Caches stay HBM-resident (`pltpu.ANY`); attention
    streams the live prefix through VMEM in `tbp`-packed-row blocks with
    double buffering — traffic is ~1x the LIVE prefix instead of XLA's
    ~3x full-T_max (dynamic_update_slice copy read+write + attend read).

    Scores and the weighted-V accumulation run on the MXU in the cache
    dtype (one dot_general each per block, against a lane-group-masked q
    matrix built once) — the VPU lane-masked reductions of the first
    version cost ~2.5x the streamed traffic in compute time. The new
    token's K/V never round-trip through HBM: streamed blocks mask
    strictly `t < pos`, its score/value merge into the online softmax
    from VMEM at the end, and the append RMW (read of the aligned
    8-sublane group, modify, write-back) overlaps the streaming — only
    its read is issued up front, the write happens after the last block
    is consumed. A streamed read of the group being rewritten can see
    old or new bytes; both differ only in the strictly-masked new row."""
    del kc_in, vc_in  # aliased to kc/vc outputs
    pos = pos_ref[0]
    BH = q_ref.shape[0]
    PD = P * D
    cdt = kbuf.dtype
    pp = _idiv(pos, P)  # packed-row index of the new position
    part = _irem(pos, P)

    # 1. kick off the append RMW *read*; modify+write happen after the
    # streamed attention (streamed blocks never need the appended row).
    grp8 = pl.multiple_of(_idiv(pp, 8) * 8, 8)
    sub = _irem(pp, 8)
    rk = pltpu.make_async_copy(kc.at[:, pl.ds(grp8, 8)], rmwk, rsem.at[0])
    rv = pltpu.make_async_copy(vc.at[:, pl.ds(grp8, 8)], rmwv, rsem.at[1])
    rk.start()
    rv.start()

    # blocks cover timesteps [0, pos) strictly: every streamed block has
    # at least one unmasked element (keeps the online-softmax exp finite)
    nblk = _idiv(pos + P * tbp - 1, P * tbp)

    def get_dma(slot, j):
        off = pl.multiple_of(j * tbp, tbp)
        return (
            pltpu.make_async_copy(kc.at[:, pl.ds(off, tbp)],
                                  kbuf.at[slot], sem.at[0, slot]),
            pltpu.make_async_copy(vc.at[:, pl.ds(off, tbp)],
                                  vbuf.at[slot], sem.at[1, slot]),
        )

    @pl.when(nblk > 0)
    def _():
        k0, v0 = get_dma(0, 0)
        k0.start()
        v0.start()

    # Qm (BH, P, PD): row i holds sm_scale·q in lane-group i, zero
    # elsewhere — built by the wrapper in XLA (a fused broadcast+mask).
    q = q_ref[:].astype(jnp.float32) * sm_scale  # (BH, 1, D)
    Qm = qm_ref[:]  # (BH, P, PD) cache dtype
    # f32 caches (tests / quality mode) need the 6-pass MXU f32 path —
    # the default one-pass bf16 dot loses ~1e-3; bf16 caches are exact
    # at DEFAULT (bf16 multiply, f32 accumulate).
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def body(j, carry):
        m, l, acc = carry
        slot = _irem(j, 2)

        @pl.when(j + 1 < nblk)
        def _():
            kn_, vn_ = get_dma(_irem(j + 1, 2), j + 1)
            kn_.start()
            vn_.start()

        kj, vj = get_dma(slot, j)
        kj.wait()
        vj.wait()
        kb = kbuf[slot]  # (BH, tbp, P*D) cache dtype
        # scores live as (BH, P, tbp) — tbp on lanes; the (…, tbp, P)
        # orientation lane-pads P=2 to 128 and blows the VMEM stack
        s = jax.lax.dot_general(  # MXU
            Qm, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        i2 = jax.lax.broadcasted_iota(jnp.int32, (1, P, tbp), 1)
        u2 = jax.lax.broadcasted_iota(jnp.int32, (1, P, tbp), 2) + j * tbp
        s = _sel(u2 * P + i2 < pos, s, NEG_INF)
        blk_max = jnp.max(jnp.max(s, axis=2), axis=1, keepdims=True)
        m_new = jnp.maximum(m, blk_max)  # (BH, 1)
        pbl = jnp.exp(s - m_new[:, :, None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(jnp.sum(pbl, axis=2), axis=1,
                                   keepdims=True)
        vb = vbuf[slot]
        pv = jax.lax.dot_general(  # MXU: (BH, P, P*D) weighted V
            pbl.astype(cdt), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        acc_new = acc * corr[:, :, None] + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((BH, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BH, 1), jnp.float32)
    a0 = jnp.zeros((BH, P, PD), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, a0))

    # merge the new token from VMEM (its stored-dtype K/V, never streamed)
    kn = kn_ref[:].astype(jnp.float32)  # (BH, 1, D)
    s_new = jnp.sum(q * kn, axis=-1)  # (BH, 1); q is pre-scaled
    m_f = jnp.maximum(m, s_new)
    corr = jnp.exp(m - m_f)
    p_new = jnp.exp(s_new - m_f)
    l_f = l * corr + p_new
    out = acc[:, 0, :D]
    for i in range(1, P):
        out = out + acc[:, i, i * D:(i + 1) * D]
    out = (out * corr
           + p_new * vn_ref[:][:, 0].astype(jnp.float32))
    out = out / jnp.maximum(l_f, 1e-30)
    o_ref[:] = out[:, None, :].astype(o_ref.dtype)

    # 2. complete the overlapped append RMW
    rk.wait()
    rv.wait()
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 8, PD), 1)
    lane_part = jax.lax.broadcasted_iota(jnp.int32, (1, 8, PD), 2)
    lane_part = jnp.minimum(_idiv(lane_part,
                                  jnp.full_like(lane_part, D)), P - 1)
    sel = (sub_ids == sub) & (lane_part == part)
    knP = jnp.concatenate([kn_ref[:]] * P, axis=-1)  # (BH, 1, P*D)
    vnP = jnp.concatenate([vn_ref[:]] * P, axis=-1)
    rmwk[:] = _sel(sel, knP, rmwk[:])
    rmwv[:] = _sel(sel, vnP, rmwv[:])
    wk = pltpu.make_async_copy(rmwk, kc.at[:, pl.ds(grp8, 8)], rsem.at[0])
    wv = pltpu.make_async_copy(rmwv, vc.at[:, pl.ds(grp8, 8)], rsem.at[1])
    wk.start()
    wv.start()
    wk.wait()
    wv.wait()


def kv_pack_factor(head_dim: int) -> int:
    """Timesteps per 128-lane packed row (1 if head_dim doesn't divide 128)."""
    return 128 // head_dim if 128 % head_dim == 0 and head_dim < 128 else 1


def pack_kv(x):
    """(B, H, S, D) -> packed (B, H, S/P, P*D), P = kv_pack_factor(D):
    timesteps P*u..P*u+P-1 share one row in lane groups. Contiguous-dim
    merge — a bitcast-level reshape."""
    B, H, S, D = x.shape
    P = kv_pack_factor(D)
    assert S % P == 0
    return x.reshape(B, H, S // P, P * D)


def unpack_kv(x, head_dim: int = 64):
    """Packed (B, H, Tp, P*D) -> (B, H, P*Tp, D)."""
    B, H, Tp, PD = x.shape
    assert PD % head_dim == 0
    return x.reshape(B, H, (PD // head_dim) * Tp, head_dim)


def decode_attention_hbm(q, k_new, v_new, k_cache, v_cache, pos, *,
                         tbp: int = 32, interpret: bool = False):
    """Length-aware fused decode attention with HBM-resident PACKED caches.

    q/k_new/v_new: (B, H, 1, D); k_cache/v_cache PACKED (B, H, T/P, P*D)
    (see `pack_kv`; P = kv_pack_factor(D)) and DONATED by the caller's jit;
    (T/P) % tbp == 0; `pos` a SCALAR int32 (uniform position — the per-slot
    variant is `decode_attention`). The packed layout keeps rows at full
    128 lanes (Mosaic tile-pads a narrower minor dim, multiplying capacity
    + traffic), and cache HBM traffic per call is one 8-sublane RMW +
    ~(pos+1) live rows read, independent of T_max. Returns
    (out (B, H, 1, D) f32, k_cache, v_cache packed).
    """
    B, H, _, D = q.shape
    P = kv_pack_factor(D)
    Tp = k_cache.shape[2]
    assert k_cache.shape[3] == P * D
    tbp = min(tbp, Tp)
    while Tp % tbp and tbp > 8:  # largest 8-multiple block dividing Tp
        tbp -= 8
    assert Tp % tbp == 0 and tbp % 8 == 0, (Tp, tbp)
    sm_scale = 1.0 / math.sqrt(D)
    BH = B * H

    cdt = k_cache.dtype
    pos1 = jnp.asarray(pos, jnp.int32).reshape(1)

    # Qm (BH, P, PD): row i = sm_scale·q in lane-group i, zero elsewhere.
    # Built here (XLA fuses the broadcast+mask) so the kernel's score
    # dot_general needs no in-kernel transpose or select.
    qf = q.reshape(BH, 1, D).astype(jnp.float32) * sm_scale
    qP = jnp.concatenate([qf] * P, axis=-1)  # (BH, 1, PD)
    grp = jnp.minimum(jnp.arange(P * D) // D, P - 1)
    gsel = grp[None, None, :] == jnp.arange(P)[None, :, None]
    qm = jnp.where(gsel, qP, 0.0).astype(cdt)  # (BH, P, PD)

    out, kc, vc = pl.pallas_call(
        functools.partial(_hbm_kernel, sm_scale=sm_scale, tbp=tbp, D=D, P=P),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, P * D), cdt),
            jax.ShapeDtypeStruct((BH, Tp, P * D), cdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BH, tbp, P * D), cdt),
            pltpu.VMEM((2, BH, tbp, P * D), cdt),
            pltpu.VMEM((BH, 8, P * D), cdt),
            pltpu.VMEM((BH, 8, P * D), cdt),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(pos1, q.reshape(BH, 1, D), qm,
      k_new.astype(cdt).reshape(BH, 1, D),
      v_new.astype(cdt).reshape(BH, 1, D),
      k_cache.reshape(BH, Tp, P * D), v_cache.reshape(BH, Tp, P * D))

    return (out.reshape(B, H, 1, D), kc.reshape(B, H, Tp, P * D),
            vc.reshape(B, H, Tp, P * D))


def _hbm_kernel_multi(pos_ref, maxpos_ref, q_ref, qm_ref, kn_ref, vn_ref,
                      posv_ref, kc_in, vc_in,
                      o_ref, kc, vc, kbuf, vbuf, rmwk, rmwv, sem, rsem,
                      *, sm_scale, tbp, D, P, H):
    """Per-slot-position variant of `_hbm_kernel` (continuous batching).

    pos_ref: (B,) SMEM per-slot positions, -1 = inactive slot (no cache
    write; its output lane is finite garbage the host ignores).
    maxpos_ref: (1,) SMEM max(pos) — sets the streamed block count.
    posv_ref: (BH, 1) VMEM copy of positions for the vector masks.

    Same structure as `_hbm_kernel`: MXU score/V dots in the cache dtype,
    streamed blocks mask strictly `t < pos[slot]`, the new token merges
    from VMEM, and the per-slot append RMWs overlap the streaming — all
    active slots' group reads are issued up front (per-slot buffers and
    semaphores), the modify+write-back happens after the last block.

    A slot whose live prefix is empty (pos <= 0) accumulates exp(0)
    garbage in blocks it fully masks (its row max stays NEG_INF), but
    the final merge's exp(m - m_f) correction is exactly 0 for such
    rows, so active pos==0 slots still return exactly v_new."""
    del kc_in, vc_in  # aliased to kc/vc outputs
    BH = q_ref.shape[0]
    B = BH // H
    PD = P * D
    cdt = kbuf.dtype

    # 1. kick off every active slot's append-RMW *read*
    reads = []
    for b in range(B):
        pos_b = pos_ref[b]
        pp = _idiv(pos_b, P)
        grp8 = pl.multiple_of(_idiv(pp, 8) * 8, 8)
        rk = pltpu.make_async_copy(
            kc.at[pl.ds(b * H, H), pl.ds(grp8, 8)], rmwk.at[b],
            rsem.at[b, 0])
        rv = pltpu.make_async_copy(
            vc.at[pl.ds(b * H, H), pl.ds(grp8, 8)], rmwv.at[b],
            rsem.at[b, 1])
        reads.append((rk, rv))

        @pl.when(pos_b >= 0)
        def _(rk=rk, rv=rv):
            rk.start()
            rv.start()

    max_pos = jnp.maximum(maxpos_ref[0], 0)
    # strict `t < pos` masking: blocks cover timesteps [0, max_pos)
    nblk = _idiv(max_pos + P * tbp - 1, P * tbp)

    def get_dma(slot, j):
        off = pl.multiple_of(j * tbp, tbp)
        return (
            pltpu.make_async_copy(kc.at[:, pl.ds(off, tbp)],
                                  kbuf.at[slot], sem.at[0, slot]),
            pltpu.make_async_copy(vc.at[:, pl.ds(off, tbp)],
                                  vbuf.at[slot], sem.at[1, slot]),
        )

    @pl.when(nblk > 0)
    def _():
        k0, v0 = get_dma(0, 0)
        k0.start()
        v0.start()

    q = q_ref[:].astype(jnp.float32) * sm_scale  # (BH, 1, D)
    Qm = qm_ref[:]  # (BH, P, PD) cache dtype (wrapper-built)
    pos_col = posv_ref[:]  # (BH, 1) int32
    prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def body(j, carry):
        m, l, acc = carry
        slot = _irem(j, 2)

        @pl.when(j + 1 < nblk)
        def _():
            kn_, vn_ = get_dma(_irem(j + 1, 2), j + 1)
            kn_.start()
            vn_.start()

        kj, vj = get_dma(slot, j)
        kj.wait()
        vj.wait()
        kb = kbuf[slot]  # (BH, tbp, P*D) cache dtype
        s = jax.lax.dot_general(  # MXU: (BH, P, tbp)
            Qm, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        i2 = jax.lax.broadcasted_iota(jnp.int32, (1, P, tbp), 1)
        u2 = jax.lax.broadcasted_iota(jnp.int32, (1, P, tbp), 2) + j * tbp
        s = _sel(u2 * P + i2 < pos_col[:, :, None], s, NEG_INF)
        blk_max = jnp.max(jnp.max(s, axis=2), axis=1, keepdims=True)
        m_new = jnp.maximum(m, blk_max)  # (BH, 1)
        pbl = jnp.exp(s - m_new[:, :, None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(jnp.sum(pbl, axis=2), axis=1,
                                   keepdims=True)
        vb = vbuf[slot]
        pv = jax.lax.dot_general(  # MXU: (BH, P, P*D)
            pbl.astype(cdt), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        acc_new = acc * corr[:, :, None] + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((BH, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BH, 1), jnp.float32)
    a0 = jnp.zeros((BH, P, PD), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, a0))

    # merge the new token from VMEM (identical for every slot; inactive
    # slots produce finite garbage the host ignores)
    kn = kn_ref[:].astype(jnp.float32)  # (BH, 1, D)
    s_new = jnp.sum(q * kn, axis=-1)  # (BH, 1); q pre-scaled
    m_f = jnp.maximum(m, s_new)
    corr = jnp.exp(m - m_f)
    p_new = jnp.exp(s_new - m_f)
    l_f = l * corr + p_new
    out = acc[:, 0, :D]
    for i in range(1, P):
        out = out + acc[:, i, i * D:(i + 1) * D]
    out = (out * corr
           + p_new * vn_ref[:][:, 0].astype(jnp.float32))
    out = out / jnp.maximum(l_f, 1e-30)
    o_ref[:] = out[:, None, :].astype(o_ref.dtype)

    # 2. complete the overlapped per-slot append RMWs
    for b in range(B):
        pos_b = pos_ref[b]
        rk, rv = reads[b]

        @pl.when(pos_b >= 0)
        def _(b=b, pos_b=pos_b, rk=rk, rv=rv):
            pp = _idiv(pos_b, P)
            part = _irem(pos_b, P)
            grp8 = pl.multiple_of(_idiv(pp, 8) * 8, 8)
            sub = _irem(pp, 8)
            rk.wait()
            rv.wait()
            sub_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 8, PD), 1)
            lane_part = jax.lax.broadcasted_iota(jnp.int32, (1, 8, PD), 2)
            lane_part = jnp.minimum(
                _idiv(lane_part, jnp.full_like(lane_part, D)), P - 1)
            sel = (sub_ids == sub) & (lane_part == part)
            knP = jnp.concatenate([kn_ref[b * H:(b + 1) * H]] * P, axis=-1)
            vnP = jnp.concatenate([vn_ref[b * H:(b + 1) * H]] * P, axis=-1)
            rmwk[b] = _sel(sel, knP, rmwk[b])
            rmwv[b] = _sel(sel, vnP, rmwv[b])
            wk = pltpu.make_async_copy(
                rmwk.at[b], kc.at[pl.ds(b * H, H), pl.ds(grp8, 8)],
                rsem.at[b, 0])
            wv = pltpu.make_async_copy(
                rmwv.at[b], vc.at[pl.ds(b * H, H), pl.ds(grp8, 8)],
                rsem.at[b, 1])
            wk.start()
            wv.start()
            wk.wait()
            wv.wait()


def decode_attention_hbm_multi(q, k_new, v_new, k_cache, v_cache, pos, *,
                               tbp: int = 32, interpret: bool = False):
    """Per-slot-position packed-cache decode attention (continuous batching).

    Same layout/traffic as `decode_attention_hbm`, but `pos` is (B,) int32
    with -1 marking an inactive slot: no cache write happens for it and its
    output row is unspecified (finite). Streamed blocks cover max(pos).
    """
    B, H, _, D = q.shape
    P = kv_pack_factor(D)
    Tp = k_cache.shape[2]
    assert k_cache.shape[3] == P * D
    tbp = min(tbp, Tp)
    while Tp % tbp and tbp > 8:
        tbp -= 8
    assert Tp % tbp == 0 and tbp % 8 == 0, (Tp, tbp)
    sm_scale = 1.0 / math.sqrt(D)
    BH = B * H

    cdt = k_cache.dtype
    pos = jnp.asarray(pos, jnp.int32).reshape(B)
    maxpos = jnp.max(pos).reshape(1)
    pos_bh = jnp.repeat(pos, H).reshape(BH, 1)

    # Qm (BH, P, PD): row i = sm_scale·q in lane-group i (see _hbm_kernel)
    qf = q.reshape(BH, 1, D).astype(jnp.float32) * sm_scale
    qP = jnp.concatenate([qf] * P, axis=-1)  # (BH, 1, PD)
    grp = jnp.minimum(jnp.arange(P * D) // D, P - 1)
    gsel = grp[None, None, :] == jnp.arange(P)[None, :, None]
    qm = jnp.where(gsel, qP, 0.0).astype(cdt)  # (BH, P, PD)

    out, kc, vc = pl.pallas_call(
        functools.partial(_hbm_kernel_multi, sm_scale=sm_scale, tbp=tbp,
                          D=D, P=P, H=H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BH, 1, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, Tp, P * D), cdt),
            jax.ShapeDtypeStruct((BH, Tp, P * D), cdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, BH, tbp, P * D), cdt),
            pltpu.VMEM((2, BH, tbp, P * D), cdt),
            pltpu.VMEM((B, H, 8, P * D), cdt),
            pltpu.VMEM((B, H, 8, P * D), cdt),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((B, 2)),
        ],
        input_output_aliases={7: 1, 8: 2},
        interpret=interpret,
    )(pos, maxpos, q.reshape(BH, 1, D), qm,
      k_new.astype(cdt).reshape(BH, 1, D),
      v_new.astype(cdt).reshape(BH, 1, D), pos_bh,
      k_cache.reshape(BH, Tp, P * D), v_cache.reshape(BH, Tp, P * D))

    return (out.reshape(B, H, 1, D), kc.reshape(B, H, Tp, P * D),
            vc.reshape(B, H, Tp, P * D))


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
