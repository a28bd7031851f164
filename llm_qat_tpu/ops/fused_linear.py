"""Fused dequant→matmul(+LoRA) Pallas kernel for the SP *training* forward.

The north-star item (VERDICT r3 #4): the reference's training hot loop is
`SPLinearWithLoRA.forward` — fake-quantize input and weight, F.linear, add a
quantized-LoRA branch (`part1_switchable_precision/lora.py:127-150`, kernels
`quantization_methods.py:5-90`). The r4 device trace (scripts/trace_step.py)
showed the jnp composition spends its time on op-count overhead and
materialized fake-quantized weights, not matmuls; this module collapses the
per-linear chain into one Pallas forward kernel plus two Pallas backward
kernels under `jax.custom_vjp`:

    forward:  out = Q_in(x) @ Q_w(W) + b + s·[(x @ Q(A)) @ Q(B)]
    backward: d_xq  = g @ Q_w(W)ᵀ          (dx STE handled by fake_quant_flat)
              d_xa  = s·(g @ Q(B)ᵀ)
              dW    = STE_w(Q_in(x)ᵀ @ g)   (±10 clamp iff log kind, <32 bits)
              dB,db via XLA dots (small)

Q_w(W) is computed tile-by-tile inside the kernels from the fp32 weight and
its scale bank — the fake-quantized weight is never materialized in HBM.
The input/LoRA quantizations stay outside as one-fusion `fake_quant_flat`
calls whose custom-vjp STE provides the reference backward semantics
(identity for minmax, ±10 clamp for log, passthrough ≥32 bits).

`bits`/`kind` are traced scalars (SMEM operands), so one compiled kernel
serves every precision slot — the framework's recompilation-free
`set_precision` contract extends into the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.calibration import dynamic_scale_flat
from ..quant.functional import KIND_LOG, fake_quant_flat


def fused_linear_supported(x, p, q) -> bool:
    """Shape gate: MXU-aligned dims and a rank the kernel layout handles."""
    if x.ndim < 2:
        return False
    K = x.shape[-1]
    M = 1
    for d in x.shape[:-1]:
        M *= d
    N = p["w"].shape[1]
    r = p["lora_A"].shape[2] if "lora_A" in p else 0
    return (
        M % 256 == 0
        and K % 128 == 0
        and N % 128 == 0
        and (r == 0 or r % 8 == 0)
    )


# ---------------------------------------------------------------------------
# In-kernel fake-quant tile math (flat select; scalars from SMEM)
# ---------------------------------------------------------------------------


def _fq_tile(w, scale, zp, bits, kind, symmetric: bool, eps: float):
    """fake_quant_flat forward math on a VMEM tile (fp32 in/out).

    Mirrors `quant.functional._flat_fwd_math` exactly: minmax
    (`quantization_methods.py:13-20`) and log (`:33-79`) domains computed,
    selected by the scalar `kind`; passthrough at bits >= 32.
    """
    # minmax
    if symmetric:
        qmax = jnp.exp2(bits - 1.0) - 1.0
        q = jnp.clip(jnp.round(w / scale), -qmax, qmax)
        mm = q * scale
    else:
        qmax = jnp.exp2(bits) - 1.0
        q = jnp.clip(jnp.round(w / scale + zp), 0.0, qmax)
        mm = (q - zp) * scale
    # log: scale slot holds log_range, zp slot holds log_min
    log_range, log_min = scale, zp
    zero_mask = jnp.abs(w) < eps
    sign_w = jnp.sign(w)
    log_abs = jnp.log2(jnp.maximum(jnp.abs(w), eps))
    log_norm = jnp.clip((log_abs - log_min) / jnp.maximum(log_range, eps),
                        0.0, 1.0)
    full = jnp.exp2(bits) - 1.0
    if symmetric:
        n_levels = jnp.exp2(bits - 1.0) - 1.0
        qv = jnp.clip(jnp.round((log_norm - 0.5) * 2.0 * n_levels),
                      -n_levels, n_levels)
        q_norm = (qv / (2.0 * n_levels) + 0.5)
    else:
        q_norm = jnp.clip(jnp.round(log_norm * full), 0.0, full) / full
    lg = jnp.where(zero_mask, 0.0,
                   jnp.exp2(q_norm * log_range + log_min) * sign_w)

    out = jnp.where(kind == float(KIND_LOG), lg, mm)
    return jnp.where(bits >= 32.0, w, out)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(scal_ref, xq_ref, xa_ref, w_ref, ws_ref, wz_ref, bq_ref,
                bias_ref, o_ref, *, symmetric, eps, have_lora):
    bits = scal_ref[0, 0]
    kind = scal_ref[0, 1]
    scaling = scal_ref[0, 2]
    wq = _fq_tile(w_ref[:], ws_ref[:], wz_ref[:], bits, kind, symmetric, eps)
    acc = jnp.dot(xq_ref[:], wq.astype(xq_ref.dtype),
                  preferred_element_type=jnp.float32)
    if have_lora:
        acc = acc + scaling * jnp.dot(xa_ref[:], bq_ref[:],
                                      preferred_element_type=jnp.float32)
    o_ref[:] = acc + bias_ref[:]


def _fwd_call(xq, xa, w, ws, wz, bq, bias, scalars, *, symmetric, eps,
              block_m, block_n, interpret):
    M, K = xq.shape
    N = w.shape[1]
    r = xa.shape[1]
    have_lora = r > 0
    if not have_lora:
        xa = jnp.zeros((M, 8), xq.dtype)
        bq = jnp.zeros((8, N), xq.dtype)
        r = 8
    grid = (M // block_m, N // block_n)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, symmetric=symmetric, eps=eps,
                          have_lora=have_lora),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, r), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        interpret=interpret,
    )(scalars, xq, xa, w, ws, wz, bq, bias)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dx_kernel(scal_ref, g_ref, w_ref, ws_ref, wz_ref, bq_ref,
                   dxq_ref, dxa_ref, *, symmetric, eps, have_lora):
    """d_xq[i] = Σ_j g[i,j] @ Q_w(w[:,j])ᵀ ; d_xa[i] = s·Σ_j g[i,j] @ Bqᵀ.

    Grid (nm, nn) with j innermost; output blocks depend only on i and are
    initialized at j == 0, accumulated across j (standard revisiting
    reduction)."""
    j = pl.program_id(1)
    bits = scal_ref[0, 0]
    kind = scal_ref[0, 1]
    scaling = scal_ref[0, 2]

    g = g_ref[:]
    wq = _fq_tile(w_ref[:], ws_ref[:], wz_ref[:], bits, kind, symmetric, eps)
    # (bm, bn) @ (K, bn)ᵀ — contract dim 1 with dim 1
    dxq = jax.lax.dot_general(g, wq.astype(g.dtype),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        dxq_ref[:] = jnp.zeros_like(dxq_ref)
        if have_lora:
            dxa_ref[:] = jnp.zeros_like(dxa_ref)

    dxq_ref[:] += dxq
    if have_lora:
        dxa_ref[:] += scaling * jax.lax.dot_general(
            g, bq_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_dw_kernel(scal_ref, xq_ref, g_ref, dw_ref, *, symmetric, eps):
    """dW[k,j] = STE_w(xq[:,k]ᵀ @ g[:,j]) — contraction over all of M.

    STE_w: gradient clamped to ±10 iff the log kind is active below 32 bits
    (`quantization_methods.py:81-90`); identity otherwise."""
    bits = scal_ref[0, 0]
    kind = scal_ref[0, 1]
    xq = xq_ref[:]
    g = g_ref[:]
    dwq = jax.lax.dot_general(xq, g.astype(xq.dtype),
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    clamp = jnp.logical_and(kind == float(KIND_LOG), bits < 32.0)
    dw_ref[:] = jnp.where(clamp, jnp.clip(dwq, -10.0, 10.0), dwq)


def _bwd_dx_call(g_bf, w, ws, wz, bq, scalars, r, *, symmetric, eps,
                 block_m, block_n, interpret):
    M, N = g_bf.shape
    K = w.shape[0]
    have_lora = r > 0
    rr = r if have_lora else 8
    if not have_lora:
        bq = jnp.zeros((rr, N), g_bf.dtype)
    grid = (M // block_m, N // block_n)
    dxq, dxa = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, symmetric=symmetric, eps=eps,
                          have_lora=have_lora),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rr, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_m, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, rr), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, K), jnp.float32),
            jax.ShapeDtypeStruct((M, rr), jnp.float32),
        ),
        interpret=interpret,
    )(scalars, g_bf, w, ws, wz, bq)
    return dxq, (dxa if have_lora else None)


def _bwd_dw_call(xq, g_bf, scalars, *, symmetric, eps, block_k, block_n,
                 interpret):
    M, K = xq.shape
    N = g_bf.shape[1]
    grid = (K // block_k, N // block_n)
    return pl.pallas_call(
        functools.partial(_bwd_dw_kernel, symmetric=symmetric, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda k, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((M, block_k), lambda k, j: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, block_n), lambda k, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_k, block_n), lambda k, j: (k, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.float32),
        interpret=interpret,
    )(scalars, xq, g_bf)


# ---------------------------------------------------------------------------
# custom_vjp core
# ---------------------------------------------------------------------------


def _pick_blocks(M, K, N):
    """VMEM-bounded block sizes (w tile double-buffered at fp32).

    Blocks must divide M/N (no tail masking in the kernels; the
    `fused_linear_supported` gate guarantees M % 256 == 0, N % 128 == 0)."""
    bm_pref = 512 if K >= 2048 else 1024
    block_m = next(b for b in (bm_pref, 512, 256) if b <= M and M % b == 0)
    block_n = next(b for b in (256, 128) if b <= N and N % b == 0)
    return block_m, block_n


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused_core(xq, xa, bq, bias, w, ws, wz, scalars, symmetric, eps,
                interpret):
    M, K = xq.shape
    N = w.shape[1]
    bm, bn = _pick_blocks(M, K, N)
    return _fwd_call(xq, xa, w, ws, wz, bq, bias, scalars,
                     symmetric=symmetric, eps=eps, block_m=bm, block_n=bn,
                     interpret=interpret)


def _fused_fwd(xq, xa, bq, bias, w, ws, wz, scalars, symmetric, eps,
               interpret):
    out = _fused_core(xq, xa, bq, bias, w, ws, wz, scalars, symmetric, eps,
                      interpret)
    return out, (xq, xa, bq, w, ws, wz, scalars)


def _fused_bwd(symmetric, eps, interpret, res, g):
    xq, xa, bq, w, ws, wz, scalars = res
    M, K = xq.shape
    N = w.shape[1]
    r = xa.shape[1]
    bm, bn = _pick_blocks(M, K, N)
    g_bf = g.astype(xq.dtype)

    # dx output blocks are (bm, K) f32 — at K=3072 a 512-row block plus the
    # double-buffered weight tiles exceeds the 16 MB VMEM budget.
    bm_pref = 256 if K >= 2048 else 512
    bm_dx = next(b for b in (bm_pref, 256) if b <= M and M % b == 0)
    dxq, dxa = _bwd_dx_call(g_bf, w, ws, wz, bq, scalars, r,
                            symmetric=symmetric, eps=eps, block_m=bm_dx,
                            block_n=bn, interpret=interpret)
    # full-M operand tiles are double-buffered; bk=512 keeps xq tiles at
    # 2 MB so the kernel fits VMEM even at M=2048, K=3072.
    bk = next(b for b in (512, 256, 128) if b <= K and K % b == 0)
    dw = _bwd_dw_call(xq, g_bf, scalars, symmetric=symmetric, eps=eps,
                      block_k=bk, block_n=bn, interpret=interpret)

    scaling = scalars[0, 2]
    if r > 0:
        # d_Bq = s·(xaᵀ @ g) with the STE clamp applied by fake_quant_flat
        # upstream (bq is its output); small XLA dot.
        dbq = scaling * jax.lax.dot_general(
            xa, g_bf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxa_out = dxa.astype(xa.dtype)
        dbq = dbq.astype(bq.dtype)
    else:
        dxa_out = jnp.zeros_like(xa)
        dbq = jnp.zeros_like(bq)
    dbias = jnp.sum(g, axis=0, keepdims=True)

    return (
        dxq.astype(xq.dtype),
        dxa_out,
        dbq,
        dbias,
        dw,
        jnp.zeros_like(ws),
        jnp.zeros_like(wz),
        jnp.zeros_like(scalars),
    )


_fused_core.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Public wrapper
# ---------------------------------------------------------------------------


def sp_linear_fused(x, p, prec, bits, kind, scaling, cfg, *,
                    interpret: Optional[bool] = None):
    """Quantized linear + per-bit LoRA through the fused Pallas kernels.

    Drop-in compute for `models.sp_model.sp_linear`'s standard path
    (reference `lora.py:127-150`): input/LoRA fake-quant run as single-fusion
    `fake_quant_flat` ops (their custom-vjp STE supplies the reference
    backward), while the weight fake-quant + matmul + LoRA epilogue execute
    in one Pallas kernel per forward and two per backward, with `Q_w(W)`
    never materialized in HBM.
    """
    q = cfg.quant
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cdt = jnp.dtype(cfg.compute_dtype)

    lead = x.shape[:-1]
    K = x.shape[-1]
    N = p["w"].shape[1]
    x2d = x.reshape(-1, K)

    xq = fake_quant_flat(x2d, p["iq_scale"][prec], p["iq_zp"][prec], bits,
                         kind, q.symmetric, q.eps).astype(cdt)

    r = q.max_rank
    if r > 0:
        A = p["lora_A"][prec]
        B = p["lora_B"][prec]
        ch = 1 if q.per_channel else None
        a_s, a_z = dynamic_scale_flat(A, bits, kind, ch, q.symmetric, q.eps)
        b_s, b_z = dynamic_scale_flat(B, bits, kind, ch, q.symmetric, q.eps)
        Aq = fake_quant_flat(A, a_s, a_z, bits, kind, q.symmetric, q.eps)
        Bq = fake_quant_flat(B, b_s, b_z, bits, kind, q.symmetric, q.eps)
        # raw input feeds LoRA (reference lora.py:149)
        xa = jnp.dot(x2d.astype(cdt), Aq.astype(cdt),
                     preferred_element_type=jnp.float32).astype(cdt)
        bq = Bq.astype(cdt)
    else:
        xa = jnp.zeros((x2d.shape[0], 0), cdt)
        bq = jnp.zeros((0, N), cdt)

    ws = jnp.broadcast_to(
        jnp.asarray(p["wq_scale"][prec], jnp.float32).reshape(1, -1), (1, N))
    wz = jnp.broadcast_to(
        jnp.asarray(p["wq_zp"][prec], jnp.float32).reshape(1, -1), (1, N))
    bias = p["b"].astype(jnp.float32).reshape(1, N)
    scalars = jnp.stack([
        jnp.asarray(bits, jnp.float32),
        jnp.asarray(kind, jnp.float32),
        jnp.asarray(scaling, jnp.float32),
        jnp.zeros((), jnp.float32),
    ]).reshape(1, 4)

    out = _fused_core(xq, xa, bq, bias, p["w"], ws, wz, scalars,
                      q.symmetric, q.eps, interpret)
    return out.reshape(*lead, N)
