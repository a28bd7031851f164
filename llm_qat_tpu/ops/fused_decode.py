"""Fused decode-layer Pallas kernels for the int8 serving path.

Decode at small batch is dominated by per-op overhead: one GPT-2 layer in
the XLA path is ~15 kernels (LN chains, quantize, int8 dot, scale epilogue,
two LoRA dots — x4 linears — plus residual adds and GELU) at ~2-4 us fixed
cost each, ~54 us/layer measured on v5e while the pure HBM traffic is
~19 us (docs/RESULTS_R1.md). These kernels collapse a layer into TWO
pallas_calls around the decode-attention kernel:

  fused_ln_qkv:        h -> LN1 -> int8-quantize -> s8xs8 MXU dot + scale
                       + bias + factored-LoRA epilogue -> qkv
  fused_post_attention: attn -> proj(+LoRA) -> +residual -> LN2 ->
                       fc(+LoRA) -> GELU -> mlp(+LoRA) -> +residual -> h'

Numerics are identical to the XLA `int8_xla` path (same int8 grids, f32
epilogues; verified bit-exact in the proto and by tests). Weight operands
are the same int8 codes + per-out-channel scales as `_int8_dot`
(reference semantics: true-INT8 export, `part1_switchable_precision/
deploy.py:31-34`); the activation scale is the calibrated static per-tensor
minmax-8 scale (== the fake-quant grid).

Only the static-scale minmax path is fused (the bench/deploy configuration);
log-kind or dynamic-scale configs keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import _clamp, _rne


def _ln_f32(x, g, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return g * (x - mean) * jax.lax.rsqrt(var + eps) + b


def _q8(x, xs):
    # _rne/_clamp (not jnp.round/clip): those lower through nested jits that
    # trip the MLIR lowering cache with several pallas kernels in one scan
    return _clamp(_rne(x / xs), -127.0, 127.0).astype(jnp.int8)


def _i8_dot(qx, w_ref, ws_ref, xs, b_ref):
    acc = jax.lax.dot_general(qx, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (xs * ws_ref[:]) + b_ref[:]


def _erf(z):
    """Abramowitz & Stegun 7.1.26 rational erf, max abs err 1.5e-7.

    Pallas TPU has no erf/erfc lowering; this matches XLA's exact-GELU to
    ~f32 ulp level (XLA's own erf is likewise a polynomial)."""
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * za)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-za * za))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _lora(x, a_ref, b_ref):
    xa = jnp.dot(x.astype(a_ref.dtype), a_ref[:],
                 preferred_element_type=jnp.float32)
    return jnp.dot(xa.astype(b_ref.dtype), b_ref[:],
                   preferred_element_type=jnp.float32)


def _qkv_kernel(s_ref, h_ref, g_ref, bln_ref, w_ref, ws_ref, b_ref,
                a_ref, lb_ref, o_ref, *, eps, has_lora):
    hn = _ln_f32(h_ref[:].astype(jnp.float32), g_ref[:], bln_ref[:], eps)
    xs = s_ref[0]
    out = _i8_dot(_q8(hn, xs), w_ref, ws_ref, xs, b_ref)
    if has_lora:
        out = out + _lora(hn, a_ref, lb_ref)
    o_ref[:] = out


def _post_kernel(s_ref, attn_ref, h_ref, g2_ref, b2_ref,
                 wp_ref, wps_ref, bp_ref, pa_ref, pb_ref,
                 wf_ref, wfs_ref, bf_ref, fa_ref, fb_ref,
                 wm_ref, wms_ref, bm_ref, ma_ref, mb_ref,
                 o_ref, *, eps, has_lora):
    attn = attn_ref[:].astype(jnp.float32)
    proj = _i8_dot(_q8(attn, s_ref[0]), wp_ref, wps_ref, s_ref[0], bp_ref)
    if has_lora:
        proj = proj + _lora(attn, pa_ref, pb_ref)
    h1 = h_ref[:].astype(jnp.float32) + proj

    hn = _ln_f32(h1, g2_ref[:], b2_ref[:], eps)
    fc = _i8_dot(_q8(hn, s_ref[1]), wf_ref, wfs_ref, s_ref[1], bf_ref)
    if has_lora:
        fc = fc + _lora(hn, fa_ref, fb_ref)
    g = _gelu_exact(fc)

    mlp = _i8_dot(_q8(g, s_ref[2]), wm_ref, wms_ref, s_ref[2], bm_ref)
    if has_lora:
        mlp = mlp + _lora(g, ma_ref, mb_ref)
    o_ref[:] = h1 + mlp


def _vspec(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM)] * n


def fused_ln_qkv(h, ln_g, ln_b, w_i8, w_s, bias, x_s, lora_a, lora_b, *,
                 eps: float = 1e-5, interpret: bool = False):
    """h (B, d) f32 -> qkv (B, N) f32. lora_a/lora_b may be None.

    Not jit-wrapped: callers are already inside jit, and a nested jit around
    a pallas_call inside lax.scan trips XLA's lowering cache."""
    B, d = h.shape
    N = w_i8.shape[1]
    has_lora = lora_a is not None
    lora_args = ((lora_a, lora_b) if has_lora else
                 (jnp.zeros((d, 8), jnp.bfloat16),
                  jnp.zeros((8, N), jnp.bfloat16)))
    return pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps, has_lora=has_lora),
        out_shape=jax.ShapeDtypeStruct((B, N), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _vspec(8),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(x_s, jnp.float32).reshape(1), h,
      ln_g.reshape(1, d).astype(jnp.float32),
      ln_b.reshape(1, d).astype(jnp.float32),
      w_i8,
      jnp.broadcast_to(w_s.reshape(1, -1), (1, N)).astype(jnp.float32),
      bias.reshape(1, N).astype(jnp.float32), *lora_args)


def fused_post_attention(attn, h, ln2_g, ln2_b, proj, fc, mlp, x_scales, *,
                         eps: float = 1e-5, interpret: bool = False):
    """attn, h (B, d) f32 -> h' (B, d) f32.

    proj/fc/mlp: dicts {"w_i8", "w_s", "b", ("lora_A", "lora_B")}.
    x_scales: (3,) static activation scales for proj/fc/mlp inputs.
    """
    B, d = h.shape
    has_lora = "lora_A" in proj

    def args(lin, n_out):
        base = (lin["w_i8"],
                jnp.broadcast_to(lin["w_s"].reshape(1, -1),
                                 (1, n_out)).astype(jnp.float32),
                lin["b"].reshape(1, n_out).astype(jnp.float32))
        if has_lora:
            return base + (lin["lora_A"], lin["lora_B"])
        n_in = lin["w_i8"].shape[0]
        return base + (jnp.zeros((n_in, 8), jnp.bfloat16),
                       jnp.zeros((8, n_out), jnp.bfloat16))

    d_ff = fc["w_i8"].shape[1]
    return pl.pallas_call(
        functools.partial(_post_kernel, eps=eps, has_lora=has_lora),
        out_shape=jax.ShapeDtypeStruct((B, d), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + _vspec(19),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(jnp.asarray(x_scales, jnp.float32).reshape(3), attn, h,
      ln2_g.reshape(1, d).astype(jnp.float32),
      ln2_b.reshape(1, d).astype(jnp.float32),
      *args(proj, d), *args(fc, d_ff), *args(mlp, d))
