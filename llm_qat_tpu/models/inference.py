"""Inference-optimized SP forward: weights pre-quantized once.

During training, `sp_linear` fake-quantizes weights and LoRA inside every
forward (necessary — they change each step). At inference they are static, so
the reference's per-forward weight fake-quant
(`part1_switchable_precision/lora.py:141-150`) is pure waste: this module
materializes Q(W), Q(A), Q(B) for a fixed precision ONCE
(`quantize_for_inference`) and runs a lighter forward where only the
input-dependent activation quantization remains. Since fake-quant is
idempotent on already-grid-aligned values, the outputs are bit-identical to
the training-path forward at the same precision.

This is the decode hot path: per token it now costs one activation quantize +
one matmul per linear instead of (weight-quant + A-quant + B-quant +
dynamic scale reductions + matmuls).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..quant.functional import (
    KIND_LOG,
    _log_fwd_math,
    _minmax_fwd_math,
    fake_quant,
)
from .config import SPModelConfig
from .sp_model import PrecTables, dynamic_scale, prec_tables, switchable_layernorm


class StaticMeta(NamedTuple):
    """Static (hashable, non-traced) precision metadata for an inference tree.

    Registered as a leaf-free aux via NamedTuple of python ints — jit treats
    ints inside pytrees as traced leaves, so the engine pulls this out of the
    tree before jitting (see InferenceEngine / infer_forward_unrolled)."""

    bits: int
    kind: int


def _static_fake_quant(x, scale, zp, bits: int, kind: int, symmetric: bool,
                       eps: float):
    """Fake-quant with STATIC bits/kind — no lax.cond/switch.

    The traced-dispatch `fake_quant` emits a real XLA conditional per call;
    at inference the precision is fixed, and profiling showed ~48 cond ops
    per decode step costing ~4.5us each. Static specialization lets XLA fuse
    the quantization into its neighbors. No custom_vjp needed (no grads at
    inference).
    """
    if bits >= 32:
        return x
    if kind == KIND_LOG:
        return _log_fwd_math(x, zp, scale, float(bits), symmetric, eps)
    return _minmax_fwd_math(x, scale, zp, float(bits), symmetric)


def _int8_dot(x, w_i8, w_s, x_s=None):
    """x (..., K) float @ dequant(w_i8 (K, N), w_s (N,)) via the int8 MXU path.

    Per-tensor symmetric activation quantization onto the int8 grid, fused by
    XLA into the dot's prologue, s8xs8->s32 `dot_general` on the MXU, scale
    epilogue. This is the deployment numerics of the reference's true-INT8
    export (`part1_switchable_precision/deploy.py:31-34`: per-tensor symmetric
    weight codes; the reference never defines an int8 *runtime*, so the
    activation side follows standard W8A8 quantization). Weight HBM traffic
    halves vs bf16 and the MXU runs at its int8 rate.

    `x_s`: static calibrated scalar scale (minmax-8 grid == int8 grid, so
    a per-tensor-calibrated model quantizes activations *identically* to the
    training-path fake-quant). None → dynamic max|x|/127 per call.
    """
    xf = x.astype(jnp.float32)
    if x_s is None:
        red = tuple(range(xf.ndim - 2, xf.ndim))  # per-tensor over (S?, K)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=red, keepdims=True), 1e-8)
        x_s = amax / 127.0
    qx = jnp.clip(jnp.round(xf / x_s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qx, w_i8, (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (x_s * w_s)  # x_s () or (..., 1, 1)


def _int4_dot(x, w_i4, w_s, x_s, qmax: float = 7.0):
    """x (..., K) float @ dequant(nibble-packed w_i4 (K/2, N)) on the s8 MXU.

    Plane packing along K: byte row k holds code row k in its LOW nibble and
    code row k + K/2 in its HIGH nibble — so the two planes are recovered by
    arithmetic shifts with NO row interleave, and the product is two
    s8xs8->s32 dots over the K-halves of the activation codes:
        acc = qx[:, :K/2] @ lo(p) + qx[:, K/2:] @ hi(p)
    Weight HBM traffic is HALF the int8 path (the decode bottleneck).
    Activations quantize onto the calibrated minmax-`bits` grid (codes in
    ±qmax, stored int8 — exact for the ≤4-bit minmax default,
    `models/config.py::default_quantizer_kind`). The reference's W4 numbers
    (`Report….md:7-13` INT4 row) use this weight grid; it never had a true
    int4 runtime.
    """
    xf = x.astype(jnp.float32)
    qx = jnp.clip(jnp.round(xf / x_s), -qmax, qmax).astype(jnp.int8)
    K2 = w_i4.shape[0]
    wi = w_i4.astype(jnp.int32)
    lo = ((wi << 28) >> 28).astype(jnp.int8)  # sign-extended low nibble
    hi = (wi >> 4).astype(jnp.int8)           # arithmetic: high nibble
    nd = qx.ndim - 1
    acc = jax.lax.dot_general(
        qx[..., :K2], lo, (((nd,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = acc + jax.lax.dot_general(
        qx[..., K2:], hi, (((nd,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (x_s * w_s)


def quantize_for_inference(params, cfg: SPModelConfig, bits: int,
                           dtype=jnp.bfloat16,
                           weight_format: str = "dense",
                           lm_head_int8: bool = False,
                           lm_head_bits: int = None,
                           lora_format: str = "factored") -> Dict[str, Any]:
    """Materialize a single-precision inference param tree.

    Per linear: `w_q` = fake-quant(W) at `bits` (already includes the scale
    grid), `lora_AB` = scaling * Q(A) @ Q(B) folded into one (in, out) matrix
    (valid because the LoRA branch is linear in its weights; the reference
    applies it to the *raw* input, so it cannot be folded into w_q — it stays
    a separate rank-`r`... actually the fold of A@B keeps the separate input:
    out = Q_in(x) @ w_q + x @ (scaling·Aq@Bq), both terms exact).
    LayerNorm banks collapse to the selected precision's gamma/beta.
    """
    q = cfg.quant
    p_idx = q.prec_index(bits)
    tables = prec_tables(q)
    bits_t = tables.bits[p_idx]
    kind_t = tables.kind[p_idx]
    scaling = float(q.scaling_table()[p_idx])

    def conv_linear(lin):
        w = lin["w"]
        wq = fake_quant(w, lin["wq_scale"][:, p_idx][:, None, :],
                        lin["wq_zp"][:, p_idx][:, None, :],
                        bits_t, kind_t, q.symmetric, q.eps)
        out = {
            "b": lin["b"],
            "iq_scale": lin["iq_scale"][:, p_idx],
            "iq_zp": lin["iq_zp"][:, p_idx],
        }
        if weight_format == "int4_xla":
            # nibble-packed W4 deployment format (BASELINE.md north star:
            # INT4+LoRA decode). Exact on the calibrated minmax-4 grid:
            # round(wq/s) recovers codes in ±7; two codes pack per byte with
            # K-halves plane packing (`_int4_dot` doc). Static calibrated
            # activation scale — A4 codes in ±7 ride the same s8 MXU path.
            if not (q.symmetric and q.kind_name(bits) == "minmax"
                    and bits <= 4):
                raise ValueError(
                    "int4_xla needs the symmetric minmax ≤4-bit "
                    f"configuration; got bits={bits} "
                    f"kind={q.kind_name(bits)} symmetric={q.symmetric}")
            ws = lin["wq_scale"][:, p_idx]  # (L, out) or (L,)
            wsb = ws[:, None, :] if ws.ndim == 2 else ws[:, None, None]
            codes = jnp.round(wq / jnp.maximum(wsb, 1e-12)).astype(jnp.int8)
            K = codes.shape[1]
            if K % 2:
                raise ValueError("int4 packing needs an even input dim")
            lo = codes[:, :K // 2]
            hi = codes[:, K // 2:]
            out["w_i4"] = ((lo & 0xF) | (hi << 4)).astype(jnp.int8)
            out["w_s"] = ws
            iq = lin["iq_scale"][:, p_idx]
            out["x_s"] = iq if iq.ndim == 1 else jnp.max(iq, axis=-1)
            # per-layer so tree-wide `a[li]` layer slicing works
            out["qmax"] = jnp.full((wq.shape[0],),
                                   2.0 ** (bits - 1) - 1.0, jnp.float32)
        elif weight_format in ("int8", "int8_xla"):
            # int8 codes + per-out-channel scale; EXACT for minmax-kind
            # precisions (fake-quanted values sit on the int grid), a second
            # 8-bit re-quantization for log-kind (adds ~scale/2 error). Halves
            # weight HBM traffic vs bf16. "int8" runs the Pallas fused
            # dequant-matmul; "int8_xla" runs the s8xs8->s32 MXU dot with
            # dynamic activation quant (`_int8_dot`) — one fused XLA op chain,
            # no per-call kernel dispatch.
            from ..ops.quant_matmul import pack_int8

            is_exact = (q.symmetric and q.kind_name(bits) == "minmax"
                        and bits <= 8)
            if weight_format == "int8_xla" and is_exact:
                # Minmax-symmetric ≤8-bit weights already sit on an integer
                # grid with the calibrated scale: round(wq/s) recovers the
                # exact codes (W4 slot codes live in ±7), so the int8 tree is
                # bit-identical to the fake-quant weights — no re-gridding.
                ws = lin["wq_scale"][:, p_idx]  # (L, out) or (L,)
                wsb = ws[:, None, :] if ws.ndim == 2 else ws[:, None, None]
                codes = jnp.round(wq / jnp.maximum(wsb, 1e-12)).astype(jnp.int8)
                scales = ws
            else:
                codes, scales = jax.vmap(lambda wl: pack_int8(wl, True))(wq)
            key = "w_i8" if weight_format == "int8_xla" else "w_int8"
            out[key] = codes  # (L, in, out) int8
            out["w_s"] = scales  # (L, out) f32
            if (weight_format == "int8_xla" and q.symmetric
                    and q.kind_name(bits) == "minmax"):
                # Calibrated static activation scale: minmax-symmetric-8
                # fake-quant (clip(round(x/s), ±127)·s) IS the int8 grid, so
                # the activation side of `_int8_dot` reproduces the dense
                # path's calibrated quantization exactly (per-tensor mode).
                iq = lin["iq_scale"][:, p_idx]
                out["x_s"] = iq if iq.ndim == 1 else jnp.max(iq, axis=-1)
        else:
            out["w_q"] = wq.astype(dtype)
        if q.max_rank > 0 and scaling > 0.0:
            A = lin["lora_A"][:, p_idx]  # (L, in, r)
            B = lin["lora_B"][:, p_idx]  # (L, r, out)
            ch = 1 if q.per_channel else None
            a_s, a_z = jax.vmap(
                lambda a: dynamic_scale(a, bits_t, kind_t, ch, q.symmetric,
                                        q.eps))(A)
            b_s, b_z = jax.vmap(
                lambda b: dynamic_scale(b, bits_t, kind_t, ch, q.symmetric,
                                        q.eps))(B)
            Aq = fake_quant(A, a_s, a_z, bits_t, kind_t, q.symmetric, q.eps)
            Bq = fake_quant(B, b_s, b_z, bits_t, kind_t, q.symmetric, q.eps)
            if lora_format == "factored":
                # Rank factors, scaling folded into B: x @ Aq @ (scaling·Bq)
                # is the reference LoRA math (`lora.py:45-54`) at ~r/in the
                # HBM traffic of the folded (in, out) matrix — decode is
                # weight-bandwidth-bound, so this wins despite one extra
                # (tiny) matmul per linear.
                out["lora_A"] = Aq.astype(dtype)
                out["lora_B"] = (scaling * Bq).astype(dtype)
                if (q.symmetric and q.kind_name(bits) == "minmax"
                        and bits <= 8):
                    # int8 LoRA codes (r5 decode diet): minmax-symmetric
                    # Aq/Bq sit exactly on the (a_s · ±(2^{b-1}-1)) grid,
                    # so round(Aq/a_s) recovers the codes LOSSLESSLY and
                    # `codes.astype(f32) * scale` reproduces Aq bit-for-
                    # bit. The megakernel streams these at half the bf16
                    # banks' HBM traffic (~28 MB -> 14 MB per decode step
                    # at rank 64; the r4 intercept decomposition priced
                    # the bf16 banks at ~17 µs of the 148 µs fixed cost,
                    # docs/RESULTS_R4.md). B codes carry the raw Bq grid;
                    # the lora scaling (alpha/rank) folds into the scale.
                    out["lora_A_i8"] = jnp.round(
                        Aq / jnp.maximum(a_s, 1e-12)).astype(jnp.int8)
                    out["lora_A_s"] = jnp.asarray(a_s, jnp.float32)
                    out["lora_B_i8"] = jnp.round(
                        Bq / jnp.maximum(b_s, 1e-12)).astype(jnp.int8)
                    out["lora_B_s"] = scaling * jnp.asarray(b_s, jnp.float32)
            else:
                out["lora_AB"] = (scaling * jnp.einsum(
                    "lir,lro->lio", Aq, Bq)).astype(dtype)
        return out

    def conv_ln(ln, stacked=True):
        if stacked:
            return {"g": ln["g"][:, p_idx], "b": ln["b"][:, p_idx]}
        return {"g": ln["g"][p_idx], "b": ln["b"][p_idx]}

    blocks = params["blocks"]
    out = {
        "wte": params["wte"].astype(dtype),
        "wpe": params["wpe"],
        "blocks": {
            "ln1": conv_ln(blocks["ln1"]),
            "ln2": conv_ln(blocks["ln2"]),
            "c_attn": conv_linear(blocks["c_attn"]),
            "attn_proj": conv_linear(blocks["attn_proj"]),
            "c_fc": conv_linear(blocks["c_fc"]),
            "mlp_proj": conv_linear(blocks["mlp_proj"]),
        },
        "ln_f": conv_ln(params["ln_f"], stacked=False),
        # static python values — consumed by the cond-free inference path;
        # stored outside the pytree leaves via StaticMeta below
        "_bits": jnp.float32(bits),
        "_kind": tables.kind[p_idx],
    }
    if lm_head_bits is None and lm_head_int8:
        lm_head_bits = 8
    if lm_head_bits == 4:
        # Nibble-packed int4 vocab projection (r5 decode diet): per-row ±7
        # codes packed in pairs along the CONTRACTION dim d — byte column j
        # holds lane j in the low nibble and lane j + d/2 in the high, so
        # `_lm_head` splits the dot into two s8 MXU dots over the matching
        # activation halves with no lane interleave (same plane packing as
        # `_int4_dot`). Halves the int8 head's 38.6 MB/step stream (the r4
        # intercept decomposition priced the int8 head at ~24 µs,
        # docs/RESULTS_R4.md). Quality cost is measured, not assumed:
        # scripts/kv_quality.py reports teacher-forced PPL with the int4
        # head next to the int8/fp ones.
        wte = params["wte"].astype(jnp.float32)  # (V, d)
        d_ = wte.shape[1]
        if d_ % 2:
            raise ValueError("lm_head_bits=4 needs an even n_embd")
        amax = jnp.maximum(jnp.max(jnp.abs(wte), axis=1), 1e-8)  # (V,)
        out["head_s"] = amax / 7.0
        codes = jnp.clip(jnp.round(wte / out["head_s"][:, None]),
                         -7, 7).astype(jnp.int8)
        out["head_i4"] = ((codes[:, :d_ // 2] & 0xF)
                          | (codes[:, d_ // 2:] << 4)).astype(jnp.int8)
    elif lm_head_bits == 8:
        # Per-vocab-row int8 codes for the weight-tied projection. The SP
        # model's lm_head is NOT a quantized layer in the reference
        # (`models_sp.py:398` plain weight tying), so this is a deployment
        # option beyond the reference's INT8 export; scales factor out of the
        # contraction exactly like the per-out-channel linear scales.
        wte = params["wte"].astype(jnp.float32)  # (V, d)
        amax = jnp.maximum(jnp.max(jnp.abs(wte), axis=1), 1e-8)  # (V,)
        out["head_s"] = amax / 127.0
        out["head_i8"] = jnp.clip(
            jnp.round(wte / out["head_s"][:, None]), -127, 127
        ).astype(jnp.int8)
    elif lm_head_bits is not None:
        raise ValueError(f"lm_head_bits must be 8 or 4; got {lm_head_bits}")
    out["_static"] = StaticMeta(
        bits=int(bits),
        kind=int(np.asarray(tables.kind[p_idx])),
    )
    return out


def _lora_branch(x, lin):
    """LoRA epilogue on the *raw* input (reference `lora.py:141-150`):
    factored x@Aq@(scaling·Bq), or the pre-folded (in, out) matrix."""
    if "lora_A" in lin:
        xa = jnp.dot(x.astype(lin["lora_A"].dtype), lin["lora_A"],
                     preferred_element_type=jnp.float32)
        return jnp.dot(xa.astype(lin["lora_B"].dtype), lin["lora_B"],
                       preferred_element_type=jnp.float32)
    if "lora_AB" in lin:
        return jnp.dot(x.astype(lin["lora_AB"].dtype), lin["lora_AB"],
                       preferred_element_type=jnp.float32)
    return jnp.float32(0.0)


def _infer_linear(x, lin, bits, kind, cfg: SPModelConfig, quantize_input: bool,
                  static: "StaticMeta" = None):
    q = cfg.quant
    if "w_i4" in lin:
        out = _int4_dot(x, lin["w_i4"], lin["w_s"], lin["x_s"],
                        qmax=lin["qmax"]) + lin["b"]
        return out + _lora_branch(x, lin)
    if "w_i8" in lin:
        # int8_xla format: activation quant is the int8 quant fused inside
        # _int8_dot (calibrated static scale when available, else dynamic) —
        # the separate fake-quant would double-quantize.
        out = _int8_dot(x, lin["w_i8"], lin["w_s"],
                        x_s=lin.get("x_s")) + lin["b"]
        return out + _lora_branch(x, lin)
    if quantize_input:
        if static is not None:
            xq = _static_fake_quant(x, lin["iq_scale"], lin["iq_zp"],
                                    static.bits, static.kind, q.symmetric,
                                    q.eps)
        else:
            xq = fake_quant(x, lin["iq_scale"], lin["iq_zp"], bits, kind,
                            q.symmetric, q.eps)
    else:
        xq = x
    if "w_int8" in lin:
        # Pallas fused dequant-matmul on TPU; jnp reference fallback on CPU
        from ..ops.quant_matmul import quant_matmul

        B_, S_, K_ = xq.shape
        out = quant_matmul(
            xq.reshape(B_ * S_, K_).astype(jnp.bfloat16),
            lin["w_int8"], lin["w_s"], bits=8,
        ).reshape(B_, S_, -1) + lin["b"]
        cdt = jnp.bfloat16
    else:
        cdt = lin["w_q"].dtype
        out = jnp.dot(xq.astype(cdt), lin["w_q"],
                      preferred_element_type=jnp.float32) + lin["b"]
    return out + _lora_branch(x, lin)


def _ln(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return (g * (xf - mean) * jax.lax.rsqrt(var + eps) + b).astype(x.dtype)


def init_layer_caches(cfg: SPModelConfig, batch: int, max_len: int,
                      dtype=jnp.bfloat16, kv_bits: int = 16,
                      kv_layout: str = "dense"):
    """Per-layer KV caches as a flat tuple (k0, v0, k1, v1, ...).

    Separate buffers (instead of one stacked (L, ...) array) let XLA alias
    each donated buffer for true in-place `dynamic_update_slice` during the
    decode scan — the stacked layout forced a full-cache copy per step.

    `kv_bits=8` stores int8 codes + per-row scales (`ops/kv_cache.py`) —
    the KV axis of the W-A-KV bit configurations, halving cache HBM
    traffic; any other value keeps dense `dtype` storage.

    `kv_layout="packed"` allocates (B, H, T/P, P·head_dim) rows — P =
    `kv_pack_factor(head_dim)` timesteps per 128-lane row (a <128-lane
    minor dim is otherwise tile-padded to 128 in HBM, multiplying capacity
    and traffic) — and routes decode through the length-aware
    `decode_attention_hbm` Pallas kernel. max_len is rounded up to a
    multiple of 8·P (and at least 128).
    """
    m = cfg.model
    if kv_layout == "packed":
        from ..ops.decode_attention import kv_pack_factor

        P = kv_pack_factor(m.head_dim)
        unit = max(8 * P, 128)
        max_len = ((max_len + unit - 1) // unit) * unit
        shape = (batch, m.n_head, max_len // P, P * m.head_dim)
        return tuple(jnp.zeros(shape, dtype) for _ in range(2 * m.n_layer))
    if kv_bits == 8:
        from ..ops.kv_cache import init_quantized_kv

        return tuple(
            init_quantized_kv(batch, m.n_head, max_len, m.head_dim)
            for _ in range(2 * m.n_layer)
        )
    shape = (batch, m.n_head, max_len, m.head_dim)
    return tuple(jnp.zeros(shape, dtype) for _ in range(2 * m.n_layer))


def _flash_prefill_attn(qh, kh, vh, attn_interpret):
    """Initial-prefill attention via the flash kernel (cache prefix empty,
    so attending the fresh kh/vh IS the full causal attention). Pads the
    sequence to a 128 multiple — padded keys sit at future positions no
    real query attends, padded query rows are sliced off."""
    from ..ops.attention import flash_attention, flash_blocks

    S = qh.shape[2]
    Sp = -(-S // 128) * 128
    if Sp != S:
        pad = ((0, 0), (0, 0), (0, Sp - S), (0, 0))
        qh, kh, vh = (jnp.pad(t, pad) for t in (qh, kh, vh))
    bq, bk = flash_blocks(Sp)
    out = flash_attention(qh, kh, vh, block_q=bq, block_k=bk,
                          interpret=attn_interpret)
    return out[:, :, :S]


def infer_forward_unrolled(iparams, input_ids, cfg: SPModelConfig, caches,
                           length, *, quantize_input: bool = True,
                           static: Optional[StaticMeta] = None,
                           fused_attention: bool = False,
                           fused_linears: bool = False,
                           initial_prefill: bool = False,
                           attn_interpret: bool = False):
    """Decode-optimized forward: python-unrolled layers + tuple caches.

    Unrolling (vs `lax.scan` over stacked layer weights) removes the
    per-layer weight-slice materialization the scan performs on its xs —
    measured 3918 → ~6000 tok/s on v5e for GPT-2 124M INT8 decode.
    Returns (logits, new_caches, new_length).
    """
    m = cfg.model
    iparams = {k: v for k, v in iparams.items() if k != "_static"}
    bits = iparams["_bits"]
    kind = iparams["_kind"]
    from ..ops.decode_attention import kv_pack_factor

    B, S = input_ids.shape
    start = length
    c0 = caches[0]
    kv_pack = kv_pack_factor(m.head_dim)
    packed_kv = (not hasattr(c0, "codes") and kv_pack > 1
                 and c0.shape[-1] == kv_pack * m.head_dim)
    if packed_kv:
        T_max = kv_pack * c0.shape[2]
    else:
        T_max = (c0.codes if hasattr(c0, "codes") else c0).shape[2]

    h = iparams["wte"][input_ids] + iparams["wpe"][
        start + jnp.arange(S)][None].astype(iparams["wte"].dtype)

    new_caches = list(caches)
    blocks = iparams["blocks"]
    for li in range(m.n_layer):
        bp = jax.tree.map(lambda a: a[li], blocks)
        # whole-segment Pallas fusion (decode, int8 weights, static minmax
        # activation scales): LN1+QKV in one kernel, proj..mlp in another —
        # collapses ~15 XLA kernels/layer into 2 + attention
        use_fused = (fused_linears and S == 1
                     and "w_i8" in bp["c_attn"] and "x_s" in bp["c_attn"])
        if use_fused:
            from ..ops.fused_decode import fused_ln_qkv

            h2d = h[:, 0].astype(jnp.float32)
            qkv = fused_ln_qkv(
                h2d, bp["ln1"]["g"], bp["ln1"]["b"], bp["c_attn"]["w_i8"],
                bp["c_attn"]["w_s"], bp["c_attn"]["b"], bp["c_attn"]["x_s"],
                bp["c_attn"].get("lora_A"), bp["c_attn"].get("lora_B"),
                eps=m.layer_norm_epsilon, interpret=attn_interpret)[:, None]
        else:
            hn = _ln(h, bp["ln1"]["g"], bp["ln1"]["b"], m.layer_norm_epsilon)
            qkv = _infer_linear(hn, bp["c_attn"], bits, kind, cfg,
                                quantize_input, static)
        qh, kh, vh = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, S, m.n_head, m.head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qh), heads(kh), heads(vh)
        from ..ops.kv_cache import QuantizedKV

        if isinstance(caches[2 * li], QuantizedKV):
            from ..ops.kv_cache import append_rows, attention_with_quantized_kv

            kc = append_rows(caches[2 * li], kh, start)
            vc = append_rows(caches[2 * li + 1], vh, start)
            new_caches[2 * li], new_caches[2 * li + 1] = kc, vc
            attn = attention_with_quantized_kv(
                qh, kc, vc, start, jnp.asarray(S, jnp.int32),
                m.n_positions)
        elif packed_kv and S == 1:
            # HBM-resident packed caches: 8-sublane RMW append + length-aware
            # block streaming (traffic ~ live prefix, not T_max)
            from ..ops.decode_attention import decode_attention_hbm

            attn_o, kc, vc = decode_attention_hbm(
                qh, kh, vh, caches[2 * li], caches[2 * li + 1], start,
                interpret=attn_interpret)
            new_caches[2 * li], new_caches[2 * li + 1] = kc, vc
            attn = attn_o
        elif packed_kv:
            # prefill into packed caches: pack groups of P timesteps, attend
            # on the unpacked view (a contiguous-dim reshape). Requires
            # P-aligned `start` and S (prompt lengths are padded by callers).
            from ..ops.decode_attention import pack_kv, unpack_kv

            kc = jax.lax.dynamic_update_slice(
                caches[2 * li], pack_kv(kh.astype(c0.dtype)),
                (0, 0, start // kv_pack, 0))
            vc = jax.lax.dynamic_update_slice(
                caches[2 * li + 1], pack_kv(vh.astype(c0.dtype)),
                (0, 0, start // kv_pack, 0))
            new_caches[2 * li], new_caches[2 * li + 1] = kc, vc
            if initial_prefill and S >= 128 and m.head_dim in (64, 128):
                # flash over the fresh K/V — O(S) memory instead of the
                # dense O(S·T_max) score materialization (VERDICT r2 #8)
                attn = _flash_prefill_attn(qh, kh, vh, attn_interpret)
            else:
                k_all = unpack_kv(kc, m.head_dim)
                v_all = unpack_kv(vc, m.head_dim)
                scale = 1.0 / jnp.sqrt(jnp.float32(m.head_dim))
                scores = jnp.einsum(
                    "bhsd,bhtd->bhst", qh, k_all,
                    preferred_element_type=jnp.float32) * scale
                q_pos = start + jax.lax.broadcasted_iota(
                    jnp.int32, (S, T_max), 0)
                k_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T_max), 1)
                scores = jnp.where((k_pos <= q_pos)[None, None], scores,
                                   -1e30)
                probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
                attn = jnp.einsum("bhst,bhtd->bhsd", probs, v_all)
        elif fused_attention and S == 1:
            # fused Pallas kernel: in-place cache row update + attention
            from ..ops.decode_attention import decode_attention

            attn_o, kc, vc = decode_attention(
                qh, kh, vh, caches[2 * li], caches[2 * li + 1], start,
                interpret=attn_interpret)
            new_caches[2 * li], new_caches[2 * li + 1] = kc, vc
            attn = attn_o
        else:
            kc = jax.lax.dynamic_update_slice(
                caches[2 * li], kh.astype(caches[0].dtype), (0, 0, start, 0))
            vc = jax.lax.dynamic_update_slice(
                caches[2 * li + 1], vh.astype(caches[0].dtype),
                (0, 0, start, 0))
            new_caches[2 * li], new_caches[2 * li + 1] = kc, vc

            if initial_prefill and S >= 128 and m.head_dim in (64, 128):
                attn = _flash_prefill_attn(qh, kh, vh, attn_interpret)
            else:
                scale = 1.0 / jnp.sqrt(jnp.float32(m.head_dim))
                scores = jnp.einsum(
                    "bhsd,bhtd->bhst", qh, kc,
                    preferred_element_type=jnp.float32) * scale
                q_pos = start + jax.lax.broadcasted_iota(
                    jnp.int32, (S, T_max), 0)
                k_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T_max), 1)
                scores = jnp.where((k_pos <= q_pos)[None, None], scores,
                                   -1e30)
                probs = jax.nn.softmax(scores, axis=-1).astype(vc.dtype)
                attn = jnp.einsum("bhst,bhtd->bhsd", probs, vc)
        if use_fused:
            from ..ops.fused_decode import fused_post_attention

            attn2d = attn.transpose(0, 2, 1, 3).reshape(B, -1)
            h = fused_post_attention(
                attn2d.astype(jnp.float32), h2d, bp["ln2"]["g"],
                bp["ln2"]["b"], bp["attn_proj"], bp["c_fc"], bp["mlp_proj"],
                jnp.stack([bp["attn_proj"]["x_s"], bp["c_fc"]["x_s"],
                           bp["mlp_proj"]["x_s"]]),
                eps=m.layer_norm_epsilon, interpret=attn_interpret)[:, None]
            continue
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1).astype(h.dtype)
        h = h + _infer_linear(attn, bp["attn_proj"], bits, kind, cfg,
                              quantize_input, static).astype(h.dtype)

        h2 = _ln(h, bp["ln2"]["g"], bp["ln2"]["b"], m.layer_norm_epsilon)
        fc = _infer_linear(h2, bp["c_fc"], bits, kind, cfg, quantize_input,
                           static)
        fc = jax.nn.gelu(fc, approximate=False).astype(h.dtype)
        h = h + _infer_linear(fc, bp["mlp_proj"], bits, kind, cfg,
                              quantize_input, static).astype(h.dtype)

    h = _ln(h, iparams["ln_f"]["g"], iparams["ln_f"]["b"],
            m.layer_norm_epsilon)
    logits = _lm_head(iparams, h)
    return logits, tuple(new_caches), start + S


def _lm_head(iparams, h):
    """Weight-tied LM head over post-ln_f hidden states (B, S, d).

    Uses the int4/int8 vocab projection when the tree was built with
    `lm_head_bits=4/8` (dynamic per-tensor activation scale), else the
    plain tied `wte.T` dot (reference `models_sp.py:398`)."""
    if "head_i4" in iparams:
        hf = h.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(hf), axis=(1, 2), keepdims=True),
                           1e-8)
        xs = amax / 127.0
        qh = jnp.clip(jnp.round(hf / xs), -127, 127).astype(jnp.int8)
        p = iparams["head_i4"]  # (V, d/2) bytes, lane-halves plane packing
        wi = p.astype(jnp.int32)
        lo = ((wi << 28) >> 28).astype(jnp.int8)  # lanes [0, d/2)
        hi = (wi >> 4).astype(jnp.int8)           # lanes [d/2, d)
        d2 = p.shape[1]
        acc = jax.lax.dot_general(
            qh[..., :d2], lo, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + jax.lax.dot_general(
            qh[..., d2:], hi, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (xs[..., :1] * iparams["head_s"])
    if "head_i8" in iparams:
        hf = h.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(hf), axis=(1, 2), keepdims=True),
                           1e-8)
        xs = amax / 127.0
        qh = jnp.clip(jnp.round(hf / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(  # contract d against head_i8 (V, d) dim 1
            qh, iparams["head_i8"], (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (xs[..., :1] * iparams["head_s"])
    return jnp.dot(h, iparams["wte"].T, preferred_element_type=jnp.float32)


def infer_forward_with_cache(iparams, input_ids, cfg: SPModelConfig, cache,
                             *, quantize_input: bool = True):
    """KV-cached forward over the pre-quantized tree (decode hot path).

    Same cache semantics as `generate.forward_with_cache`; returns
    (logits, new_cache).
    """
    from .generate import KVCache

    m = cfg.model
    bits = iparams["_bits"]
    kind = iparams["_kind"]
    B, S = input_ids.shape
    start = cache.length

    h = iparams["wte"][input_ids] + iparams["wpe"][start + jnp.arange(S)][None
                                                                          ].astype(iparams["wte"].dtype)

    def body(carry, xs):
        x = carry
        bp, kc, vc = xs
        hn = _ln(x, bp["ln1"]["g"], bp["ln1"]["b"], m.layer_norm_epsilon)
        qkv = _infer_linear(hn, bp["c_attn"], bits, kind, cfg, quantize_input)
        qh, kh, vh = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, S, m.n_head, m.head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qh), heads(kh), heads(vh)
        k_all = jax.lax.dynamic_update_slice(
            kc, kh.astype(kc.dtype), (0, 0, start, 0))
        v_all = jax.lax.dynamic_update_slice(
            vc, vh.astype(vc.dtype), (0, 0, start, 0))
        T_max = k_all.shape[2]
        scale = 1.0 / jnp.sqrt(jnp.float32(m.head_dim))
        scores = jnp.einsum("bhsd,bhtd->bhst", qh, k_all,
                            preferred_element_type=jnp.float32) * scale
        q_pos = start + jax.lax.broadcasted_iota(jnp.int32, (S, T_max), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T_max), 1)
        valid = k_pos <= q_pos
        scores = jnp.where(valid[None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
        attn = jnp.einsum("bhst,bhtd->bhsd", probs, v_all)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, -1).astype(x.dtype)
        x = x + _infer_linear(attn, bp["attn_proj"], bits, kind, cfg,
                              quantize_input).astype(x.dtype)

        h2 = _ln(x, bp["ln2"]["g"], bp["ln2"]["b"], m.layer_norm_epsilon)
        fc = _infer_linear(h2, bp["c_fc"], bits, kind, cfg, quantize_input)
        fc = jax.nn.gelu(fc, approximate=False).astype(x.dtype)
        x = x + _infer_linear(fc, bp["mlp_proj"], bits, kind, cfg,
                              quantize_input).astype(x.dtype)
        return x, (k_all, v_all)

    h, (k_new, v_new) = jax.lax.scan(
        body, h, (iparams["blocks"], cache.k, cache.v)
    )
    h = _ln(h, iparams["ln_f"]["g"], iparams["ln_f"]["b"],
            m.layer_norm_epsilon)
    logits = jnp.dot(h, iparams["wte"].T,
                     preferred_element_type=jnp.float32)
    return logits, KVCache(k=k_new, v=v_new, length=start + S)


class InferenceEngine:
    """Production serving wrapper over the pre-quantized decode path.

    Replaces the reference's host-looped `generate` (`models_sp.py:460-507`)
    for deployment: fixed-precision pre-quantized weights, per-layer donated
    KV caches, one jitted prefill + one jitted decode scan. Sampling matches
    `models/generate.py` (temperature / top-k / top-p / EOS freeze).
    """

    def __init__(self, params, cfg: SPModelConfig, bits: int,
                 max_batch: int = 8, max_len: int = 1024,
                 dtype=jnp.bfloat16, weight_format: str = "dense",
                 lm_head_int8: bool = False, lm_head_bits: int = None,
                 kv_layout: str = "auto",
                 kv_bits: int = 16, attn_interpret: bool = False,
                 mega_tbp: int = 64, mega_tiles_per_step: int = 4,
                 mega_lora_int8: bool = True):
        from functools import partial

        self.cfg = cfg
        self.bits = bits
        self.max_batch = max_batch
        self.max_len = min(max_len, cfg.model.n_positions)
        self.dtype = dtype
        if kv_layout == "auto":
            # packed caches + the HBM decode kernel need the Mosaic TPU
            # backend; everywhere else keep dense caches (still correct)
            kv_layout = ("packed" if jax.default_backend() == "tpu"
                         else "dense")
        self.kv_layout = kv_layout
        self.iparams = quantize_for_inference(
            params, cfg, bits, dtype, weight_format=weight_format,
            lm_head_int8=lm_head_int8, lm_head_bits=lm_head_bits)
        # static precision meta closed over by the jitted fns (cond-free path)
        static = self.iparams.pop("_static")
        self.static = static

        self.mega = None
        self.kv_bits = kv_bits
        self.mega_tbp = mega_tbp
        # 4 weight tiles per megakernel grid step: 36 fatter steps instead
        # of 144 — per-grid-step fixed cost was the largest non-SOL term
        # (scripts/tpg_bench.py r4: W4KV4 264 -> 236 us/step; 6 regresses
        # on VMEM pressure, int8 weights are stream-bound and indifferent).
        self.mega_tpg = mega_tiles_per_step
        if kv_bits in (8, 4) and kv_layout != "mega":
            raise ValueError(f"kv_bits={kv_bits} requires kv_layout='mega' "
                             "(use init_layer_caches(kv_bits=8) for the "
                             "unfused QuantizedKV path)")
        if kv_bits not in (16, 8, 4):
            raise ValueError(f"kv_bits must be 16, 8 or 4; got {kv_bits}")
        if kv_layout == "mega":
            # whole-model grid-pipelined decode megakernel: ONE Pallas call
            # per token instead of ~100 small XLA kernels (ops/mega_decode.py
            # module doc has the round-1 dispatch-overhead diagnosis)
            from ..ops.mega_decode import pack_mega_weights

            if cfg.model.n_embd % 128:
                raise ValueError(
                    "kv_layout='mega' needs n_embd % 128 == 0 (the kernel "
                    f"tiles (d, d) weight blocks); got {cfg.model.n_embd}")
            self.mega = pack_mega_weights(
                self.iparams, cfg, lora_int8=mega_lora_int8)  # validates fmt
            self._has_lora = "lora_A" in self.iparams["blocks"]["c_attn"]

        @jax.jit
        def _prefill(iparams, ids, caches):
            return infer_forward_unrolled(iparams, ids, cfg, caches,
                                          jnp.int32(0), static=static,
                                          initial_prefill=True,
                                          attn_interpret=attn_interpret)

        @jax.jit
        def _prefill_step(iparams, ids, caches, length0):
            # unaligned-prompt tail: one S=1 step at a traced offset
            return infer_forward_unrolled(iparams, ids, cfg, caches,
                                          length0, static=static,
                                          attn_interpret=attn_interpret)

        @partial(jax.jit, static_argnames=("n_new", "temperature", "top_k",
                                           "top_p", "do_sample",
                                           "eos_token_id"),
                 donate_argnums=(2,))
        def _decode(iparams, logits0, caches, length0, rng, *, n_new,
                    temperature, top_k, top_p, do_sample, eos_token_id):
            # Mirrors `generate`'s loop exactly (sample from the carried
            # logits at the TOP of each step, then run the forward): the
            # emitted tokens are [t_T0, ..., t_{T0+n-1}] with t_T0 drawn from
            # the prefill logits under the SAME sampling settings — the
            # reference samples every token (`models_sp.py:488-491`).
            from .generate import _filter_logits

            def sample(logits, r):
                if not do_sample and top_k is None and top_p is None:
                    return jnp.argmax(logits, axis=-1)
                filt = _filter_logits(logits, temperature, top_k, top_p)
                if do_sample:
                    return jax.random.categorical(r, filt, axis=-1)
                return jnp.argmax(filt, axis=-1)

            def body(carry, xs):
                last_logits, caches, done = carry
                i, r = xs
                tok = sample(last_logits, r)
                if eos_token_id is not None:
                    tok = jnp.where(done, eos_token_id, tok)
                    done = done | (tok == eos_token_id)
                logits, caches, _ = infer_forward_unrolled(
                    iparams, tok[:, None], cfg, caches, length0 + i,
                    static=static, attn_interpret=attn_interpret)
                return (logits[:, -1], caches, done), tok

            B = logits0.shape[0]
            done0 = jnp.zeros((B,), bool)
            rngs = jax.random.split(rng, n_new)
            (_, caches, _), toks = jax.lax.scan(
                body, (logits0, caches, done0), (jnp.arange(n_new), rngs))
            return toks.T, caches

        self._prefill = _prefill
        self._prefill_step = _prefill_step
        self._decode = _decode

        if self.mega is not None:
            from ..ops.mega_decode import mega_decode_step, mega_decode_step_kv8

            m = cfg.model
            has_lora = self._has_lora
            _ca = self.iparams["blocks"]["c_attn"]
            aq_max = (float(np.asarray(_ca["qmax"])[0])
                      if "qmax" in _ca else 127.0)

            @jax.jit
            def _to_mega(caches):
                # dense per-layer (B, H, T, hd) -> stacked head-interleaved
                # row-major (L, B, T, d): row t holds every head's K/V.
                # kv_bits=8/4: additionally per-row int8/int4 quantization
                # (codes + (L, B, T) scales) — the mega KV8/KV4 layout
                # (KV4 packs ±7 nibbles along lane halves, see
                # `ops/mega_decode.py::_mega_kernel_kv8`).
                def conv(c):
                    B_, H_, T_, D_ = c.shape
                    return c.transpose(0, 2, 1, 3).reshape(B_, T_, H_ * D_)

                ks = jnp.stack([conv(c) for c in caches[0::2]])
                vs = jnp.stack([conv(c) for c in caches[1::2]])
                if kv_bits not in (8, 4):
                    return ks, vs
                qmax = 127 if kv_bits == 8 else 7

                def quant(rm):
                    s = jnp.maximum(jnp.max(jnp.abs(
                        rm.astype(jnp.float32)), axis=-1), 1e-8) / qmax
                    codes = jnp.clip(jnp.round(
                        rm.astype(jnp.float32) / s[..., None]),
                        -qmax, qmax).astype(jnp.int8)
                    if kv_bits == 4:
                        d2 = codes.shape[-1] // 2
                        codes = ((codes[..., :d2] & 0xF)
                                 | (codes[..., d2:] << 4))
                    return codes, s

                kc, kscale = quant(ks)
                vc, vscale = quant(vs)
                # scales live (L, T, 128): T on the sublane axis (legal
                # 8-row DMA slices), batch padded to a full lane tile
                # (see _mega_kernel_kv8)
                B_ = kscale.shape[1]

                def lanes(s):
                    return jnp.pad(s.transpose(0, 2, 1),
                                   ((0, 0), (0, 0), (0, 128 - B_)))

                return kc, vc, lanes(kscale), lanes(vscale)

            @partial(jax.jit, static_argnames=("n_new", "temperature",
                                               "top_k", "top_p", "do_sample",
                                               "eos_token_id"),
                     donate_argnums=(3, 4))
            def _decode_mega(iparams, mw, logits0, kc, vc, length0, rng, *,
                             n_new, temperature, top_k, top_p, do_sample,
                             eos_token_id):
                from .generate import _filter_logits

                wte = iparams["wte"]

                def sample(logits, r):
                    if not do_sample and top_k is None and top_p is None:
                        return jnp.argmax(logits, axis=-1)
                    filt = _filter_logits(logits, temperature, top_k, top_p)
                    if do_sample:
                        return jax.random.categorical(r, filt, axis=-1)
                    return jnp.argmax(filt, axis=-1)

                def body(carry, xs):
                    last_logits, kc, vc, done = carry
                    i, r = xs
                    tok = sample(last_logits, r)
                    if eos_token_id is not None:
                        tok = jnp.where(done, eos_token_id, tok)
                        done = done | (tok == eos_token_id)
                    pos = length0 + i
                    h = (wte[tok] + iparams["wpe"][pos][None].astype(
                        wte.dtype)).astype(jnp.float32)
                    h_out, kc, vc = mega_decode_step(
                        h, mw, kc, vc, pos, n_head=m.n_head,
                        head_dim=m.head_dim, has_lora=has_lora,
                        eps=m.layer_norm_epsilon, act_dtype=dtype,
                        aq_max=aq_max, tbp=self.mega_tbp,
                        tiles_per_step=self.mega_tpg,
                        interpret=attn_interpret)
                    hf = _ln(h_out[:, None, :].astype(dtype),
                             iparams["ln_f"]["g"], iparams["ln_f"]["b"],
                             m.layer_norm_epsilon)
                    return (_lm_head(iparams, hf)[:, 0], kc, vc, done), tok

                B = logits0.shape[0]
                done0 = jnp.zeros((B,), bool)
                rngs = jax.random.split(rng, n_new)
                (_, kc, vc, _), toks = jax.lax.scan(
                    body, (logits0, kc, vc, done0),
                    (jnp.arange(n_new), rngs))
                return toks.T, kc, vc

            @partial(jax.jit, static_argnames=("n_new", "temperature",
                                               "top_k", "top_p", "do_sample",
                                               "eos_token_id"),
                     donate_argnums=(3, 4, 5, 6))
            def _decode_mega_kv8(iparams, mw, logits0, kc, vc, ksc, vsc,
                                 length0, rng, *, n_new, temperature, top_k,
                                 top_p, do_sample, eos_token_id):
                from .generate import _filter_logits

                wte = iparams["wte"]

                def sample(logits, r):
                    if not do_sample and top_k is None and top_p is None:
                        return jnp.argmax(logits, axis=-1)
                    filt = _filter_logits(logits, temperature, top_k, top_p)
                    if do_sample:
                        return jax.random.categorical(r, filt, axis=-1)
                    return jnp.argmax(filt, axis=-1)

                def body(carry, xs):
                    last_logits, kc, vc, ksc, vsc, done = carry
                    i, r = xs
                    tok = sample(last_logits, r)
                    if eos_token_id is not None:
                        tok = jnp.where(done, eos_token_id, tok)
                        done = done | (tok == eos_token_id)
                    pos = length0 + i
                    h = (wte[tok] + iparams["wpe"][pos][None].astype(
                        wte.dtype)).astype(jnp.float32)
                    h_out, kc, vc, ksc, vsc = mega_decode_step_kv8(
                        h, mw, kc, vc, ksc, vsc, pos, n_head=m.n_head,
                        head_dim=m.head_dim, has_lora=has_lora,
                        eps=m.layer_norm_epsilon, act_dtype=dtype,
                        aq_max=aq_max, tbp=self.mega_tbp,
                        kv_bits=self.kv_bits,
                        tiles_per_step=self.mega_tpg,
                        interpret=attn_interpret)
                    hf = _ln(h_out[:, None, :].astype(dtype),
                             iparams["ln_f"]["g"], iparams["ln_f"]["b"],
                             m.layer_norm_epsilon)
                    return (_lm_head(iparams, hf)[:, 0], kc, vc, ksc, vsc,
                            done), tok

                B = logits0.shape[0]
                done0 = jnp.zeros((B,), bool)
                rngs = jax.random.split(rng, n_new)
                (_, kc, vc, ksc, vsc, _), toks = jax.lax.scan(
                    body, (logits0, kc, vc, ksc, vsc, done0),
                    (jnp.arange(n_new), rngs))
                return toks.T, kc, vc, ksc, vsc

            self._to_mega = _to_mega
            self._decode_mega = _decode_mega
            self._decode_mega_kv8 = _decode_mega_kv8

    def generate(self, input_ids, max_new_tokens: int = 64, *,
                 temperature: float = 1.0, top_k=None, top_p=None,
                 do_sample: bool = False, eos_token_id=None, rng=None):
        """input_ids (B, T) numpy/jnp → (B, T + max_new_tokens)."""
        input_ids = jnp.asarray(input_ids)
        B, T0 = input_ids.shape
        # Host-side capacity enforcement (NOT an assert: on the megakernel
        # path an append past the cache end is a DMA out of bounds that
        # aborts the whole TPU backend — the `ops/mega_decode.py` pos < T
        # contract). The reference's generate likewise stops at
        # `n_positions` (`models_sp.py:501-505`).
        if B > self.max_batch:
            raise ValueError(f"batch {B} exceeds max_batch={self.max_batch}")
        if T0 + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({T0}) + max_new_tokens ({max_new_tokens}) exceeds "
                f"engine max_len={self.max_len}; shorten the request or "
                f"build the engine with a larger max_len")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if self.kv_layout == "mega":
            # dense-cache prefill (exact same numerics as the dense engine),
            # one conversion to the megakernel's (L, B, T, d) row layout,
            # then the whole-model fused decode scan. Cache length rounded
            # up to a multiple of 32 for the kernel's KV block streaming.
            T_all = -(-min(self.max_len, T0 + max_new_tokens) // 32) * 32
            caches = init_layer_caches(self.cfg, B, T_all, self.dtype,
                                       kv_layout="dense")
            logits, caches, _ = self._prefill(self.iparams, input_ids,
                                              caches)
            if self.kv_bits in (8, 4):
                kc, vc, ksc, vsc = self._to_mega(caches)
                toks, *_ = self._decode_mega_kv8(
                    self.iparams, self.mega, logits[:, -1], kc, vc, ksc,
                    vsc, jnp.int32(T0), rng, n_new=max_new_tokens,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    do_sample=do_sample, eos_token_id=eos_token_id)
            else:
                kc, vc = self._to_mega(caches)
                toks, _, _ = self._decode_mega(
                    self.iparams, self.mega, logits[:, -1], kc, vc,
                    jnp.int32(T0), rng, n_new=max_new_tokens,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    do_sample=do_sample, eos_token_id=eos_token_id)
            return jnp.concatenate([input_ids, toks], axis=1)
        caches = init_layer_caches(self.cfg, B,
                                   min(self.max_len, T0 + max_new_tokens),
                                   self.dtype, kv_layout=self.kv_layout)
        # packed caches require a P-aligned prefill write; process the
        # prompt's unaligned tail one token at a time (S=1 -> HBM kernel)
        if self.kv_layout == "packed":
            from ..ops.decode_attention import kv_pack_factor

            P = kv_pack_factor(self.cfg.model.head_dim)
            T0e = T0 - (T0 % P)
        else:
            T0e = T0
        logits = None
        if T0e > 0:
            logits, caches, _ = self._prefill(
                self.iparams, input_ids[:, :T0e], caches)
        for t in range(T0e, T0):
            logits, caches, _ = self._prefill_step(
                self.iparams, input_ids[:, t:t + 1], caches, jnp.int32(t))
        toks, _ = self._decode(
            self.iparams, logits[:, -1], caches, jnp.int32(T0), rng,
            n_new=max_new_tokens, temperature=temperature, top_k=top_k,
            top_p=top_p, do_sample=do_sample, eos_token_id=eos_token_id)
        return jnp.concatenate([input_ids, toks], axis=1)
