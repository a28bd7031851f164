"""Whole-model fused decode step: all transformer layers in ONE Pallas call.

Round-1 profiling (docs/RESULTS_R1.md) left the int8 decode path at
~0.71 ms/step vs a ~0.27 ms HBM speed-of-light: the remaining gap is the
fixed cost of ~100 small XLA kernels per step (4 linears x 12 layers of
LN/quantize/dot/scale/LoRA chains). Fusing a layer into 2-3 Pallas calls
made it *slower* (`ops/fused_decode.py`) because separate pallas_calls
serialize their weight loads — the fix is grid-pipelined weight streaming:

  * every per-layer weight matrix is cut into uniform (d, d) int8 tiles —
    qkv (d,3d) -> 3 out-tiles, attn-proj (d,d) -> 1, fc (d,4d) -> 4
    out-tiles, mlp-proj (4d,d) -> 4 in-tiles (partial-sum) = 12 tiles/layer
  * ONE pallas_call with grid (n_layer, 12) processes one tile per grid
    step; Mosaic's automatic pipelining double-buffers the next tile's DMA
    under the current step's compute, so weight streaming never stalls
    behind compute (and vice versa) across the whole model
  * the KV caches for ALL layers stay HBM-resident (`pltpu.ANY`), stacked
    in a HEAD-INTERLEAVED row layout (L, B, T, d): row t holds every
    head's K (or V) for that timestep across the full d=H*head_dim lanes —
    naturally unpadded (d is a multiple of 128) and writable directly from
    the qkv projection with no transpose. The attention for layer l runs
    inside grid step (l, 3): live-prefix double-buffered streaming + an
    8-sublane append RMW (as `decode_attention_hbm`), with per-head score/
    value math done entirely by batched MXU dots against a constant one-hot
    head mask (H, d) — Mosaic supports no (B, d)->(B*H, D) reshape, and
    this layout never needs one
  * the hidden state h lives in the (revisited) output block across all
    grid steps; LoRA A/B factors, biases, scales and LN banks are tiled
    per (layer, tile) so no in-kernel dynamic lane slicing is needed

Numerics follow the `int8_xla` serving path (`models/inference.py::
_int8_dot`): static calibrated per-tensor activation scales (the minmax-8
fake-quant grid, reference `part3_eval_sp/main_sp_eval.py:60` per-tensor eval
mode), s8xs8->s32 MXU dots, f32 epilogues, bf16 factored LoRA on the
pre-quantization input (reference LoRA math `part1_switchable_precision/
lora.py:45-54`). The mlp-proj partial sums accumulate in int32, so the
4-tile split is bit-identical to the single big s32 dot. Two knowingly
inexact points vs the unfused path: GELU uses the A&S 7.1.26 rational erf
(Pallas TPU lowers no erf; max abs err ~1.5e-7) and the mlp LoRA x@A sums
four f32 chunk-dots — either can in principle flip a bf16 rounding / int8
code on adversarial values, so parity is "equal in practice on tested
trees" (the interpret-mode suites assert exact equality and pass), not a
mathematical bit-exactness guarantee.

The reference has no decode runtime at all (it re-runs the full prefix per
token, `part1_switchable_precision/models_sp.py:460-507`); this kernel is
the TPU-native replacement's hot path.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_attention import _clamp, _idiv, _irem, _rne, _sel

NEG_INF = -1e30
N_TILES = 12  # 3 qkv + 1 attn-proj + 4 fc + 4 mlp-proj partials
I4_UNPACK = "i32"  # Mosaic (v5e, jax 0.9) cannot legalize arith.shli on
# int8 vectors, so the nibble unpack must widen to i32 first ("i8" kept
# for interpret-mode experiments only)


class MegaWeights(NamedTuple):
    """Stacked per-(layer, tile) operand banks for the megakernel.

    LoRA bank layout follows the module-level `LORA_BANKS` switch: "full"
    (default) stores one A and one B tile per grid step — zeros where the
    step uses none — with identity index maps; "compact" stores only the
    read tiles (A 7, B 9 entries) behind refetch-eliding index maps, which
    measured SLOWER on v5e (see the LORA_BANKS note)."""

    wt: jax.Array      # (L, 12, d, d) int8 tiles — or (L, 12, d/2, d)
    #                    nibble-packed int4 tiles (K-halves plane packing,
    #                    `models/inference.py::_int4_dot` layout, per tile)
    ws: jax.Array      # (L, 12, 1, d) f32 per-out-channel dequant scales
    bias: jax.Array    # (L, 12, 1, d) f32 (mlp bias only on tile 11)
    at: jax.Array      # (L, 12|7, d, r) LoRA A bank (see LORA_BANKS) —
    #                    bf16/f32 values, or int8 codes (r5 decode diet:
    #                    half the bank HBM traffic; per-tile SCALAR scales
    #                    ride in SMEM and apply to the dot OUTPUT, so the
    #                    only in-kernel work added is the int8->bf16 tile
    #                    cast — requires per-tensor LoRA quantization,
    #                    which is the deployment configuration)
    bt: jax.Array      # (L, 12|9, r, d) LoRA B bank (scaling folded in —
    #                    into the values when float, into bt_s when int8)
    at_s: jax.Array    # (L, 12|7) f32 per-tile scalar A dequant scales
    #                    (SMEM operand; ones when `at` is float — unused)
    bt_s: jax.Array    # (L, 12|9) f32 per-tile scalar B dequant scales
    ln: jax.Array      # (L, 4, d) f32: ln1_g, ln1_b, ln2_g, ln2_b
    xs: jax.Array      # (L, 4) f32 static activation scales (qkv,proj,fc,mlp)


# tile t -> compact bank index; repeats (= no refetch) where the tile is
# unused at step t. A is read at t=0 (qkv), 3 (proj), 4 (fc), 8..11 (mlp
# row-chunks); B at t=0..2 (qkv col-slices), 3 (proj), 4..7 (fc), 11 (mlp).
_AT_MAP = (0, 0, 0, 1, 2, 2, 2, 2, 3, 4, 5, 6)
_BT_MAP = (0, 1, 2, 3, 4, 5, 6, 7, 7, 7, 7, 8)


LORA_BANKS = "full"  # "full" (12-entry zero-padded banks, identity map)
#                      | "compact" (7/9-entry banks, refetch-eliding maps)
# Measured (same-run, W8KV8 tbp32, v5e): full 416 us/step vs compact 473 —
# the dynamic (where-chain) index maps defeat Mosaic's static prefetch
# analysis and cost far more than the ~9 MB/step of dead-tile traffic they
# save. Keep "full" unless Mosaic learns to elide data-dependent refetches.


def _at_idx(t):
    # scalar-arithmetic form of _AT_MAP (index maps may not capture arrays)
    if LORA_BANKS == "full":
        return t
    return jnp.where(t < 3, 0, jnp.where(t == 3, 1,
                     jnp.where(t < 8, 2, t - 5)))


def _bt_idx(t):
    # scalar-arithmetic form of _BT_MAP
    if LORA_BANKS == "full":
        return t
    return jnp.where(t < 8, t, jnp.where(t < 11, 7, 8))


def pack_mega_weights(iparams: Dict[str, Any], cfg,
                      lora_int8: bool = True) -> MegaWeights:
    """Build the tiled operand banks from an `int8_xla` or `int4_xla` tree.

    Requires `quantize_for_inference(..., weight_format="int8_xla")` (or
    "int4_xla") output with static activation scales (`x_s`) on every
    linear — i.e. the symmetric-minmax per-tensor deployment configuration.
    For int4 trees the whole-matrix K-halves packing is re-tiled into
    PER-TILE K-halves packing so each (d, d) weight tile streams as a
    (d/2, d) byte block (half the int8 path's weight HBM traffic).

    lora_int8 (default True): when the tree carries `lora_A_i8` codes
    (minmax-symmetric <=8-bit slots emit them losslessly), the LoRA banks
    stream as int8 + per-column f32 scales at half the bf16 traffic; the
    kernel dequantizes per tile and reproduces the bf16-bank dots
    bit-for-bit (`_mega_kernel` lora helpers). False keeps float banks
    (A/B measurement switch).
    """
    m = cfg.model
    d, ff = m.n_embd, 4 * m.n_embd
    blocks = iparams["blocks"]
    is_int4 = "w_i4" in blocks["c_attn"]
    wkey = "w_i4" if is_int4 else "w_i8"
    for name in ("c_attn", "attn_proj", "c_fc", "mlp_proj"):
        lin = blocks[name]
        if wkey not in lin or "x_s" not in lin:
            raise ValueError(
                f"mega decode needs int8_xla/int4_xla weights with static "
                f"activation scales; linear {name!r} has keys {sorted(lin)}")

    def unpack4(p):  # (L, K/2, N) packed -> (L, K, N) int8 codes
        wi = p.astype(jnp.int32)
        lo = ((wi << 28) >> 28).astype(jnp.int8)
        hi = (wi >> 4).astype(jnp.int8)
        return jnp.concatenate([lo, hi], axis=1)

    def codes(lin):
        return unpack4(lin["w_i4"]) if is_int4 else lin["w_i8"]

    if codes(blocks["c_fc"]).shape[2] != ff:
        raise ValueError("mega decode assumes d_ff == 4*d_model")
    L = blocks["c_attn"][wkey].shape[0]

    def outvec(x, n):
        # per-out-channel (L, n) or per-tensor (L,)/(L, 1) -> (L, n) f32
        x = jnp.asarray(x, jnp.float32).reshape(L, -1)
        return jnp.broadcast_to(x, (L, n))

    qkv, proj, fc, mlp = (blocks["c_attn"], blocks["attn_proj"],
                          blocks["c_fc"], blocks["mlp_proj"])

    def tiles_out(w):  # (L, d, n*d) -> n x (L, d, d) col tiles
        n = w.shape[2] // d
        return [w[:, :, i * d:(i + 1) * d] for i in range(n)]

    def tiles_in(w):  # (L, n*d, d) -> n x (L, d, d) row tiles
        n = w.shape[1] // d
        return [w[:, i * d:(i + 1) * d, :] for i in range(n)]

    tile_list = (tiles_out(codes(qkv)) + [codes(proj)]
                 + tiles_out(codes(fc)) + tiles_in(codes(mlp)))
    if is_int4:
        # per-tile K-halves repack: rows [0, d/2) in low nibbles, rows
        # [d/2, d) in high nibbles of a (L, d/2, d) byte tile
        def pack_tile(t):
            lo = t[:, :d // 2].astype(jnp.int8)
            hi = t[:, d // 2:].astype(jnp.int8)
            return ((lo & 0xF) | (hi << 4)).astype(jnp.int8)

        tile_list = [pack_tile(t) for t in tile_list]
    wt = jnp.stack(tile_list, axis=1)

    def vec_tiles(v, n):  # (L, n*d) -> n x (L, d)
        return [v[:, i * d:(i + 1) * d] for i in range(n)]

    qkv_s, fc_s = outvec(qkv["w_s"], 3 * d), outvec(fc["w_s"], ff)
    proj_s, mlp_s = outvec(proj["w_s"], d), outvec(mlp["w_s"], d)
    # (L, NT, 1, d): the unit dim keeps per-tile blocks at a legal
    # (1, d) last-two-dims tile shape for the Mosaic lowering
    ws = jnp.stack(vec_tiles(qkv_s, 3) + [proj_s] + vec_tiles(fc_s, 4)
                   + [mlp_s] * 4, axis=1)[:, :, None, :]

    zs = jnp.zeros((L, d), jnp.float32)
    bias = jnp.stack(
        vec_tiles(jnp.asarray(qkv["b"], jnp.float32), 3)
        + [jnp.asarray(proj["b"], jnp.float32)]
        + vec_tiles(jnp.asarray(fc["b"], jnp.float32), 4)
        + [zs, zs, zs, jnp.asarray(mlp["b"], jnp.float32)],
        axis=1)[:, :, None, :]

    has_lora = "lora_A" in qkv
    # int8 LoRA banks need PER-TENSOR lora scales (one scalar per tile,
    # carried in SMEM next to xs — adding per-column scale streams to the
    # grid measured SLOWER than the traffic saved, the same lesson as the
    # r4 compact-banks experiment); per-channel trees keep float banks.
    use_i8 = bool(lora_int8 and has_lora and "lora_A_i8" in qkv
                  and np.asarray(qkv["lora_A_s"]).size == L
                  and np.asarray(qkv["lora_B_s"]).size == L)
    akey, bkey = ("lora_A_i8", "lora_B_i8") if use_i8 else ("lora_A",
                                                           "lora_B")
    if has_lora:
        r = qkv[akey].shape[2]
        ldt = qkv[akey].dtype

        def sc(lin, key):  # (L,) per-tensor scalar scale
            return jnp.asarray(lin[key], jnp.float32).reshape(L)

        if LORA_BANKS == "full":
            za = jnp.zeros((L, d, r), ldt)
            zb = jnp.zeros((L, r, d), ldt)
            at = jnp.stack(
                [qkv[akey], za, za, proj[akey], fc[akey],
                 za, za, za] + tiles_in(mlp[akey]), axis=1)
            bt = jnp.stack(
                tiles_out(qkv[bkey]) + [proj[bkey]]
                + tiles_out(fc[bkey]) + [zb, zb, zb, mlp[bkey]],
                axis=1)
            if use_i8:
                one = jnp.ones((L,), jnp.float32)
                a_q, a_p, a_f, a_m = (sc(qkv, "lora_A_s"),
                                      sc(proj, "lora_A_s"),
                                      sc(fc, "lora_A_s"),
                                      sc(mlp, "lora_A_s"))
                b_q, b_p, b_f, b_m = (sc(qkv, "lora_B_s"),
                                      sc(proj, "lora_B_s"),
                                      sc(fc, "lora_B_s"),
                                      sc(mlp, "lora_B_s"))
                at_s = jnp.stack([a_q, one, one, a_p, a_f, one, one, one,
                                  a_m, a_m, a_m, a_m], axis=1)
                bt_s = jnp.stack([b_q, b_q, b_q, b_p, b_f, b_f, b_f, b_f,
                                  one, one, one, b_m], axis=1)
        else:
            # compact banks (see _AT_MAP/_BT_MAP): every stored tile is read
            at = jnp.stack(
                [qkv[akey], proj[akey], fc[akey]]
                + tiles_in(mlp[akey]), axis=1)
            bt = jnp.stack(
                tiles_out(qkv[bkey]) + [proj[bkey]]
                + tiles_out(fc[bkey]) + [mlp[bkey]], axis=1)
            if use_i8:
                at_s = jnp.stack(
                    [sc(qkv, "lora_A_s"), sc(proj, "lora_A_s"),
                     sc(fc, "lora_A_s")] + [sc(mlp, "lora_A_s")] * 4,
                    axis=1)
                bt_s = jnp.stack(
                    [sc(qkv, "lora_B_s")] * 3 + [sc(proj, "lora_B_s")]
                    + [sc(fc, "lora_B_s")] * 4 + [sc(mlp, "lora_B_s")],
                    axis=1)
    else:
        r = 8
        n_at, n_bt = (12, 12) if LORA_BANKS == "full" else (7, 9)
        at = jnp.zeros((L, n_at, d, r), jnp.bfloat16)
        bt = jnp.zeros((L, n_bt, r, d), jnp.bfloat16)
    if not use_i8:
        # float banks carry their values directly; scalar scale banks are
        # unused (SMEM residents, a few hundred bytes)
        at_s = jnp.ones((L, at.shape[1]), jnp.float32)
        bt_s = jnp.ones((L, bt.shape[1]), jnp.float32)

    ln = jnp.stack(
        [jnp.asarray(iparams["blocks"]["ln1"]["g"], jnp.float32),
         jnp.asarray(iparams["blocks"]["ln1"]["b"], jnp.float32),
         jnp.asarray(iparams["blocks"]["ln2"]["g"], jnp.float32),
         jnp.asarray(iparams["blocks"]["ln2"]["b"], jnp.float32)], axis=1)

    xs = jnp.stack(
        [jnp.asarray(lin["x_s"], jnp.float32).reshape(L)
         for lin in (qkv, proj, fc, mlp)], axis=1)

    return MegaWeights(wt=wt, ws=ws, bias=bias, at=at, bt=bt, at_s=at_s,
                       bt_s=bt_s, ln=ln, xs=xs)


def _ln_f32(x, g, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return g * (x - mean) * jax.lax.rsqrt(var + eps) + b


def _q8(x, xs, qmax=127.0):
    return _clamp(_rne(x / xs), -qmax, qmax).astype(jnp.int8)


def _erf(z):
    """A&S 7.1.26 rational erf (max abs err 1.5e-7); no erf in Pallas TPU."""
    s = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * za)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly * jnp.exp(-za * za))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _mega_kernel(pos_ref, xs_ref, h_ref, hm_ref, wt_ref, ws_ref, bias_ref,
                 at_ref, bt_ref, ats_ref, bts_ref, ln_ref, kc_in, vc_in,
                 o_ref, kc, vc,
                 qkv_s, qx_s, hn2_s, g_s, acc_s, xam_s,
                 kbuf, vbuf, rmwk, rmwv, sem, rsem,
                 *, eps, sm_scale, tbp, B, H, has_lora, act_dtype,
                 wbits=8, aq_max=127.0, tpg=1, lora_i8=False):
    """Grid (n_layer, 12); one (d, d) weight tile per step (see module doc).

    wbits=4: `wt` tiles are (d/2, d) nibble-packed (per-tile K-halves);
    the dot splits into two s8 MXU dots over the activation-code halves.
    aq_max: activation code clamp (127 for A8, 7 for A4).
    lora_i8: at/bt hold int8 codes; each tile dequantizes in-VMEM with the
    ats/bts per-column scales to the SAME float values the bf16 banks held
    (lossless on the minmax grid), so the dots are bit-identical at half
    the bank stream traffic."""
    del kc_in, vc_in  # aliased to kc/vc
    l = pl.program_id(0)
    t_step = pl.program_id(1)
    d = h_ref.shape[1]
    cdt = kbuf.dtype
    pos = pos_ref[0]

    @pl.when((l == 0) & (t_step == 0))
    def _():
        o_ref[:] = h_ref[:]

    def _rt(x):
        # Round f32 -> bf16 -> f32 at the same points the XLA serving path
        # keeps h/LN/GELU outputs in bf16 (`infer_forward_unrolled`): the
        # int8 activation codes — and hence all s32 dots — then match the
        # unfused path, making the megakernel a drop-in replacement. The
        # rounding is done by explicit round-to-nearest-even bit math:
        # Mosaic compiles a plain astype(bf16).astype(f32) pair to a
        # DIFFERENT rounding than XLA's convert (measured compiled-vs-
        # interpret divergence), while integer ops are exact everywhere.
        # A no-op for f32 trees (the bit-exactness tests).
        if act_dtype == jnp.float32:
            return x
        u = pltpu.bitcast(x, jnp.int32)
        r = (u + 0x7FFF + ((u >> 16) & 1)) & jnp.int32(-65536)
        return pltpu.bitcast(r, jnp.float32)

    # `tpg` tiles per grid step (fewer, fatter steps): the 144-step
    # schedule's per-grid-step fixed cost dominated the decode budget
    # (docs/RESULTS_R4.md); the python loop replays the original
    # per-tile body once per sub-tile with `t` the global tile index.
    ldt_t = jnp.bfloat16 if act_dtype != jnp.float32 else jnp.float32
    for _sub in range(tpg):
        t = t_step * tpg + _sub
        w_tile = wt_ref[0, _sub]           # (d, d) int8 — or (d/2, d) packed int4
        w_s = ws_ref[0, _sub]              # (1, d) f32
        b_t = bias_ref[0, _sub]            # (1, d) f32

        def i8dot(qx):
            if wbits == 4:
                if I4_UNPACK == "i8":
                    # int8-native shifts: no (d/2, d) int32 materialization in
                    # the unpack (round-4 W4 critical-path fix)
                    lo = (w_tile << 4) >> 4   # sign-extended low nibble
                    hi = w_tile >> 4          # arithmetic shift, stays int8
                else:
                    wi = w_tile.astype(jnp.int32)
                    lo = ((wi << 28) >> 28).astype(jnp.int8)
                    hi = (wi >> 4).astype(jnp.int8)
                d2 = d // 2
                acc = jax.lax.dot_general(
                    qx[:, :d2], lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc + jax.lax.dot_general(
                    qx[:, d2:], hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            return jax.lax.dot_general(qx, w_tile, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)

        def lora_a(x):
            # int8 banks: cast codes to the compute dtype (integers <=127
            # are exact in bf16) and apply the per-tile SCALAR scale to the
            # (B, r) OUTPUT — the only added work vs float banks is the
            # tile cast; the scale rides in SMEM (no extra grid streams)
            am = at_ref[0, _sub]
            if lora_i8:
                xa = jnp.dot(x.astype(ldt_t), am.astype(ldt_t),
                             preferred_element_type=jnp.float32)
                return xa * ats_ref[l, _at_idx(t)]
            return jnp.dot(x.astype(am.dtype), am,
                           preferred_element_type=jnp.float32)

        def lora_b(xa):
            bm = bt_ref[0, _sub]
            if lora_i8:
                o = jnp.dot(xa.astype(ldt_t), bm.astype(ldt_t),
                            preferred_element_type=jnp.float32)
                return o * bts_ref[l, _bt_idx(t)]
            return jnp.dot(xa.astype(bm.dtype), bm,
                           preferred_element_type=jnp.float32)

        # ---- t == 0..2: LN1 + qkv out-tile --------------------------------
        @pl.when(t == 0)
        def _():
            hn = _rt(_ln_f32(o_ref[:], ln_ref[0, 0:1, :], ln_ref[0, 1:2, :],
                             eps))
            qx_s[:] = _q8(hn, xs_ref[l, 0], aq_max)
            if has_lora:
                # xa for the qkv phase; parked in xam_s row 0 until t==2
                xam_s[0] = lora_a(hn)

        @pl.when(t < 3)
        def _():
            out = (i8dot(qx_s[:]).astype(jnp.float32) * (xs_ref[l, 0] * w_s)
                   + b_t)
            if has_lora:
                out = out + lora_b(xam_s[0])
            qkv_s[t] = out

        # ---- t == 3: attention (head-interleaved HBM caches) + attn-proj --
        @pl.when(t == 3)
        def _():
            q = qkv_s[0] * sm_scale    # (B, d) f32, pre-scaled
            # new K/V round-trip through the cache dtype so the merge sees the
            # same values later steps will stream back (matches the unfused path)
            kn = qkv_s[1].astype(cdt).astype(jnp.float32)  # (B, d)
            vn = qkv_s[2].astype(cdt).astype(jnp.float32)
            hm = hm_ref[:]             # (H, d) f32 one-hot head mask

            # 1. kick off the append-RMW *read* (modify+write after streaming)
            grp8 = pl.multiple_of(_idiv(pos, 8) * 8, 8)
            sub = _irem(pos, 8)
            rk = pltpu.make_async_copy(kc.at[l, :, pl.ds(grp8, 8)], rmwk,
                                       rsem.at[0])
            rv = pltpu.make_async_copy(vc.at[l, :, pl.ds(grp8, 8)], rmwv,
                                       rsem.at[1])
            rk.start()
            rv.start()

            # Qm (B, H, d): row h = q masked to head h's lane group — per-head
            # scores come from ONE batched MXU dot against full-d cache rows
            Qm = (q[:, None, :] * hm[None]).astype(cdt)

            nblk = _idiv(pos + tbp - 1, tbp)

            def get_dma(slot, j):
                off = pl.multiple_of(j * tbp, tbp)
                return (
                    pltpu.make_async_copy(kc.at[l, :, pl.ds(off, tbp)],
                                          kbuf.at[slot], sem.at[0, slot]),
                    pltpu.make_async_copy(vc.at[l, :, pl.ds(off, tbp)],
                                          vbuf.at[slot], sem.at[1, slot]),
                )

            @pl.when(nblk > 0)
            def _():
                k0, v0 = get_dma(0, 0)
                k0.start()
                v0.start()

            prec = (jax.lax.Precision.HIGHEST if cdt == jnp.float32
                    else jax.lax.Precision.DEFAULT)

            def body(j, carry):
                m, lsum, acc = carry
                slot = _irem(j, 2)

                @pl.when(j + 1 < nblk)
                def _():
                    kn_, vn_ = get_dma(_irem(j + 1, 2), j + 1)
                    kn_.start()
                    vn_.start()

                kj, vj = get_dma(slot, j)
                kj.wait()
                vj.wait()
                kb = kbuf[slot]  # (B, tbp, d) cache rows
                s = jax.lax.dot_general(  # (B, H, tbp) per-head scores
                    Qm, kb, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec)
                t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tbp),
                                                 2) + j * tbp
                s = _sel(t_ids < pos, s, NEG_INF)  # strict: new token merges last
                m_new = jnp.maximum(m, jnp.max(s, axis=2))  # (B, H)
                pbl = jnp.exp(s - m_new[:, :, None])
                corr = jnp.exp(m - m_new)
                l_new = lsum * corr + jnp.sum(pbl, axis=2)
                pv = jax.lax.dot_general(  # (B, H, d) full-lane weighted V
                    pbl.astype(cdt), vbuf[slot], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec)
                return m_new, l_new, acc * corr[:, :, None] + pv

            m0 = jnp.full((B, H), NEG_INF, jnp.float32)
            l0 = jnp.zeros((B, H), jnp.float32)
            a0 = jnp.zeros((B, H, d), jnp.float32)
            m, lsum, acc = jax.lax.fori_loop(0, nblk, body, (m0, l0, a0))

            # merge the new token (never round-trips through HBM)
            s_new = jax.lax.dot_general(  # (B, H): per-head q . k_new
                q * kn, hm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_f = jnp.maximum(m, s_new)
            corr = jnp.exp(m - m_f)
            p_new = jnp.exp(s_new - m_f)
            l_f = lsum * corr + p_new
            heads = acc * corr[:, :, None] + p_new[:, :, None] * (
                vn[:, None, :] * hm[None])           # (B, H, d)
            # collapse: lane i belongs to head i//D; l_f expands via one-hot dot
            out = jnp.sum(heads * hm[None], axis=1)  # (B, d)
            l_lanes = jax.lax.dot_general(
                l_f, hm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (B, d)
            attn2d = _rt(out / jnp.maximum(l_lanes, 1e-30))

            # complete the append RMW (row `pos` gets this step's k/v)
            rk.wait()
            rv.wait()
            sub_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 8, d), 1)
            selm = sub_ids == sub
            rmwk[:] = _sel(selm, jnp.broadcast_to(kn.astype(cdt)[:, None, :],
                                                  (B, 8, d)), rmwk[:])
            rmwv[:] = _sel(selm, jnp.broadcast_to(vn.astype(cdt)[:, None, :],
                                                  (B, 8, d)), rmwv[:])
            wk = pltpu.make_async_copy(rmwk, kc.at[l, :, pl.ds(grp8, 8)],
                                       rsem.at[0])
            wv = pltpu.make_async_copy(rmwv, vc.at[l, :, pl.ds(grp8, 8)],
                                       rsem.at[1])
            wk.start()
            wv.start()
            wk.wait()
            wv.wait()

            # ---- attn-proj tile + residual + LN2 --------------------------
            proj = (i8dot(_q8(attn2d, xs_ref[l, 1], aq_max)).astype(jnp.float32)
                    * (xs_ref[l, 1] * w_s) + b_t)
            if has_lora:
                proj = proj + lora_b(lora_a(attn2d))
            h1 = _rt(o_ref[:] + _rt(proj))
            o_ref[:] = h1
            hn2_s[:] = _rt(_ln_f32(h1, ln_ref[0, 2:3, :], ln_ref[0, 3:4, :],
                                   eps))

        # ---- t == 4..7: fc out-tile + GELU --------------------------------
        @pl.when(t == 4)
        def _():
            qx_s[:] = _q8(hn2_s[:], xs_ref[l, 2], aq_max)
            if has_lora:
                xam_s[0] = lora_a(hn2_s[:])

        @pl.when((t >= 4) & (t < 8))
        def _():
            fc = (i8dot(qx_s[:]).astype(jnp.float32) * (xs_ref[l, 2] * w_s)
                  + b_t)
            if has_lora:
                fc = fc + lora_b(xam_s[0])
            g_s[t - 4] = _rt(_gelu_exact(fc))

        # ---- t == 8..11: mlp-proj in-tile partial sums (exact s32 split) --
        @pl.when(t >= 8)
        def _():
            g_chunk = g_s[t - 8]
            part_dot = i8dot(_q8(g_chunk, xs_ref[l, 3], aq_max))
            if has_lora:
                xam = lora_a(g_chunk)

            @pl.when(t == 8)
            def _():
                acc_s[:] = part_dot
                if has_lora:
                    xam_s[1] = xam

            @pl.when(t > 8)
            def _():
                acc_s[:] = acc_s[:] + part_dot
                if has_lora:
                    xam_s[1] = xam_s[1] + xam

        @pl.when(t == N_TILES - 1)
        def _():
            mlp = (acc_s[:].astype(jnp.float32) * (xs_ref[l, 3] * w_s) + b_t)
            if has_lora:
                mlp = mlp + lora_b(xam_s[1])
            o_ref[:] = _rt(o_ref[:] + _rt(mlp))


def mega_decode_step(h, mw: MegaWeights, k_cache, v_cache, pos, *,
                     n_head: int, head_dim: int, has_lora: bool,
                     eps: float = 1e-5, tbp: int = 32,
                     act_dtype=jnp.bfloat16, aq_max: float = 127.0,
                     tiles_per_step: int = 1,
                     interpret: bool = False):
    """Run every transformer layer of one decode step in one Pallas call.

    h: (B, d) f32 post-embedding hidden state (single token per sequence).
    mw: `pack_mega_weights` output.
    k_cache/v_cache: stacked HEAD-INTERLEAVED caches (L, B, T, d) — row t
    holds all heads' K/V for timestep t — DONATED, updated in place at
    `pos` (scalar int32, uniform across the batch). The caller must keep
    `pos < T` — the append RMW reads the 8-row group containing `pos` and
    an out-of-range pos would read/write past the cache (the engine sizes
    caches to T0 + max_new_tokens rounded up, so this holds by
    construction).
    Returns (h_out (B, d) f32, k_cache, v_cache).
    """
    B, d = h.shape
    L = mw.wt.shape[0]
    r = mw.at.shape[3]
    D, H = head_dim, n_head
    assert H * D == d
    if d % 128:
        raise ValueError(
            f"mega_decode_step needs d % 128 == 0 (weight tiles are (d, d) "
            f"Mosaic lane-aligned blocks); got d={d}. Pad n_embd or use the "
            "unfused int8_xla path.")
    Tc = k_cache.shape[2]
    assert k_cache.shape == (L, B, Tc, d), (k_cache.shape, (L, B, Tc, d))
    tbp = min(tbp, Tc)
    while Tc % tbp and tbp > 8:
        tbp -= 8
    assert Tc % tbp == 0 and tbp % 8 == 0, (Tc, tbp)
    cdt = k_cache.dtype
    sm_scale = 1.0 / math.sqrt(D)
    ldt = mw.at.dtype

    # one-hot head mask: lane i belongs to head i // head_dim
    hm = (jnp.arange(d) // D == jnp.arange(H)[:, None]).astype(jnp.float32)

    dk = mw.wt.shape[2]  # d for int8 tiles, d//2 for packed int4 tiles
    wbits = 4 if dk == d // 2 else 8
    assert dk in (d, d // 2), (dk, d)

    tpg = int(tiles_per_step)
    if N_TILES % tpg or (tpg > 1 and LORA_BANKS != "full"):
        raise ValueError(
            f"tiles_per_step={tpg} must divide {N_TILES} and requires "
            "LORA_BANKS='full' (compact index maps are per single tile)")
    lora_i8 = mw.at.dtype == jnp.int8
    kernel = functools.partial(
        _mega_kernel, eps=eps, sm_scale=sm_scale, tbp=tbp, B=B, H=H,
        has_lora=has_lora, act_dtype=jnp.dtype(act_dtype).type,
        wbits=wbits, aq_max=float(aq_max), tpg=tpg, lora_i8=lora_i8)

    grid = (L, N_TILES // tpg)
    out, kc, vc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # pos (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # xs (L, 4)
            pl.BlockSpec((B, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),            # h
            pl.BlockSpec((H, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),            # head mask
            pl.BlockSpec((1, tpg, dk, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # wt
            pl.BlockSpec((1, tpg, 1, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # ws
            pl.BlockSpec((1, tpg, 1, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # bias
            pl.BlockSpec((1, tpg, d, r),
                         lambda l, t: (l, t if tpg > 1 else _at_idx(t),
                                       0, 0),
                         memory_space=pltpu.VMEM),            # at
            pl.BlockSpec((1, tpg, r, d),
                         lambda l, t: (l, t if tpg > 1 else _bt_idx(t),
                                       0, 0),
                         memory_space=pltpu.VMEM),            # bt
            pl.BlockSpec(memory_space=pltpu.SMEM),            # at_s (L, NT)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # bt_s (L, NT)
            pl.BlockSpec((1, 4, d), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),            # ln
            pl.BlockSpec(memory_space=pltpu.ANY),             # kc
            pl.BlockSpec(memory_space=pltpu.ANY),             # vc
        ],
        out_specs=(
            pl.BlockSpec((B, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((L, B, Tc, d), cdt),
            jax.ShapeDtypeStruct((L, B, Tc, d), cdt),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, B, d), jnp.float32),    # qkv_s
            pltpu.VMEM((B, d), jnp.int8),          # qx_s
            pltpu.VMEM((B, d), jnp.float32),       # hn2_s
            pltpu.VMEM((4, B, d), jnp.float32),    # g_s
            pltpu.VMEM((B, d), jnp.int32),         # acc_s
            pltpu.VMEM((2, B, r), jnp.float32),    # xam_s (qkv/fc @0, mlp @1)
            pltpu.VMEM((2, B, tbp, d), cdt),       # kbuf
            pltpu.VMEM((2, B, tbp, d), cdt),       # vbuf
            pltpu.VMEM((B, 8, d), cdt),            # rmwk
            pltpu.VMEM((B, 8, d), cdt),            # rmwv
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={12: 1, 13: 2},
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), mw.xs,
      h.astype(jnp.float32), hm, mw.wt, mw.ws, mw.bias,
      mw.at if lora_i8 else mw.at.astype(ldt),
      mw.bt if lora_i8 else mw.bt.astype(ldt),
      mw.at_s, mw.bt_s, mw.ln, k_cache, v_cache)

    return out, kc, vc



# ---------------------------------------------------------------------------
# int8-KV variant: KV cache stored as int8 codes + per-row scales
# ---------------------------------------------------------------------------


def _mega_kernel_kv8(*refs,
                     eps, sm_scale, tbp, B, H, has_lora, act_dtype,
                     wbits=8, aq_max=127.0, kv_bits=8, per_slot=False,
                     tpg=1, lora_i8=False):
    """`_mega_kernel` with the KV cache in int8 (KV8 of the reference's
    W-A-KV configs, `part3_eval_sp/bit_configurations.py`): codes (L,B,T,d)
    int8 + per-row scales (L,B,T) f32. The attention dots run s8xs8->s32 on
    the MXU — no dequant cast of the streamed prefix:

      scores = (q8(Qm) @ kb_codes) * q_scale * k_row_scale
      pv     = (q8(p * v_row_scale) @ vb_codes) * p_scale

    (the per-row V scale folds into the probabilities BEFORE their own
    quantization, so the weighted sum stays exact in the factorization).
    Halves KV HBM traffic — the dominant stream at long prefixes (see
    docs/RESULTS_R3.md cost decomposition).

    kv_bits=4 (the reference's KV4 axis — W4A8KV4 / W8A8KV4,
    `part3_eval_sp/bit_configurations.py:4`): codes are ±7 int4 nibbles
    packed along LANE HALVES into (L, B, T, d/2) bytes — lanes [0, d/2) in
    the low nibbles, [d/2, d) in the high — so each attention dot splits
    into two s8 MXU dots over the corresponding Q lane-halves (scores) or
    output lane-halves (weighted V), and the packed tile needs no lane
    interleaving on unpack. Per-row scales unchanged. Quarter KV traffic.

    per_slot=True (continuous batching, `mega_decode_step_cb`): two-level
    KV. The MAIN caches hold each slot's prefix up to its own length
    (pos_ref becomes the per-slot (B,) length vector + a max scalar) and
    are READ-ONLY, masked per batch row. In-chunk tokens live in a small
    chunk-local RECENT buffer (same layout, T = chunk size) at a
    BATCH-UNIFORM position `rpos` (every slot decodes step i of the chunk
    together), so the existing 8-row RMW append machinery applies to it
    unchanged. XLA scatters into the 37 MB main caches measured ~300 µs
    per token (copies); appending to the ~5 MB recent buffer and merging
    per-slot ONCE per chunk amortizes that to ~5 µs/token.
    """
    if per_slot:
        (pos_ref, maxpos_ref, rpos_ref, xs_ref, h_ref, hm_ref, wt_ref,
         ws_ref, bias_ref, at_ref, bt_ref, ats_ref, bts_ref, ln_ref,
         kcm, vcm, kscm, vscm,
         kc_in, vc_in, ks_in, vs_in,
         o_ref, kc, vc, ksc, vsc,
         qkv_s, qx_s, hn2_s, g_s, acc_s, xam_s,
         kbuf, vbuf, ksbuf, vsbuf, krbuf, vrbuf, ksrbuf, vsrbuf,
         rmwk, rmwv, rmwks, rmwvs,
         sem, ssem, rsem, rssem, rpsem) = refs
        del kc_in, vc_in, ks_in, vs_in  # aliased (recent buffers)
        pos = rpos_ref[0]  # uniform position within the RECENT buffer
    else:
        (pos_ref, xs_ref, h_ref, hm_ref, wt_ref, ws_ref, bias_ref,
         at_ref, bt_ref, ats_ref, bts_ref, ln_ref, kc_in, vc_in, ks_in,
         vs_in,
         o_ref, kc, vc, ksc, vsc,
         qkv_s, qx_s, hn2_s, g_s, acc_s, xam_s,
         kbuf, vbuf, ksbuf, vsbuf, krbuf, vrbuf, ksrbuf, vsrbuf,
         rmwk, rmwv, rmwks, rmwvs,
         sem, ssem, rsem, rssem, rpsem) = refs
        del kc_in, vc_in, ks_in, vs_in  # aliased
        del krbuf, vrbuf, ksrbuf, vsrbuf, rpsem  # per_slot-only scratch
        pos = pos_ref[0]
    l = pl.program_id(0)
    t_step = pl.program_id(1)
    d = h_ref.shape[1]

    @pl.when((l == 0) & (t_step == 0))
    def _():
        o_ref[:] = h_ref[:]

    def _rt(x):
        if act_dtype == jnp.float32:
            return x
        u = pltpu.bitcast(x, jnp.int32)
        r = (u + 0x7FFF + ((u >> 16) & 1)) & jnp.int32(-65536)
        return pltpu.bitcast(r, jnp.float32)

    # `tpg` tiles per grid step (fewer, fatter steps): the 144-step
    # schedule's per-grid-step fixed cost dominated the decode budget
    # (docs/RESULTS_R4.md); the python loop replays the original
    # per-tile body once per sub-tile with `t` the global tile index.
    ldt_t = jnp.bfloat16 if act_dtype != jnp.float32 else jnp.float32
    for _sub in range(tpg):
        t = t_step * tpg + _sub
        w_tile = wt_ref[0, _sub]
        w_s = ws_ref[0, _sub]
        b_t = bias_ref[0, _sub]

        def i8dot(qx):
            if wbits == 4:
                if I4_UNPACK == "i8":
                    # int8-native shifts: no (d/2, d) int32 materialization in
                    # the unpack (round-4 W4 critical-path fix)
                    lo = (w_tile << 4) >> 4   # sign-extended low nibble
                    hi = w_tile >> 4          # arithmetic shift, stays int8
                else:
                    wi = w_tile.astype(jnp.int32)
                    lo = ((wi << 28) >> 28).astype(jnp.int8)
                    hi = (wi >> 4).astype(jnp.int8)
                d2 = d // 2
                acc = jax.lax.dot_general(
                    qx[:, :d2], lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return acc + jax.lax.dot_general(
                    qx[:, d2:], hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            return jax.lax.dot_general(qx, w_tile, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)

        def lora_a(x):
            # int8 banks: cast codes to the compute dtype (integers <=127
            # are exact in bf16) and apply the per-tile SCALAR scale to the
            # (B, r) OUTPUT — the only added work vs float banks is the
            # tile cast; the scale rides in SMEM (no extra grid streams)
            am = at_ref[0, _sub]
            if lora_i8:
                xa = jnp.dot(x.astype(ldt_t), am.astype(ldt_t),
                             preferred_element_type=jnp.float32)
                return xa * ats_ref[l, _at_idx(t)]
            return jnp.dot(x.astype(am.dtype), am,
                           preferred_element_type=jnp.float32)

        def lora_b(xa):
            bm = bt_ref[0, _sub]
            if lora_i8:
                o = jnp.dot(xa.astype(ldt_t), bm.astype(ldt_t),
                            preferred_element_type=jnp.float32)
                return o * bts_ref[l, _bt_idx(t)]
            return jnp.dot(xa.astype(bm.dtype), bm,
                           preferred_element_type=jnp.float32)

        @pl.when(t == 0)
        def _():
            hn = _rt(_ln_f32(o_ref[:], ln_ref[0, 0:1, :], ln_ref[0, 1:2, :],
                             eps))
            qx_s[:] = _q8(hn, xs_ref[l, 0], aq_max)
            if has_lora:
                xam_s[0] = lora_a(hn)

        @pl.when(t < 3)
        def _():
            out = (i8dot(qx_s[:]).astype(jnp.float32) * (xs_ref[l, 0] * w_s)
                   + b_t)
            if has_lora:
                out = out + lora_b(xam_s[0])
            qkv_s[t] = out

        @pl.when(t == 3)
        def _():
            q = qkv_s[0] * sm_scale
            # per-row int8 quantization of the new K/V (round-trip applied so
            # the in-register merge sees the same values future steps stream)
            kn_f = qkv_s[1]
            vn_f = qkv_s[2]
            kvq = 127.0 if kv_bits == 8 else 7.0
            d2 = d // 2
            ks_new = jnp.maximum(jnp.max(jnp.abs(kn_f), axis=1, keepdims=True),
                                 1e-8) / kvq                 # (B, 1)
            vs_new = jnp.maximum(jnp.max(jnp.abs(vn_f), axis=1, keepdims=True),
                                 1e-8) / kvq
            kcode = _clamp(_rne(kn_f / ks_new), -kvq, kvq)
            vcode = _clamp(_rne(vn_f / vs_new), -kvq, kvq)
            kn = kcode * ks_new                               # dequant view
            vn = vcode * vs_new
            hm = hm_ref[:]

            if per_slot:
                # (B, 1, 1) per-slot MAIN-prefix lengths from the SMEM scalars
                iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1), 0)
                pos_vec = jnp.zeros((B, 1, 1), jnp.int32)
                for b_i in range(B):
                    pos_vec = jnp.where(iota_b == b_i, pos_ref[b_i], pos_vec)
            # append-RMW targets the (recent, in per_slot mode) aliased caches
            grp8 = pl.multiple_of(_idiv(pos, 8) * 8, 8)
            sub = _irem(pos, 8)
            rk = pltpu.make_async_copy(kc.at[l, :, pl.ds(grp8, 8)], rmwk,
                                       rsem.at[0])
            rv = pltpu.make_async_copy(vc.at[l, :, pl.ds(grp8, 8)], rmwv,
                                       rsem.at[1])
            rks = pltpu.make_async_copy(ksc.at[l, pl.ds(grp8, 8)], rmwks,
                                        rssem.at[0])
            rvs = pltpu.make_async_copy(vsc.at[l, pl.ds(grp8, 8)], rmwvs,
                                        rssem.at[1])
            rk.start()
            rv.start()
            rks.start()
            rvs.start()

            if per_slot:
                # Prefetch the single recent-buffer block NOW so its DMA
                # hides under the main-prefix stream: running the recent
                # pass sequentially after the main pass measured ~109
                # us/step of un-hidden latency (scripts/cb_profile.py
                # ablation, r5). Rows >= pos are masked in the merge, so
                # reading the not-yet-written row `pos` is benign, and the
                # append RMW write-back starts only after this copy has
                # been waited (no read/write overlap).
                pkr = pltpu.make_async_copy(kc.at[l, :, pl.ds(0, tbp)],
                                            krbuf, rpsem.at[0])
                pvr = pltpu.make_async_copy(vc.at[l, :, pl.ds(0, tbp)],
                                            vrbuf, rpsem.at[1])
                pksr = pltpu.make_async_copy(ksc.at[l, pl.ds(0, tbp)],
                                             ksrbuf, rpsem.at[2])
                pvsr = pltpu.make_async_copy(vsc.at[l, pl.ds(0, tbp)],
                                             vsrbuf, rpsem.at[3])
                pkr.start()
                pvr.start()
                pksr.start()
                pvsr.start()

            # scatter per-batch scales into their lanes: (1, B) @ eye(B, 128)
            eyeB = (jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
                    ).astype(jnp.float32)

            # Qm quantized per (b, h) row: q already carries sm_scale
            Qm = q[:, None, :] * hm[None]                     # (B, H, d) f32
            qs = jnp.maximum(jnp.max(jnp.abs(Qm), axis=2, keepdims=True),
                             1e-8) / 127.0                    # (B, H, 1)
            Qmq = _clamp(_rne(Qm / qs), -127.0, 127.0).astype(jnp.int8)

            def get_dma(slot, j, srcs):
                kcx, vcx, kscx, vscx = srcs
                off = pl.multiple_of(j * tbp, tbp)
                return (
                    pltpu.make_async_copy(kcx.at[l, :, pl.ds(off, tbp)],
                                          kbuf.at[slot], sem.at[0, slot]),
                    pltpu.make_async_copy(vcx.at[l, :, pl.ds(off, tbp)],
                                          vbuf.at[slot], sem.at[1, slot]),
                    pltpu.make_async_copy(kscx.at[l, pl.ds(off, tbp)],
                                          ksbuf.at[slot], ssem.at[0, slot]),
                    pltpu.make_async_copy(vscx.at[l, pl.ds(off, tbp)],
                                          vsbuf.at[slot], ssem.at[1, slot]),
                )

            def merge_block(carry, kb, ksb_raw, vb, vsb_raw, toff, limit):
                """Online-softmax update with one (B, tbp, dc) block.
                `ksb_raw`/`vsb_raw` are the (tbp, 128) lane-scale tiles;
                `limit` is the valid-row bound — scalar (batch-uniform) or
                (B, 1, 1) per-slot."""
                m, lsum, acc = carry
                ksb = jnp.transpose(ksb_raw[:, :B])  # (tbp, B) -> (B, tbp)
                if kv_bits == 4:
                    kbi = kb.astype(jnp.int32)   # no int8 shifts on Mosaic
                    kb_lo = ((kbi << 28) >> 28).astype(jnp.int8)  # [0, d/2)
                    kb_hi = (kbi >> 4).astype(jnp.int8)           # [d/2, d)
                    s32 = jax.lax.dot_general(
                        Qmq[:, :, :d2], kb_lo, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                    s32 = s32 + jax.lax.dot_general(
                        Qmq[:, :, d2:], kb_hi, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                else:
                    s32 = jax.lax.dot_general(  # s8 x s8 -> s32 scores
                        Qmq, kb, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                s = s32.astype(jnp.float32) * qs * ksb[:, None, :]
                t_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tbp),
                                                 2) + toff
                s = _sel(t_ids < limit, s, NEG_INF)
                m_new = jnp.maximum(m, jnp.max(s, axis=2))
                pbl = jnp.exp(s - m_new[:, :, None])
                corr = jnp.exp(m - m_new)
                l_new = lsum * corr + jnp.sum(pbl, axis=2)
                # fold per-row V scales into the probabilities, quantize
                pscaled = pbl * jnp.transpose(
                    vsb_raw[:, :B])[:, None, :]
                ps = jnp.maximum(jnp.max(pscaled, axis=2, keepdims=True),
                                 1e-30) / 127.0
                pq = _clamp(_rne(pscaled / ps), -127.0,
                            127.0).astype(jnp.int8)
                if kv_bits == 4:
                    vbi = vb.astype(jnp.int32)
                    pv_lo = jax.lax.dot_general(
                        pq, ((vbi << 28) >> 28).astype(jnp.int8),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                    pv_hi = jax.lax.dot_general(
                        pq, (vbi >> 4).astype(jnp.int8),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                    pv32 = jnp.concatenate([pv_lo, pv_hi], axis=2)
                else:
                    pv32 = jax.lax.dot_general(
                        pq, vb, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                pv = pv32.astype(jnp.float32) * ps
                return m_new, l_new, acc * corr[:, :, None] + pv

            def stream(carry0, srcs, nblk, limit):
                """Online-softmax pass over one cache (double-buffered
                blocks)."""

                @pl.when(nblk > 0)
                def _():
                    for c in get_dma(0, 0, srcs):
                        c.start()

                def body(j, carry):
                    slot = _irem(j, 2)

                    @pl.when(j + 1 < nblk)
                    def _():
                        for c in get_dma(_irem(j + 1, 2), j + 1, srcs):
                            c.start()

                    for c in get_dma(slot, j, srcs):
                        c.wait()
                    return merge_block(carry, kbuf[slot], ksbuf[slot],
                                       vbuf[slot], vsbuf[slot], j * tbp,
                                       limit)

                return jax.lax.fori_loop(0, nblk, body, carry0)

            m0 = jnp.full((B, H), NEG_INF, jnp.float32)
            l0 = jnp.zeros((B, H), jnp.float32)
            a0 = jnp.zeros((B, H, d), jnp.float32)
            if per_slot:
                # main prefixes (read-only, per-slot masked), then the ONE
                # chunk-local recent block prefetched at the top of this
                # grid step (its DMA hid under the main stream); rows
                # >= pos are masked, so rpos == 0 degenerates to a no-op
                nblk_main = _idiv(maxpos_ref[0] + tbp - 1, tbp)
                carry = stream((m0, l0, a0), (kcm, vcm, kscm, vscm),
                               nblk_main, pos_vec)
                pkr.wait()
                pvr.wait()
                pksr.wait()
                pvsr.wait()
                m, lsum, acc = merge_block(carry, krbuf[:], ksrbuf[:],
                                           vrbuf[:], vsrbuf[:], 0, pos)
            else:
                nblk = _idiv(pos + tbp - 1, tbp)
                m, lsum, acc = stream((m0, l0, a0), (kc, vc, ksc, vsc), nblk,
                                      pos)

            s_new = jax.lax.dot_general(
                q * kn, hm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_f = jnp.maximum(m, s_new)
            corr = jnp.exp(m - m_f)
            p_new = jnp.exp(s_new - m_f)
            l_f = lsum * corr + p_new
            heads = acc * corr[:, :, None] + p_new[:, :, None] * (
                vn[:, None, :] * hm[None])
            out = jnp.sum(heads * hm[None], axis=1)
            l_lanes = jax.lax.dot_general(
                l_f, hm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn2d = _rt(out / jnp.maximum(l_lanes, 1e-30))

            if kv_bits == 4:
                def _pack(c):  # i32 bit math (no int8 shifts on Mosaic)
                    lo = c[:, :d2].astype(jnp.int32)
                    hi = c[:, d2:].astype(jnp.int32)
                    return ((lo & 0xF) | (hi << 4)).astype(jnp.int8)

                kbytes = _pack(kcode)
                vbytes = _pack(vcode)
            else:
                kbytes = kcode.astype(jnp.int8)
                vbytes = vcode.astype(jnp.int8)
            dc = kbytes.shape[1]
            ks_lanes = jnp.dot(jnp.transpose(ks_new), eyeB,
                               preferred_element_type=jnp.float32)  # (1, 128)
            vs_lanes = jnp.dot(jnp.transpose(vs_new), eyeB,
                               preferred_element_type=jnp.float32)
            rk.wait()
            rv.wait()
            rks.wait()
            rvs.wait()
            sub_ids = jax.lax.broadcasted_iota(jnp.int32, (B, 8, dc), 1)
            selm = sub_ids == sub
            rmwk[:] = _sel(selm, jnp.broadcast_to(
                kbytes[:, None, :], (B, 8, dc)), rmwk[:])
            rmwv[:] = _sel(selm, jnp.broadcast_to(
                vbytes[:, None, :], (B, 8, dc)), rmwv[:])
            sub_ids2 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            selm2 = sub_ids2 == sub
            rmwks[:] = _sel(selm2, jnp.broadcast_to(ks_lanes, (8, 128)),
                            rmwks[:])
            rmwvs[:] = _sel(selm2, jnp.broadcast_to(vs_lanes, (8, 128)),
                            rmwvs[:])
            wk = pltpu.make_async_copy(rmwk, kc.at[l, :, pl.ds(grp8, 8)],
                                       rsem.at[0])
            wv = pltpu.make_async_copy(rmwv, vc.at[l, :, pl.ds(grp8, 8)],
                                       rsem.at[1])
            wks = pltpu.make_async_copy(rmwks, ksc.at[l, pl.ds(grp8, 8)],
                                        rssem.at[0])
            wvs = pltpu.make_async_copy(rmwvs, vsc.at[l, pl.ds(grp8, 8)],
                                        rssem.at[1])
            wk.start()
            wv.start()
            wks.start()
            wvs.start()
            wk.wait()
            wv.wait()
            wks.wait()
            wvs.wait()

            proj = (i8dot(_q8(attn2d, xs_ref[l, 1], aq_max)).astype(jnp.float32)
                    * (xs_ref[l, 1] * w_s) + b_t)
            if has_lora:
                proj = proj + lora_b(lora_a(attn2d))
            h1 = _rt(o_ref[:] + _rt(proj))
            o_ref[:] = h1
            hn2_s[:] = _rt(_ln_f32(h1, ln_ref[0, 2:3, :], ln_ref[0, 3:4, :],
                                   eps))

        @pl.when(t == 4)
        def _():
            qx_s[:] = _q8(hn2_s[:], xs_ref[l, 2], aq_max)
            if has_lora:
                xam_s[0] = lora_a(hn2_s[:])

        @pl.when((t >= 4) & (t < 8))
        def _():
            fc = (i8dot(qx_s[:]).astype(jnp.float32) * (xs_ref[l, 2] * w_s)
                  + b_t)
            if has_lora:
                fc = fc + lora_b(xam_s[0])
            g_s[t - 4] = _rt(_gelu_exact(fc))

        @pl.when(t >= 8)
        def _():
            g_chunk = g_s[t - 8]
            part_dot = i8dot(_q8(g_chunk, xs_ref[l, 3], aq_max))
            if has_lora:
                xam = lora_a(g_chunk)

            @pl.when(t == 8)
            def _():
                acc_s[:] = part_dot
                if has_lora:
                    xam_s[1] = xam

            @pl.when(t > 8)
            def _():
                acc_s[:] = acc_s[:] + part_dot
                if has_lora:
                    xam_s[1] = xam_s[1] + xam

        @pl.when(t == N_TILES - 1)
        def _():
            mlp = (acc_s[:].astype(jnp.float32) * (xs_ref[l, 3] * w_s) + b_t)
            if has_lora:
                mlp = mlp + lora_b(xam_s[1])
            o_ref[:] = _rt(o_ref[:] + _rt(mlp))


def mega_decode_step_kv8(h, mw: MegaWeights, k_cache, v_cache, k_scale,
                         v_scale, pos, *, n_head: int, head_dim: int,
                         has_lora: bool, eps: float = 1e-5, tbp: int = 32,
                         act_dtype=jnp.bfloat16, aq_max: float = 127.0,
                         kv_bits: int = 8, tiles_per_step: int = 1,
                         interpret: bool = False):
    """`mega_decode_step` with int8 (or packed int4) KV caches + per-row
    scales.

    kv_bits=8: k_cache/v_cache are (L, B, T, d) int8 codes. kv_bits=4:
    (L, B, T, d/2) bytes, ±7 nibbles packed along lane halves (low nibble =
    lane i, high nibble = lane i + d/2). k_scale/v_scale: (L, T, 128) f32
    per-row scales, batch on the lane axis (see `_mega_kernel_kv8`).
    All four are DONATED and updated at `pos`.
    Returns (h_out, kc, vc, ks, vs).
    """
    B, d = h.shape
    L = mw.wt.shape[0]
    r = mw.at.shape[3]
    D, H = head_dim, n_head
    assert H * D == d
    if d % 128:
        raise ValueError(f"mega_decode_step_kv8 needs d % 128 == 0; got {d}")
    if kv_bits not in (8, 4):
        raise ValueError(f"kv_bits must be 8 or 4; got {kv_bits}")
    dc = d if kv_bits == 8 else d // 2
    if kv_bits == 4 and dc % 128 and not interpret:
        # compiled DMAs need the packed lane dim 128-aligned; interpret
        # mode (CPU tests on tiny dims) has no such constraint
        raise ValueError(f"kv_bits=4 needs d % 256 == 0; got d={d}")
    Tc = k_cache.shape[2]
    assert k_cache.shape == (L, B, Tc, dc), (k_cache.shape, dc)
    assert k_scale.shape == (L, Tc, 128), k_scale.shape
    tbp = min(tbp, Tc)
    while Tc % tbp and tbp > 8:
        tbp -= 8
    assert Tc % tbp == 0 and tbp % 8 == 0, (Tc, tbp)
    sm_scale = 1.0 / math.sqrt(D)
    ldt = mw.at.dtype
    dk = mw.wt.shape[2]
    wbits = 4 if dk == d // 2 else 8

    hm = (jnp.arange(d) // D == jnp.arange(H)[:, None]).astype(jnp.float32)

    tpg = int(tiles_per_step)
    if N_TILES % tpg or (tpg > 1 and LORA_BANKS != "full"):
        raise ValueError(
            f"tiles_per_step={tpg} must divide {N_TILES} and requires "
            "LORA_BANKS='full' (compact index maps are per single tile)")
    lora_i8 = mw.at.dtype == jnp.int8
    kernel = functools.partial(
        _mega_kernel_kv8, eps=eps, sm_scale=sm_scale, tbp=tbp, B=B, H=H,
        has_lora=has_lora, act_dtype=jnp.dtype(act_dtype).type,
        wbits=wbits, aq_max=float(aq_max), kv_bits=kv_bits, tpg=tpg,
        lora_i8=lora_i8)

    grid = (L, N_TILES // tpg)
    out, kc, vc, ks, vs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # pos
            pl.BlockSpec(memory_space=pltpu.SMEM),            # xs
            pl.BlockSpec((B, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),            # h
            pl.BlockSpec((H, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),            # head mask
            pl.BlockSpec((1, tpg, dk, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # wt
            pl.BlockSpec((1, tpg, 1, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # ws
            pl.BlockSpec((1, tpg, 1, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # bias
            pl.BlockSpec((1, tpg, d, r),
                         lambda l, t: (l, t if tpg > 1 else _at_idx(t),
                                       0, 0),
                         memory_space=pltpu.VMEM),            # at
            pl.BlockSpec((1, tpg, r, d),
                         lambda l, t: (l, t if tpg > 1 else _bt_idx(t),
                                       0, 0),
                         memory_space=pltpu.VMEM),            # bt
            pl.BlockSpec(memory_space=pltpu.SMEM),            # at_s (L, NT)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # bt_s (L, NT)
            pl.BlockSpec((1, 4, d), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),            # ln
            pl.BlockSpec(memory_space=pltpu.ANY),             # kc
            pl.BlockSpec(memory_space=pltpu.ANY),             # vc
            pl.BlockSpec(memory_space=pltpu.ANY),             # ksc
            pl.BlockSpec(memory_space=pltpu.ANY),             # vsc
        ],
        out_specs=(
            pl.BlockSpec((B, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((L, B, Tc, dc), jnp.int8),
            jax.ShapeDtypeStruct((L, B, Tc, dc), jnp.int8),
            jax.ShapeDtypeStruct((L, Tc, 128), jnp.float32),
            jax.ShapeDtypeStruct((L, Tc, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, B, d), jnp.float32),    # qkv_s
            pltpu.VMEM((B, d), jnp.int8),          # qx_s
            pltpu.VMEM((B, d), jnp.float32),       # hn2_s
            pltpu.VMEM((4, B, d), jnp.float32),    # g_s
            pltpu.VMEM((B, d), jnp.int32),         # acc_s
            pltpu.VMEM((2, B, r), jnp.float32),    # xam_s
            pltpu.VMEM((2, B, tbp, dc), jnp.int8),  # kbuf
            pltpu.VMEM((2, B, tbp, dc), jnp.int8),  # vbuf
            pltpu.VMEM((2, tbp, 128), jnp.float32),  # ksbuf
            pltpu.VMEM((2, tbp, 128), jnp.float32),  # vsbuf
            pltpu.VMEM((B, tbp, dc), jnp.int8),    # krbuf (recent prefetch)
            pltpu.VMEM((B, tbp, dc), jnp.int8),    # vrbuf
            pltpu.VMEM((tbp, 128), jnp.float32),   # ksrbuf
            pltpu.VMEM((tbp, 128), jnp.float32),   # vsrbuf
            pltpu.VMEM((B, 8, dc), jnp.int8),      # rmwk
            pltpu.VMEM((B, 8, dc), jnp.int8),      # rmwv
            pltpu.VMEM((8, 128), jnp.float32),     # rmwks
            pltpu.VMEM((8, 128), jnp.float32),     # rmwvs
            pltpu.SemaphoreType.DMA((2, 2)),       # sem (KV)
            pltpu.SemaphoreType.DMA((2, 2)),       # ssem (scales)
            pltpu.SemaphoreType.DMA((2,)),         # rsem
            pltpu.SemaphoreType.DMA((2,)),         # rssem
            pltpu.SemaphoreType.DMA((4,)),         # rpsem (recent prefetch)
        ],
        input_output_aliases={12: 1, 13: 2, 14: 3, 15: 4},
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1), mw.xs,
      h.astype(jnp.float32), hm, mw.wt, mw.ws, mw.bias,
      mw.at if lora_i8 else mw.at.astype(ldt),
      mw.bt if lora_i8 else mw.bt.astype(ldt),
      mw.at_s, mw.bt_s, mw.ln,
      k_cache, v_cache, k_scale, v_scale)

    return out, kc, vc, ks, vs


def mega_decode_step_cb(h, mw: MegaWeights, k_main, v_main, ks_main,
                        vs_main, k_rec, v_rec, ks_rec, vs_rec, lengths,
                        rpos, *, n_head: int, head_dim: int,
                        has_lora: bool, eps: float = 1e-5, tbp: int = 64,
                        act_dtype=jnp.bfloat16, aq_max: float = 127.0,
                        kv_bits: int = 8, tiles_per_step: int = 1,
                        interpret: bool = False):
    """Continuous-batching megakernel step: per-slot prefixes, two-level KV.

    k_main/v_main (L, B, Tc, dc) + ks_main/vs_main (L, Tc, 128): each
    slot's prefix up to `lengths[b]` (READ-ONLY). k_rec/v_rec
    (L, B, Tr, dc) + ks_rec/vs_rec (L, Tr, 128): the chunk-local recent
    buffer, DONATED and appended at the batch-uniform `rpos` (step index
    within the chunk) via the same 8-row RMW as the shared kernel. Merge
    the recent rows into the main caches once per chunk with
    `cb_merge_recent` (XLA scatters into the big caches cost ~300 µs per
    token when done per step — the round-4 measurement motivating this
    design). Returns (h_out, k_rec, v_rec, ks_rec, vs_rec).
    """
    B, d = h.shape
    L = mw.wt.shape[0]
    r = mw.at.shape[3]
    D, H = head_dim, n_head
    assert H * D == d
    if d % 128:
        raise ValueError(f"mega_decode_step_cb needs d % 128 == 0; got {d}")
    if kv_bits not in (8, 4):
        raise ValueError(f"kv_bits must be 8 or 4; got {kv_bits}")
    dc = d if kv_bits == 8 else d // 2
    if kv_bits == 4 and dc % 128 and not interpret:
        raise ValueError(f"kv_bits=4 needs d % 256 == 0; got d={d}")
    Tc = k_main.shape[2]
    Tr = k_rec.shape[2]
    assert k_main.shape == (L, B, Tc, dc), (k_main.shape, dc)
    assert k_rec.shape == (L, B, Tr, dc), (k_rec.shape, dc)
    assert ks_main.shape == (L, Tc, 128), ks_main.shape
    assert ks_rec.shape == (L, Tr, 128), ks_rec.shape
    assert lengths.shape == (B,), lengths.shape
    tbp = min(tbp, Tc, Tr)
    while (Tc % tbp or Tr % tbp) and tbp > 8:
        tbp -= 8
    assert Tc % tbp == 0 and Tr % tbp == 0 and tbp % 8 == 0, (Tc, Tr, tbp)
    if Tr != tbp:
        raise ValueError(
            f"per-slot recent buffer must be ONE stream block (Tr == tbp); "
            f"got Tr={Tr}, tbp={tbp} — cap the chunk size at the engine's "
            "mega_tbp (the kernel prefetches the single recent block under "
            "the main stream)")
    sm_scale = 1.0 / math.sqrt(D)
    ldt = mw.at.dtype
    dk = mw.wt.shape[2]
    wbits = 4 if dk == d // 2 else 8

    hm = (jnp.arange(d) // D == jnp.arange(H)[:, None]).astype(jnp.float32)
    lengths = jnp.asarray(lengths, jnp.int32)
    maxpos = jnp.max(lengths).reshape(1)

    tpg = int(tiles_per_step)
    if N_TILES % tpg or (tpg > 1 and LORA_BANKS != "full"):
        raise ValueError(
            f"tiles_per_step={tpg} must divide {N_TILES} and requires "
            "LORA_BANKS='full' (compact index maps are per single tile)")
    lora_i8 = mw.at.dtype == jnp.int8
    kernel = functools.partial(
        _mega_kernel_kv8, eps=eps, sm_scale=sm_scale, tbp=tbp, B=B, H=H,
        has_lora=has_lora, act_dtype=jnp.dtype(act_dtype).type,
        wbits=wbits, aq_max=float(aq_max), kv_bits=kv_bits, per_slot=True,
        tpg=tpg, lora_i8=lora_i8)

    grid = (L, N_TILES // tpg)
    out, kr, vr, ksr, vsr = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # lengths (B,)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # maxpos (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # rpos (1,)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # xs
            pl.BlockSpec((B, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),            # h
            pl.BlockSpec((H, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),            # head mask
            pl.BlockSpec((1, tpg, dk, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # wt
            pl.BlockSpec((1, tpg, 1, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # ws
            pl.BlockSpec((1, tpg, 1, d), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),            # bias
            pl.BlockSpec((1, tpg, d, r),
                         lambda l, t: (l, t if tpg > 1 else _at_idx(t),
                                       0, 0),
                         memory_space=pltpu.VMEM),            # at
            pl.BlockSpec((1, tpg, r, d),
                         lambda l, t: (l, t if tpg > 1 else _bt_idx(t),
                                       0, 0),
                         memory_space=pltpu.VMEM),            # bt
            pl.BlockSpec(memory_space=pltpu.SMEM),            # at_s (L, NT)
            pl.BlockSpec(memory_space=pltpu.SMEM),            # bt_s (L, NT)
            pl.BlockSpec((1, 4, d), lambda l, t: (l, 0, 0),
                         memory_space=pltpu.VMEM),            # ln
            pl.BlockSpec(memory_space=pltpu.ANY),             # k_main (ro)
            pl.BlockSpec(memory_space=pltpu.ANY),             # v_main (ro)
            pl.BlockSpec(memory_space=pltpu.ANY),             # ks_main (ro)
            pl.BlockSpec(memory_space=pltpu.ANY),             # vs_main (ro)
            pl.BlockSpec(memory_space=pltpu.ANY),             # k_rec
            pl.BlockSpec(memory_space=pltpu.ANY),             # v_rec
            pl.BlockSpec(memory_space=pltpu.ANY),             # ks_rec
            pl.BlockSpec(memory_space=pltpu.ANY),             # vs_rec
        ],
        out_specs=(
            pl.BlockSpec((B, d), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),            # h_out
            pl.BlockSpec(memory_space=pltpu.ANY),             # k_rec out
            pl.BlockSpec(memory_space=pltpu.ANY),             # v_rec out
            pl.BlockSpec(memory_space=pltpu.ANY),             # ks_rec out
            pl.BlockSpec(memory_space=pltpu.ANY),             # vs_rec out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((L, B, Tr, dc), jnp.int8),
            jax.ShapeDtypeStruct((L, B, Tr, dc), jnp.int8),
            jax.ShapeDtypeStruct((L, Tr, 128), jnp.float32),
            jax.ShapeDtypeStruct((L, Tr, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((3, B, d), jnp.float32),    # qkv_s
            pltpu.VMEM((B, d), jnp.int8),          # qx_s
            pltpu.VMEM((B, d), jnp.float32),       # hn2_s
            pltpu.VMEM((4, B, d), jnp.float32),    # g_s
            pltpu.VMEM((B, d), jnp.int32),         # acc_s
            pltpu.VMEM((2, B, r), jnp.float32),    # xam_s
            pltpu.VMEM((2, B, tbp, dc), jnp.int8),  # kbuf
            pltpu.VMEM((2, B, tbp, dc), jnp.int8),  # vbuf
            pltpu.VMEM((2, tbp, 128), jnp.float32),  # ksbuf
            pltpu.VMEM((2, tbp, 128), jnp.float32),  # vsbuf
            pltpu.VMEM((B, tbp, dc), jnp.int8),    # krbuf (recent prefetch)
            pltpu.VMEM((B, tbp, dc), jnp.int8),    # vrbuf
            pltpu.VMEM((tbp, 128), jnp.float32),   # ksrbuf
            pltpu.VMEM((tbp, 128), jnp.float32),   # vsrbuf
            pltpu.VMEM((B, 8, dc), jnp.int8),      # rmwk
            pltpu.VMEM((B, 8, dc), jnp.int8),      # rmwv
            pltpu.VMEM((8, 128), jnp.float32),     # rmwks
            pltpu.VMEM((8, 128), jnp.float32),     # rmwvs
            pltpu.SemaphoreType.DMA((2, 2)),       # sem (KV)
            pltpu.SemaphoreType.DMA((2, 2)),       # ssem (scales)
            pltpu.SemaphoreType.DMA((2,)),         # rsem
            pltpu.SemaphoreType.DMA((2,)),         # rssem
            pltpu.SemaphoreType.DMA((4,)),         # rpsem (recent prefetch)
        ],
        input_output_aliases={18: 1, 19: 2, 20: 3, 21: 4},
        interpret=interpret,
    )(lengths, maxpos, jnp.asarray(rpos, jnp.int32).reshape(1), mw.xs,
      h.astype(jnp.float32), hm, mw.wt, mw.ws, mw.bias,
      mw.at if lora_i8 else mw.at.astype(ldt),
      mw.bt if lora_i8 else mw.bt.astype(ldt),
      mw.at_s, mw.bt_s, mw.ln,
      k_main, v_main, ks_main, vs_main, k_rec, v_rec, ks_rec, vs_rec)

    return out, kr, vr, ksr, vsr


def cb_merge_recent(kc, vc, ksc, vsc, k_rec, v_rec, ks_rec, vs_rec,
                    lengths, k: int):
    """Merge the chunk's `k` recent rows into the main caches, per slot.

    One (L, 1, k, dc) dynamic_update_slice per slot per cache — a few
    hundred µs total, paid ONCE per chunk instead of per token. Inactive
    slots merge garbage at their (stale) position — harmless: their rows
    are never attended and prefill overwrites on slot reuse.
    """
    L, B, T, dc = kc.shape
    k = min(k, T)
    for b in range(B):
        row = jnp.clip(lengths[b], 0, T - k)
        kc = jax.lax.dynamic_update_slice(
            kc, k_rec[:, b:b + 1, :k], (0, b, row, 0))
        vc = jax.lax.dynamic_update_slice(
            vc, v_rec[:, b:b + 1, :k], (0, b, row, 0))
        ksc = jax.lax.dynamic_update_slice(
            ksc, ks_rec[:, :k, b:b + 1], (0, row, b))
        vsc = jax.lax.dynamic_update_slice(
            vsc, vs_rec[:, :k, b:b + 1], (0, row, b))
    return kc, vc, ksc, vsc
