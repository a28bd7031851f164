"""Megakernel decode step vs the unfused int8_xla path (interpret mode).

The whole-model kernel (`ops/mega_decode.py`) must reproduce the per-op XLA
serving path (`models/inference.py::infer_forward_unrolled` with
weight_format="int8_xla" + packed KV caches) step by step: same int8 grids,
same attention math, caches updated identically.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig
from llm_qat_tpu.models.inference import (
    infer_forward_unrolled,
    init_layer_caches,
    quantize_for_inference,
)
from llm_qat_tpu.models.sp_model import init_sp_params
from llm_qat_tpu.ops.mega_decode import (
    N_TILES,
    mega_decode_step,
    pack_mega_weights,
)
from llm_qat_tpu.train.calibration_manager import calibrate_weight_quantizers

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set



def _mega_config(rank=4):
    return SPModelConfig(
        model=GPT2Config(vocab_size=256, n_positions=128, n_embd=128,
                         n_layer=2, n_head=2),
        quant=QuantConfig(
            bit_widths=(4, 8, 32),
            quantizer_per_bit={8: "minmax"},
            per_channel=False,
            lora_rank_per_bit={b: rank for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 2 * rank for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="float32",
    )


def _setup(rank):
    cfg = _mega_config(rank)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    # f32 tree: the megakernel is bit-exact vs the unfused path (both paths
    # see identical pre-quantization activations). The production bf16 tree
    # differs only by bf16 input rounding flipping int8 codes at grid
    # boundaries — covered at the engine level by greedy-token equality.
    iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.float32,
                                     weight_format="int8_xla")
    static = iparams.pop("_static")
    return cfg, iparams, static


def _as_rowmajor(caches, head_dim):
    """Reference packed tuple caches -> mega (L, B, T, d) row layout."""
    from llm_qat_tpu.ops.decode_attention import unpack_kv

    def conv(c):  # (B, H, Tp, P*D) -> (B, T, H*D)
        u = unpack_kv(c, head_dim)  # (B, H, T, D)
        return u.transpose(0, 2, 1, 3).reshape(u.shape[0], u.shape[2], -1)

    ks = jnp.stack([conv(c) for c in caches[0::2]])
    vs = jnp.stack([conv(c) for c in caches[1::2]])
    return ks, vs


@pytest.mark.parametrize("rank", [4, 0])
def test_matches_unfused_path(rank):
    cfg, iparams, static = _setup(rank)
    m = cfg.model
    B, steps = 3, 5
    T_max = 128

    mw = pack_mega_weights(iparams, cfg)
    assert mw.wt.shape == (m.n_layer, N_TILES, m.n_embd, m.n_embd)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, m.vocab_size, (B, steps)))

    ref_caches = init_layer_caches(cfg, B, T_max, kv_layout="packed")
    kc = jnp.zeros((m.n_layer, B, T_max, m.n_embd), jnp.bfloat16)
    vc = jnp.zeros_like(kc)

    for step in range(steps):
        ids = toks[:, step:step + 1]
        pos = jnp.int32(step)
        want, ref_caches, _ = infer_forward_unrolled(
            iparams, ids, cfg, ref_caches, pos, static=static,
            attn_interpret=True)

        h = (iparams["wte"][ids[:, 0]]
             + iparams["wpe"][step][None]).astype(jnp.float32)
        h_out, kc, vc = mega_decode_step(
            h, mw, kc, vc, pos, n_head=m.n_head, head_dim=m.head_dim,
            has_lora=rank > 0, act_dtype=jnp.float32, interpret=True)

        # trunk parity: apply ln_f + head outside the kernel (same as engine)
        from llm_qat_tpu.models.inference import _ln

        hf = _ln(h_out[:, None, :], iparams["ln_f"]["g"],
                 iparams["ln_f"]["b"], m.layer_norm_epsilon)
        got = jnp.dot(hf, iparams["wte"].T.astype(hf.dtype),
                      preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"step {step}")

        want_k, want_v = _as_rowmajor(ref_caches, m.head_dim)
        np.testing.assert_allclose(
            np.asarray(kc, jnp.float32), np.asarray(want_k, jnp.float32),
            rtol=1e-6, atol=1e-6, err_msg=f"k cache step {step}")
        np.testing.assert_allclose(
            np.asarray(vc, jnp.float32), np.asarray(want_v, jnp.float32),
            rtol=1e-6, atol=1e-6, err_msg=f"v cache step {step}")


def test_bf16_tree_drop_in():
    """Production bf16 tree: the kernel's explicit RNE-to-bf16 round-trips
    at the unfused path's cast points make it a drop-in — logits and caches
    match the unfused path exactly on the same backend."""
    cfg = _mega_config(4)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.bfloat16,
                                     weight_format="int8_xla")
    static = iparams.pop("_static")
    m = cfg.model
    B, steps, T_max = 3, 4, 128
    mw = pack_mega_weights(iparams, cfg)

    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, m.vocab_size, (B, steps)))
    ref_caches = init_layer_caches(cfg, B, T_max, kv_layout="packed")
    kc = jnp.zeros((m.n_layer, B, T_max, m.n_embd), jnp.bfloat16)
    vc = jnp.zeros_like(kc)
    wte = iparams["wte"]

    for step in range(steps):
        ids = toks[:, step:step + 1]
        pos = jnp.int32(step)
        want, ref_caches, _ = infer_forward_unrolled(
            iparams, ids, cfg, ref_caches, pos, static=static,
            attn_interpret=True)
        h = (wte[ids[:, 0]]
             + iparams["wpe"][step][None].astype(wte.dtype)
             ).astype(jnp.float32)
        h_out, kc, vc = mega_decode_step(
            h, mw, kc, vc, pos, n_head=m.n_head, head_dim=m.head_dim,
            has_lora=True, interpret=True)

        from llm_qat_tpu.models.inference import _ln

        hf = _ln(h_out[:, None, :].astype(jnp.bfloat16), iparams["ln_f"]["g"],
                 iparams["ln_f"]["b"], m.layer_norm_epsilon)
        got = jnp.dot(hf, wte.T, preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"step {step}")
        want_k, want_v = _as_rowmajor(ref_caches, m.head_dim)
        np.testing.assert_array_equal(np.asarray(kc, np.float32),
                                      np.asarray(want_k, np.float32))
        np.testing.assert_array_equal(np.asarray(vc, np.float32),
                                      np.asarray(want_v, np.float32))


def test_int4_matches_unfused_path():
    """int4_xla megakernel (nibble-packed tiles, split s8 dots) vs the
    unfused `_int4_dot` serving path — bit-exact on an f32 tree."""
    cfg = _mega_config(4)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    iparams = quantize_for_inference(params, cfg, 4, dtype=jnp.float32,
                                     weight_format="int4_xla")
    static = iparams.pop("_static")
    m = cfg.model
    B, steps, T_max = 2, 4, 128
    mw = pack_mega_weights(iparams, cfg)
    assert mw.wt.shape == (m.n_layer, N_TILES, m.n_embd // 2, m.n_embd)

    rng = np.random.default_rng(2)
    toks = jnp.asarray(rng.integers(0, m.vocab_size, (B, steps)))
    ref_caches = init_layer_caches(cfg, B, T_max, kv_layout="packed")
    kc = jnp.zeros((m.n_layer, B, T_max, m.n_embd), jnp.bfloat16)
    vc = jnp.zeros_like(kc)

    for step in range(steps):
        ids = toks[:, step:step + 1]
        pos = jnp.int32(step)
        want, ref_caches, _ = infer_forward_unrolled(
            iparams, ids, cfg, ref_caches, pos, static=static,
            attn_interpret=True)
        h = (iparams["wte"][ids[:, 0]]
             + iparams["wpe"][step][None]).astype(jnp.float32)
        h_out, kc, vc = mega_decode_step(
            h, mw, kc, vc, pos, n_head=m.n_head, head_dim=m.head_dim,
            has_lora=True, act_dtype=jnp.float32, aq_max=7.0,
            interpret=True)
        from llm_qat_tpu.models.inference import _ln

        hf = _ln(h_out[:, None, :], iparams["ln_f"]["g"],
                 iparams["ln_f"]["b"], m.layer_norm_epsilon)
        got = jnp.dot(hf, iparams["wte"].T.astype(hf.dtype),
                      preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"step {step}")


class TestEngineIntegration:
    """kv_layout="mega" InferenceEngine == dense engine token-for-token."""

    def _engines(self, rank=4, weight_format="int8_xla", bits=8, **kw):
        from llm_qat_tpu.models.inference import InferenceEngine

        cfg = _mega_config(rank)
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        params = calibrate_weight_quantizers(params, cfg)
        dense = InferenceEngine(params, cfg, bits=bits, max_batch=3,
                                max_len=96, dtype=jnp.float32,
                                weight_format=weight_format,
                                kv_layout="dense", **kw)
        mega = InferenceEngine(params, cfg, bits=bits, max_batch=3,
                               max_len=96, dtype=jnp.float32,
                               weight_format=weight_format,
                               kv_layout="mega", attn_interpret=True, **kw)
        return cfg, dense, mega

    def test_int4_engine_matches_dense(self):
        cfg, dense, mega = self._engines(weight_format="int4_xla", bits=4)
        rng = np.random.default_rng(3)
        for T0 in (8, 5):
            prompt = rng.integers(0, cfg.model.vocab_size, (2, T0))
            a = np.asarray(dense.generate(prompt, max_new_tokens=6,
                                          do_sample=False))
            b = np.asarray(mega.generate(prompt, max_new_tokens=6,
                                         do_sample=False))
            np.testing.assert_array_equal(b, a, err_msg=f"T0={T0}")

    def test_greedy_matches_dense(self):
        cfg, dense, mega = self._engines()
        rng = np.random.default_rng(0)
        for T0 in (8, 5):
            prompt = rng.integers(0, cfg.model.vocab_size, (2, T0))
            a = np.asarray(dense.generate(prompt, max_new_tokens=6,
                                          do_sample=False))
            b = np.asarray(mega.generate(prompt, max_new_tokens=6,
                                         do_sample=False))
            np.testing.assert_array_equal(b, a, err_msg=f"T0={T0}")

    def test_sampled_matches_dense(self):
        cfg, dense, mega = self._engines()
        rng = np.random.default_rng(1)
        prompt = rng.integers(0, cfg.model.vocab_size, (2, 6))
        r = jax.random.PRNGKey(9)
        a = np.asarray(dense.generate(prompt, max_new_tokens=5,
                                      do_sample=True, temperature=0.8,
                                      top_k=7, rng=r))
        b = np.asarray(mega.generate(prompt, max_new_tokens=5,
                                     do_sample=True, temperature=0.8,
                                     top_k=7, rng=r))
        np.testing.assert_array_equal(b, a)

    def test_int8_head_matches_dense(self):
        cfg, dense, mega = self._engines(lm_head_int8=True)
        rng = np.random.default_rng(2)
        prompt = rng.integers(0, cfg.model.vocab_size, (3, 7))
        a = np.asarray(dense.generate(prompt, max_new_tokens=5,
                                      do_sample=False))
        b = np.asarray(mega.generate(prompt, max_new_tokens=5,
                                     do_sample=False))
        np.testing.assert_array_equal(b, a)

    def test_int4_head_matches_dense(self):
        """r5 decode diet: nibble-packed int4 LM head — mega == dense
        token-for-token (both engines share the `_lm_head` int4 path)."""
        cfg, dense, mega = self._engines(lm_head_bits=4)
        rng = np.random.default_rng(4)
        prompt = rng.integers(0, cfg.model.vocab_size, (3, 7))
        a = np.asarray(dense.generate(prompt, max_new_tokens=5,
                                      do_sample=False))
        b = np.asarray(mega.generate(prompt, max_new_tokens=5,
                                     do_sample=False))
        np.testing.assert_array_equal(b, a)

    def test_rejects_unpadded_width(self):
        from llm_qat_tpu.models.inference import InferenceEngine

        cfg = SPModelConfig(
            model=GPT2Config(vocab_size=128, n_positions=64, n_embd=64,
                             n_layer=1, n_head=2),
            quant=QuantConfig(bit_widths=(8, 32),
                              quantizer_per_bit={8: "minmax"},
                              per_channel=False),
            compute_dtype="float32",
        )
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        params = calibrate_weight_quantizers(params, cfg)
        with pytest.raises(ValueError, match="128"):
            InferenceEngine(params, cfg, bits=8, weight_format="int8_xla",
                            kv_layout="mega", dtype=jnp.float32)


def test_int8_lora_banks_match_float():
    """r5 decode diet: int8 LoRA banks (codes + per-tile scalar scales in
    SMEM, half the bank HBM traffic). The codes re-grid losslessly
    (`quantize_for_inference` emits `lora_A_i8` only on the minmax grid);
    the kernel applies the scale AFTER the dot, so outputs agree with the
    float banks to f32 rounding (not bit-exact — the products round at a
    different point)."""
    cfg, iparams, static = _setup(rank=4)
    m = cfg.model
    assert "lora_A_i8" in iparams["blocks"]["c_attn"]
    mw_f = pack_mega_weights(iparams, cfg, lora_int8=False)
    mw_i = pack_mega_weights(iparams, cfg, lora_int8=True)
    assert mw_i.at.dtype == jnp.int8
    assert mw_f.at.dtype == jnp.float32
    # the scalar-dequantized codes reproduce the float banks exactly
    np.testing.assert_array_equal(
        np.asarray(mw_i.at, np.float32)
        * np.asarray(mw_i.at_s)[:, :, None, None],
        np.asarray(mw_f.at))
    np.testing.assert_array_equal(
        np.asarray(mw_i.bt, np.float32)
        * np.asarray(mw_i.bt_s)[:, :, None, None],
        np.asarray(mw_f.bt))

    rng = np.random.default_rng(7)
    B, steps, T_max = 2, 4, 64
    toks = jnp.asarray(rng.integers(0, m.vocab_size, (B, steps)))
    kc_f = jnp.zeros((m.n_layer, B, T_max, m.n_embd), jnp.bfloat16)
    vc_f = jnp.zeros_like(kc_f)
    kc_i, vc_i = kc_f, vc_f
    k8_f = jnp.zeros((m.n_layer, B, T_max, m.n_embd), jnp.int8)
    v8_f = jnp.zeros_like(k8_f)
    ks_f = jnp.ones((m.n_layer, T_max, 128), jnp.float32)
    vs_f = jnp.ones_like(ks_f)
    k8_i, v8_i, ks_i, vs_i = k8_f, v8_f, ks_f, vs_f
    from llm_qat_tpu.ops.mega_decode import mega_decode_step_kv8

    for step in range(steps):
        h = (iparams["wte"][toks[:, step]]
             + iparams["wpe"][step][None]).astype(jnp.float32)
        a, kc_f, vc_f = mega_decode_step(
            h, mw_f, kc_f, vc_f, jnp.int32(step), n_head=m.n_head,
            head_dim=m.head_dim, has_lora=True, act_dtype=jnp.float32,
            interpret=True)
        b, kc_i, vc_i = mega_decode_step(
            h, mw_i, kc_i, vc_i, jnp.int32(step), n_head=m.n_head,
            head_dim=m.head_dim, has_lora=True, act_dtype=jnp.float32,
            interpret=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-5, atol=1e-5,
                                   err_msg=f"kv16 step {step}")
        a8, k8_f, v8_f, ks_f, vs_f = mega_decode_step_kv8(
            h, mw_f, k8_f, v8_f, ks_f, vs_f, jnp.int32(step),
            n_head=m.n_head, head_dim=m.head_dim, has_lora=True,
            act_dtype=jnp.float32, kv_bits=8, interpret=True)
        b8, k8_i, v8_i, ks_i, vs_i = mega_decode_step_kv8(
            h, mw_i, k8_i, v8_i, ks_i, vs_i, jnp.int32(step),
            n_head=m.n_head, head_dim=m.head_dim, has_lora=True,
            act_dtype=jnp.float32, kv_bits=8, interpret=True)
        np.testing.assert_allclose(np.asarray(b8), np.asarray(a8),
                                   rtol=2e-5, atol=1e-5,
                                   err_msg=f"kv8 step {step}")
    np.testing.assert_allclose(np.asarray(kc_i, jnp.float32),
                               np.asarray(kc_f, jnp.float32),
                               rtol=2e-5, atol=1e-5)
    # int8 KV codes may flip ±1 where the f32 rounding moved a value
    # across a grid boundary; require near-total agreement
    agree = (np.asarray(k8_i) == np.asarray(k8_f)).mean()
    assert agree > 0.999, agree


def test_lm_head_int4_math():
    """`_lm_head` with the nibble-packed head reproduces the manual
    dequantized projection exactly (integer dots, factored scales)."""
    from llm_qat_tpu.models.inference import _lm_head
    from llm_qat_tpu.models import init_sp_params as _init

    cfg = _mega_config(0)
    params = init_sp_params(jax.random.PRNGKey(3), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    ip = quantize_for_inference(params, cfg, 8, dtype=jnp.float32,
                                weight_format="int8_xla", lm_head_bits=4)
    ip.pop("_static")
    assert "head_i4" in ip and "head_i8" not in ip
    d = cfg.model.n_embd
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(2, 3, d)), jnp.float32)
    got = np.asarray(_lm_head(ip, h))
    # manual reference: unpack codes, integer dot, factored scales
    p = np.asarray(ip["head_i4"]).astype(np.int32)
    lo = ((p << 28) >> 28).astype(np.int32)
    hi = (p >> 4).astype(np.int32)
    codes = np.concatenate([lo, hi], axis=1)  # (V, d)
    hf = np.asarray(h, np.float32)
    xs = np.maximum(np.abs(hf).max(axis=(1, 2), keepdims=True), 1e-8) / 127.0
    qh = np.clip(np.round(hf / xs), -127, 127).astype(np.int32)
    acc = np.einsum("bsd,vd->bsv", qh, codes)
    want = acc * xs * np.asarray(ip["head_s"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # codes are the round-to-nearest ±7 grid of wte
    wte = np.asarray(params["wte"], np.float32)
    s = np.maximum(np.abs(wte).max(axis=1), 1e-8) / 7.0
    np.testing.assert_array_equal(
        codes, np.clip(np.round(wte / s[:, None]), -7, 7).astype(np.int32))


def test_pack_rejects_non_int8_tree():
    cfg = _mega_config(0)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    dense = quantize_for_inference(params, cfg, 8, dtype=jnp.bfloat16)
    dense.pop("_static")
    with pytest.raises(ValueError, match="int8_xla"):
        pack_mega_weights(dense, cfg)


def test_kv8_close_to_f32_kv_and_caches_roundtrip():
    """int8-KV megakernel (codes + per-row scales, all-s8 attention dots):
    hidden states stay within the expected 8-bit attention-quantization
    envelope of the f32-KV kernel, and the stored codes dequantize back to
    the f32 cache rows within half a scale step."""
    from llm_qat_tpu.ops.mega_decode import mega_decode_step_kv8
    from llm_qat_tpu.train.calibration_manager import (
        calibrate_input_quantizers,
    )

    cfg = _mega_config(4)
    m = cfg.model
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    rng = np.random.default_rng(0)
    params = calibrate_input_quantizers(
        params, cfg,
        [jnp.asarray(rng.integers(0, 256, (2, 32))) for _ in range(2)])
    ip = quantize_for_inference(params, cfg, 8, dtype=jnp.float32,
                                weight_format="int8_xla")
    ip.pop("_static")
    mw = pack_mega_weights(ip, cfg)
    B, T, steps = 3, 128, 5

    kc = jnp.zeros((m.n_layer, B, T, m.n_embd), jnp.float32)
    vc = jnp.zeros_like(kc)
    kc8 = jnp.zeros((m.n_layer, B, T, m.n_embd), jnp.int8)
    vc8 = jnp.zeros_like(kc8)
    ks = jnp.ones((m.n_layer, T, 128), jnp.float32)
    vs = jnp.ones_like(ks)
    toks = jnp.asarray(rng.integers(0, 256, (B, steps)))
    for step in range(steps):
        h = (ip["wte"][toks[:, step]]
             + ip["wpe"][step][None]).astype(jnp.float32)
        ha, kc, vc = mega_decode_step(
            h, mw, kc, vc, jnp.int32(step), n_head=m.n_head,
            head_dim=m.head_dim, has_lora=True, act_dtype=jnp.float32,
            interpret=True)
        hb, kc8, vc8, ks, vs = mega_decode_step_kv8(
            h, mw, kc8, vc8, ks, vs, jnp.int32(step), n_head=m.n_head,
            head_dim=m.head_dim, has_lora=True, act_dtype=jnp.float32,
            interpret=True)
        scale = float(jnp.max(jnp.abs(ha)))
        assert float(jnp.max(jnp.abs(ha - hb))) < 0.05 * max(scale, 1.0), (
            step, float(jnp.max(jnp.abs(ha - hb))), scale)
    # cache round-trip at LAYER 0, row 0 — the only slot written from
    # IDENTICAL inputs on both paths (deeper layers and later rows reflect
    # the accumulated ~8-bit attention divergence of the hidden states,
    # not quantization error)
    deq = np.asarray(kc8, np.float32)[0, :, 0] \
        * np.asarray(ks)[0, 0, :B, None]  # (B, d) * (B, 1): lanes = batch
    want = np.asarray(kc, np.float32)[0, :, 0]
    step_sz = np.asarray(ks)[0, 0, :B, None]
    assert np.all(np.abs(deq - want) <= 0.51 * step_sz)


def test_engine_kv8_generate_runs():
    """kv_bits=8 engine path: greedy generate is deterministic, shaped
    right, and mostly agrees with the KV16 mega engine (8-bit attention
    noise can flip near-tie argmaxes on a random model, so exact equality
    is not asserted)."""
    from llm_qat_tpu.models.inference import InferenceEngine

    cfg = _mega_config(4)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    kw = dict(bits=8, max_batch=2, max_len=96, dtype=jnp.float32,
              weight_format="int8_xla", kv_layout="mega",
              attn_interpret=True)
    e16 = InferenceEngine(params, cfg, **kw)
    e8 = InferenceEngine(params, cfg, kv_bits=8, **kw)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, cfg.model.vocab_size, (2, 7))
    a = np.asarray(e8.generate(prompt, max_new_tokens=6, do_sample=False))
    b = np.asarray(e8.generate(prompt, max_new_tokens=6, do_sample=False))
    c = np.asarray(e16.generate(prompt, max_new_tokens=6, do_sample=False))
    assert a.shape == (2, 13)
    np.testing.assert_array_equal(a, b)  # deterministic
    assert (a[:, :7] == prompt).all()
    assert (a == c).mean() > 0.5  # prompt columns alone give ~0.54


def test_kv4_noise_envelope_and_caches_roundtrip():
    """int4-KV megakernel (±7 nibble codes packed along lane halves +
    per-row scales): hidden states stay within the 4-bit attention noise
    envelope of the f32-KV kernel, and the packed codes dequantize back to
    the f32 cache rows within half a (coarse) scale step. Realizes the
    reference's KV4 axis (W4A8KV4 / W8A8KV4, bit_configurations.py:4)."""
    from llm_qat_tpu.ops.mega_decode import mega_decode_step_kv8
    from llm_qat_tpu.train.calibration_manager import (
        calibrate_input_quantizers,
    )

    cfg = _mega_config(4)
    m = cfg.model
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    rng = np.random.default_rng(0)
    params = calibrate_input_quantizers(
        params, cfg,
        [jnp.asarray(rng.integers(0, 256, (2, 32))) for _ in range(2)])
    ip = quantize_for_inference(params, cfg, 8, dtype=jnp.float32,
                                weight_format="int8_xla")
    ip.pop("_static")
    mw = pack_mega_weights(ip, cfg)
    B, T, steps = 3, 128, 5
    d = m.n_embd

    kc = jnp.zeros((m.n_layer, B, T, d), jnp.float32)
    vc = jnp.zeros_like(kc)
    kc4 = jnp.zeros((m.n_layer, B, T, d // 2), jnp.int8)
    vc4 = jnp.zeros_like(kc4)
    ks = jnp.ones((m.n_layer, T, 128), jnp.float32)
    vs = jnp.ones_like(ks)
    toks = jnp.asarray(rng.integers(0, 256, (B, steps)))
    for step in range(steps):
        h = (ip["wte"][toks[:, step]]
             + ip["wpe"][step][None]).astype(jnp.float32)
        ha, kc, vc = mega_decode_step(
            h, mw, kc, vc, jnp.int32(step), n_head=m.n_head,
            head_dim=m.head_dim, has_lora=True, act_dtype=jnp.float32,
            interpret=True)
        hb, kc4, vc4, ks, vs = mega_decode_step_kv8(
            h, mw, kc4, vc4, ks, vs, jnp.int32(step), n_head=m.n_head,
            head_dim=m.head_dim, has_lora=True, act_dtype=jnp.float32,
            kv_bits=4, interpret=True)
        scale = float(jnp.max(jnp.abs(ha)))
        # 4-bit attention: looser envelope than the kv8 test's 5%
        assert float(jnp.max(jnp.abs(ha - hb))) < 0.15 * max(scale, 1.0), (
            step, float(jnp.max(jnp.abs(ha - hb))), scale)
    # layer-0 row-0 round-trip (same rationale as the kv8 test): unpack the
    # lane-half nibbles and dequantize with the per-row scale
    packed = np.asarray(kc4, np.int8)[0, :, 0]          # (B, d/2)
    lo = ((packed.astype(np.int32) << 28) >> 28).astype(np.float32)
    hi = (packed.astype(np.int32) >> 4).astype(np.float32)
    codes = np.concatenate([lo, hi], axis=-1)           # (B, d)
    assert np.abs(codes).max() <= 7
    step_sz = np.asarray(ks)[0, 0, :B, None]
    deq = codes * step_sz
    want = np.asarray(kc, np.float32)[0, :, 0]
    assert np.all(np.abs(deq - want) <= 0.51 * step_sz)


def test_engine_kv4_generate_runs():
    """kv_bits=4 engine path: deterministic greedy generate, right shapes,
    prompt preserved (4-bit attention noise makes token-level comparison
    with KV16 meaningless on a random model)."""
    from llm_qat_tpu.models.inference import InferenceEngine

    cfg = _mega_config(4)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    kw = dict(bits=8, max_batch=2, max_len=96, dtype=jnp.float32,
              weight_format="int8_xla", kv_layout="mega",
              attn_interpret=True)
    e4 = InferenceEngine(params, cfg, kv_bits=4, **kw)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, cfg.model.vocab_size, (2, 7))
    a = np.asarray(e4.generate(prompt, max_new_tokens=6, do_sample=False))
    b = np.asarray(e4.generate(prompt, max_new_tokens=6, do_sample=False))
    assert a.shape == (2, 13)
    np.testing.assert_array_equal(a, b)
    assert (a[:, :7] == prompt).all()


def test_cb_per_slot_matches_per_slot_shared_runs():
    """Continuous-batching kernel (`mega_decode_step_cb`): mixed per-slot
    prefix lengths in ONE call must equal running each slot alone through
    the shared-position kv8 kernel (exact: the per-row masks zero the
    over-streamed blocks; VERDICT r3 #6)."""
    from llm_qat_tpu.ops.mega_decode import (
        cb_merge_recent, mega_decode_step_cb, mega_decode_step_kv8,
    )
    from llm_qat_tpu.train.calibration_manager import (
        calibrate_input_quantizers,
    )

    cfg = _mega_config(4)
    m = cfg.model
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    rng = np.random.default_rng(0)
    params = calibrate_input_quantizers(
        params, cfg,
        [jnp.asarray(rng.integers(0, 256, (2, 32))) for _ in range(2)])
    ip = quantize_for_inference(params, cfg, 8, dtype=jnp.float32,
                                weight_format="int8_xla")
    ip.pop("_static")
    mw = pack_mega_weights(ip, cfg)
    B, T, d = 3, 64, m.n_embd
    lengths = np.asarray([5, 0, 9], np.int32)

    # per-slot reference state: advance each slot alone to its length
    kc = jnp.zeros((m.n_layer, B, T, d), jnp.int8)
    vc = jnp.zeros_like(kc)
    ks = jnp.ones((m.n_layer, T, 128), jnp.float32)
    vs = jnp.ones_like(ks)
    # tbp must MATCH between the reference runs and the CB call: the
    # streamed-block partition determines the per-block probability
    # quantization, and the CB call's recent buffer (Tr=8) clamps its tbp
    # to 8
    kw = dict(n_head=m.n_head, head_dim=m.head_dim, has_lora=True,
              act_dtype=jnp.float32, tbp=8, interpret=True)
    toks = rng.integers(0, 256, (B, int(lengths.max()) + 1))
    want_h = np.zeros((B, d), np.float32)
    for b in range(B):
        kcb = jnp.zeros((m.n_layer, 1, T, d), jnp.int8)
        vcb = jnp.zeros_like(kcb)
        ksb = jnp.ones((m.n_layer, T, 128), jnp.float32)
        vsb = jnp.ones_like(ksb)
        for step in range(int(lengths[b]) + 1):
            h1 = (ip["wte"][toks[b:b + 1, step]]
                  + ip["wpe"][step][None]).astype(jnp.float32)
            hb, kcb, vcb, ksb, vsb = mega_decode_step_kv8(
                h1, mw, kcb, vcb, ksb, vsb, jnp.int32(step), **kw)
        want_h[b] = np.asarray(hb[0])
        # seed the batched caches with this slot's prefix (rows < length;
        # the reference run also appended AT length, which the CB call
        # must reproduce via its returned codes)
        kc = kc.at[:, b].set(kcb[:, 0])
        vc = vc.at[:, b].set(vcb[:, 0])
        # batched scale layout: lane b holds slot b's scales
        ks = ks.at[:, :, b].set(ksb[:, :, 0])
        vs = vs.at[:, :, b].set(vsb[:, :, 0])
    # blank the appended row so the CB call does the append itself
    iB = jnp.arange(B)
    kc_pre = kc.at[:, iB, jnp.asarray(lengths)].set(0)
    vc_pre = vc.at[:, iB, jnp.asarray(lengths)].set(0)
    ks_pre = ks.at[:, jnp.asarray(lengths), iB].set(1.0)
    vs_pre = vs.at[:, jnp.asarray(lengths), iB].set(1.0)

    h = jnp.stack([
        (ip["wte"][toks[b, int(lengths[b])]]
         + ip["wpe"][int(lengths[b])]).astype(jnp.float32)
        for b in range(B)])
    TR = 8  # chunk-local recent buffer (one step)
    rec = (jnp.zeros((m.n_layer, B, TR, d), jnp.int8),
           jnp.zeros((m.n_layer, B, TR, d), jnp.int8),
           jnp.ones((m.n_layer, TR, 128), jnp.float32),
           jnp.ones((m.n_layer, TR, 128), jnp.float32))
    got_h, krec, vrec, ksrec, vsrec = mega_decode_step_cb(
        h, mw, kc_pre, vc_pre, ks_pre, vs_pre, *rec,
        jnp.asarray(lengths), jnp.int32(0), **kw)
    np.testing.assert_allclose(np.asarray(got_h), want_h, rtol=1e-5,
                               atol=1e-5)
    kc2, vc2, ks2, vs2 = cb_merge_recent(
        kc_pre, vc_pre, ks_pre, vs_pre, krec, vrec, ksrec, vsrec,
        jnp.asarray(lengths), 1)
    np.testing.assert_array_equal(np.asarray(kc2), np.asarray(kc))
    np.testing.assert_array_equal(np.asarray(vc2), np.asarray(vc))
    np.testing.assert_allclose(np.asarray(ks2[:, :, :B]),
                               np.asarray(ks[:, :, :B]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vs2[:, :, :B]),
                               np.asarray(vs[:, :, :B]), rtol=1e-6)


def test_engine_kv8_requires_mega():
    from llm_qat_tpu.models.inference import InferenceEngine

    cfg = _mega_config(0)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    with pytest.raises(ValueError, match="kv_bits=8"):
        InferenceEngine(params, cfg, bits=8, weight_format="int8_xla",
                        kv_layout="dense", kv_bits=8, dtype=jnp.float32)


@pytest.mark.parametrize("tpg", [2, 3, 4, 6])
def test_tiles_per_step_bit_identical(tpg):
    """Merged grid steps (r4 tiles_per_step) replay the per-tile bodies in
    the same order, so outputs and caches must be BIT-identical to tpg=1
    for both kernels (interpret mode, synthetic banks)."""
    from llm_qat_tpu.ops.mega_decode import (
        MegaWeights, mega_decode_step, mega_decode_step_kv8,
    )

    L, B, d, H, r, Tc, pos = 2, 2, 256, 4, 8, 32, 9
    rng = np.random.default_rng(0)
    mw = MegaWeights(
        wt=jnp.asarray(rng.integers(-127, 127, (L, 12, d, d)), jnp.int8),
        ws=jnp.asarray(rng.random((L, 12, 1, d)) * 0.01 + 1e-3, jnp.float32),
        bias=jnp.asarray(rng.random((L, 12, 1, d)) * 0.01, jnp.float32),
        at=jnp.asarray(rng.random((L, 12, d, r)) * 0.02 - 0.01, jnp.float32),
        bt=jnp.asarray(rng.random((L, 12, r, d)) * 0.02 - 0.01, jnp.float32),
        at_s=jnp.ones((L, 12), jnp.float32),
        bt_s=jnp.ones((L, 12), jnp.float32),
        ln=jnp.asarray(rng.random((L, 4, d)), jnp.float32),
        xs=jnp.asarray(rng.random((L, 4)) * 0.02 + 0.01, jnp.float32),
    )
    h = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((L, B, Tc, d)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, B, Tc, d)), jnp.float32)

    ref = mega_decode_step(h, mw, jnp.array(kc), jnp.array(vc), pos,
                           n_head=H, head_dim=d // H, has_lora=True,
                           act_dtype=jnp.float32, tiles_per_step=1,
                           interpret=True)
    got = mega_decode_step(h, mw, jnp.array(kc), jnp.array(vc), pos,
                           n_head=H, head_dim=d // H, has_lora=True,
                           act_dtype=jnp.float32, tiles_per_step=tpg,
                           interpret=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    kc8 = jnp.asarray(rng.integers(-127, 127, (L, B, Tc, d)), jnp.int8)
    vc8 = jnp.asarray(rng.integers(-127, 127, (L, B, Tc, d)), jnp.int8)
    ks = jnp.asarray(rng.random((L, Tc, 128)) * 0.01 + 1e-3, jnp.float32)
    vs = jnp.asarray(rng.random((L, Tc, 128)) * 0.01 + 1e-3, jnp.float32)
    ref8 = mega_decode_step_kv8(
        h, mw, jnp.array(kc8), jnp.array(vc8), jnp.array(ks), jnp.array(vs),
        pos, n_head=H, head_dim=d // H, has_lora=True,
        act_dtype=jnp.float32, kv_bits=8, tiles_per_step=1, interpret=True)
    got8 = mega_decode_step_kv8(
        h, mw, jnp.array(kc8), jnp.array(vc8), jnp.array(ks), jnp.array(vs),
        pos, n_head=H, head_dim=d // H, has_lora=True,
        act_dtype=jnp.float32, kv_bits=8, tiles_per_step=tpg, interpret=True)
    for a, b in zip(ref8, got8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
