"""Pallas kernel numerics tests (interpret mode on CPU) — SURVEY.md §4.4:
kernel-vs-reference numerics for the fused dequant matmul and flash attention.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.ops.attention import (
    causal_attention_reference,
    flash_attention,
)
from llm_qat_tpu.ops.quant_matmul import (

    pack_int4,
    pack_int8,
    quant_matmul_int4,
    quant_matmul_int4_reference,
    quant_matmul_int8,
    quant_matmul_int8_reference,
    unpack_int4,
)

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set


class TestPacking:
    def test_int8_roundtrip_error(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(64, 32)).astype(np.float32)
        q, s = pack_int8(w)
        deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
        assert np.max(np.abs(deq - w)) <= np.asarray(s).max() * 0.51

    def test_int4_pack_unpack_exact(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(16, 8)).astype(np.float32)
        packed, s = pack_int4(w)
        assert packed.shape == (8, 8)
        q = np.asarray(unpack_int4(packed))
        assert q.min() >= -7 and q.max() <= 7
        deq = q * np.asarray(s)[None, :]
        assert np.max(np.abs(deq - w)) <= np.asarray(s).max() * 0.51

    def test_per_tensor_scale(self):
        w = np.ones((4, 4), np.float32) * 3.0
        q, s = pack_int8(w, per_channel=False)
        assert s.shape == (1,)
        np.testing.assert_allclose(float(s[0]), 3.0 / 127.0, rtol=1e-6)


class TestQuantMatmulKernels:
    def test_int8_kernel_matches_reference(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(8, 128)).astype(np.float32)
        w = rng.normal(size=(128, 256)).astype(np.float32)
        q, s = pack_int8(w)
        want = np.asarray(quant_matmul_int8_reference(x, q, s))
        got = np.asarray(quant_matmul_int8(jnp.asarray(x), q, s,
                                           block_n=128, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-1)  # bf16 kernel compute

    def test_int4_kernel_matches_reference(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(8, 128)).astype(np.float32)
        w = rng.normal(size=(128, 256)).astype(np.float32)
        packed, s = pack_int4(w)
        want = np.asarray(quant_matmul_int4_reference(x, packed, s))
        got = np.asarray(quant_matmul_int4(jnp.asarray(x), packed, s,
                                           block_n=128, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-1)  # bf16 kernel compute

    def test_uneven_n_blocks(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(4, 64)).astype(np.float32)
        w = rng.normal(size=(64, 384)).astype(np.float32)
        q, s = pack_int8(w)
        want = np.asarray(quant_matmul_int8_reference(x, q, s))
        got = np.asarray(quant_matmul_int8(jnp.asarray(x), q, s,
                                           block_n=256, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-1)  # bf16 kernel compute


class TestFlashAttention:
    @pytest.mark.parametrize("T", [128, 256])
    def test_matches_dense_reference(self, T):
        rng = np.random.default_rng(5)
        B, H, D = 1, 2, 64
        q = rng.normal(size=(B, H, T, D)).astype(np.float32)
        k = rng.normal(size=(B, H, T, D)).astype(np.float32)
        v = rng.normal(size=(B, H, T, D)).astype(np.float32)
        want = np.asarray(causal_attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
        got = np.asarray(flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            block_q=64, block_k=64, interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    @pytest.mark.parametrize("T", [384, 640])
    def test_non_256_multiple_lengths(self, T):
        """Regression (r3 advisor, high): flash_blocks picked block_k=256 for
        T=384, and the k-loop's unmasked `pl.ds(k_off, block_k)` read past T —
        silently corrupt attention on the default training/prefill path.
        Blocks must divide T; verify numerics at the shapes that failed."""
        from llm_qat_tpu.ops.attention import flash_blocks
        bq, bk = flash_blocks(T)
        assert T % bq == 0 and T % bk == 0
        rng = np.random.default_rng(7)
        B, H, D = 1, 2, 64
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
                   for _ in range(3))
        want = np.asarray(causal_attention_reference(q, k, v))
        got = np.asarray(flash_attention(q, k, v, block_q=bq, block_k=bk,
                                         interpret=True))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_rejects_non_dividing_blocks(self):
        q = jnp.zeros((1, 1, 384, 64), jnp.float32)
        with pytest.raises(ValueError, match="must divide"):
            flash_attention(q, q, q, block_q=128, block_k=256, interpret=True)

    def test_causality(self):
        """Changing future K/V must not affect earlier outputs."""
        rng = np.random.default_rng(6)
        B, H, T, D = 1, 1, 128, 64
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        out1 = np.asarray(flash_attention(q, k, v, block_q=64, block_k=64,
                                          interpret=True))
        k2 = k.at[:, :, 100:].set(99.0)
        v2 = v.at[:, :, 100:].set(-99.0)
        out2 = np.asarray(flash_attention(q, k2, v2, block_q=64, block_k=64,
                                          interpret=True))
        np.testing.assert_allclose(out1[:, :, :100], out2[:, :, :100],
                                   rtol=1e-5, atol=1e-5)


class TestFlashAttentionTrainable:
    def test_forward_matches_dense(self):
        from llm_qat_tpu.ops.attention import flash_attention_trainable

        rng = np.random.default_rng(7)
        B, H, T, D = 1, 2, 128, 64
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        got = np.asarray(flash_attention_trainable(q, k, v, 64, 64, True))
        want = np.asarray(causal_attention_reference(q, k, v))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)

    def test_gradients_match_dense(self):
        from llm_qat_tpu.ops.attention import flash_attention_trainable

        rng = np.random.default_rng(8)
        B, H, T, D = 1, 1, 128, 64
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        cot = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention_trainable(q, k, v, 64, 64, True)
                           * cot)

        def loss_dense(q, k, v):
            return jnp.sum(causal_attention_reference(q, k, v) * cot)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gf, gd, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-3,
                                       err_msg=f"d{name} mismatch")


class TestDecodeAttention:
    def _mk(self, B=2, H=3, T=32, D=64, seed=9):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        kn = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        vn = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        kc = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        vc = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        return q, kn, vn, kc, vc

    def test_matches_reference_scalar_pos(self):
        from llm_qat_tpu.ops.decode_attention import (
            decode_attention,
            decode_attention_reference,
        )

        q, kn, vn, kc, vc = self._mk()
        want_o, want_k, want_v = decode_attention_reference(
            q, kn, vn, kc, vc, 5)
        got_o, got_k, got_v = decode_attention(
            q, kn, vn, kc.copy(), vc.copy(), 5, interpret=True)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                                   rtol=1e-6, atol=1e-6)

    def test_per_slot_positions(self):
        from llm_qat_tpu.ops.decode_attention import (
            decode_attention,
            decode_attention_reference,
        )

        q, kn, vn, kc, vc = self._mk(B=3, T=16)
        pos = jnp.asarray([2, 7, 15], jnp.int32)
        want_o, want_k, _ = decode_attention_reference(q, kn, vn, kc, vc, pos)
        got_o, got_k, _ = decode_attention(q, kn, vn, kc.copy(), vc.copy(),
                                           pos, interpret=True)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                                   rtol=1e-6, atol=1e-6)

    def test_future_positions_masked(self):
        from llm_qat_tpu.ops.decode_attention import decode_attention

        q, kn, vn, kc, vc = self._mk(T=16)
        # poison the future: output at pos=3 must ignore rows > 3
        kc2 = kc.at[:, :, 8:].set(99.0)
        vc2 = vc.at[:, :, 8:].set(-99.0)
        o1, _, _ = decode_attention(q, kn, vn, kc.copy(), vc.copy(), 3,
                                    interpret=True)
        o2, _, _ = decode_attention(q, kn, vn, kc2.copy(), vc2.copy(), 3,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)


class TestQuantizedKVCache:
    def test_roundtrip_accuracy(self):
        from llm_qat_tpu.ops.kv_cache import dequantize, init_quantized_kv, append_rows

        rng = np.random.default_rng(10)
        x = jnp.asarray(rng.normal(size=(2, 3, 4, 16)), jnp.float32)
        cache = init_quantized_kv(2, 3, 8, 16)
        cache = append_rows(cache, x, jnp.int32(0))
        deq = np.asarray(dequantize(cache))[:, :, :4]
        # per-row int8: worst-case error = scale/2 = max|row|/254
        err = np.abs(deq - np.asarray(x))
        bound = np.abs(np.asarray(x)).max(-1, keepdims=True) / 254 + 1e-6
        assert (err <= bound).all()

    def test_attention_matches_dequantized_reference(self):
        from llm_qat_tpu.ops.attention import causal_attention_reference
        from llm_qat_tpu.ops.kv_cache import (
            append_rows,
            attention_with_quantized_kv,
            dequantize,
            init_quantized_kv,
        )

        rng = np.random.default_rng(11)
        B, H, T, D = 1, 2, 8, 16
        q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        kc = append_rows(init_quantized_kv(B, H, T, D), k, jnp.int32(0))
        vc = append_rows(init_quantized_kv(B, H, T, D), v, jnp.int32(0))

        got = np.asarray(attention_with_quantized_kv(
            q, kc, vc, jnp.int32(0), jnp.int32(T), T))
        # identical math on the DEQUANTIZED cache
        want = np.asarray(causal_attention_reference(
            q, dequantize(kc), dequantize(vc)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # and close to the full-precision attention (int8 KV error only)
        full = np.asarray(causal_attention_reference(q, k, v))
        assert np.abs(got - full).max() < 0.05

    def test_incremental_append(self):
        from llm_qat_tpu.ops.kv_cache import append_rows, dequantize, init_quantized_kv

        rng = np.random.default_rng(12)
        a = jnp.asarray(rng.normal(size=(1, 1, 3, 8)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(1, 1, 1, 8)), jnp.float32)
        cache = init_quantized_kv(1, 1, 8, 8)
        cache = append_rows(cache, a, jnp.int32(0))
        cache = append_rows(cache, b, jnp.int32(3))
        deq = np.asarray(dequantize(cache))
        np.testing.assert_allclose(deq[0, 0, 3], np.asarray(b)[0, 0, 0],
                                   rtol=0.01, atol=0.02)
        np.testing.assert_allclose(deq[0, 0, :3], np.asarray(a)[0, 0],
                                   rtol=0.01, atol=0.02)


class TestDecodeAttentionHBM:
    """Length-aware HBM-resident packed-cache decode attention
    (`decode_attention_hbm`): two timesteps per 128-lane row, 8-sublane RMW
    append, double-buffered block streaming to the live prefix."""

    def _mk(self, B=2, H=3, T=256, D=64, seed=9):
        rng = np.random.default_rng(seed)
        q = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        kn = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        vn = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.float32)
        kc = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        vc = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
        return q, kn, vn, kc, vc

    def test_pack_unpack_roundtrip(self):
        from llm_qat_tpu.ops.decode_attention import (kv_pack_factor,
                                                      pack_kv, unpack_kv)

        assert kv_pack_factor(64) == 2
        assert kv_pack_factor(32) == 4
        assert kv_pack_factor(128) == 1
        assert kv_pack_factor(96) == 1  # doesn't divide 128 -> no packing
        D = 32
        x = jnp.arange(2 * 3 * 8 * D, dtype=jnp.float32).reshape(2, 3, 8, D)
        p = pack_kv(x)
        assert p.shape == (2, 3, 2, 4 * D)
        # row u holds timesteps P*u..P*u+P-1 in consecutive lane groups
        for i in range(4):
            np.testing.assert_array_equal(
                np.asarray(p[0, 0, 0, i * D:(i + 1) * D]),
                np.asarray(x[0, 0, i]))
        np.testing.assert_array_equal(np.asarray(unpack_kv(p, D)),
                                      np.asarray(x))

    @pytest.mark.parametrize("D", [64, 32])
    @pytest.mark.parametrize("pos", [0, 1, 3, 5, 16, 127, 128, 255])
    def test_matches_reference(self, pos, D):
        from llm_qat_tpu.ops.decode_attention import (
            decode_attention_hbm,
            decode_attention_reference,
            pack_kv,
            unpack_kv,
        )

        q, kn, vn, kc, vc = self._mk(D=D)
        want_o, want_k, want_v = decode_attention_reference(
            q, kn, vn, kc, vc, pos)
        got_o, got_k, got_v = decode_attention_hbm(
            q, kn, vn, pack_kv(kc), pack_kv(vc), jnp.int32(pos), tbp=16,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(unpack_kv(got_k, D)),
                                   np.asarray(want_k), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(unpack_kv(got_v, D)),
                                   np.asarray(want_v), rtol=1e-6, atol=1e-6)

    def test_future_rows_never_read(self):
        from llm_qat_tpu.ops.decode_attention import (decode_attention_hbm,
                                                      pack_kv)

        q, kn, vn, kc, vc = self._mk(T=64)
        kc2 = kc.at[:, :, 8:].set(99.0)
        vc2 = vc.at[:, :, 8:].set(-99.0)
        o1, _, _ = decode_attention_hbm(q, kn, vn, pack_kv(kc), pack_kv(vc),
                                        jnp.int32(3), tbp=8, interpret=True)
        o2, _, _ = decode_attention_hbm(q, kn, vn, pack_kv(kc2), pack_kv(vc2),
                                        jnp.int32(3), tbp=8, interpret=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)

    def test_full_decode_path_matches_dense(self):
        """Packed-cache prefill + decode (via infer_forward_unrolled) is
        step-exact vs the dense-cache XLA path in f32."""
        from llm_qat_tpu.models import (GPT2Config, QuantConfig,
                                        SPModelConfig, init_sp_params)
        from llm_qat_tpu.models.inference import (infer_forward_unrolled,
                                                  init_layer_caches,
                                                  quantize_for_inference)
        from llm_qat_tpu.train import CalibrationManager

        rng = np.random.default_rng(0)
        cfg = SPModelConfig(
            model=GPT2Config(vocab_size=256, n_positions=512, n_embd=64,
                             n_layer=2, n_head=2),
            quant=QuantConfig(bit_widths=(4, 8, 32),
                              quantizer_per_bit={8: "minmax"},
                              per_channel=False,
                              lora_rank_per_bit={b: 4 for b in range(2, 17)}
                              | {32: 0},
                              lora_alpha_per_bit={b: 8 for b in range(2, 17)}
                              | {32: 0}))
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        batches = [jnp.asarray(rng.integers(0, 256, (2, 16)))
                   for _ in range(2)]
        params = CalibrationManager(cfg, 2).calibrate_all_precisions(
            params, batches)
        ip = quantize_for_inference(params, cfg, 8, jnp.float32,
                                    weight_format="int8_xla")
        st = ip.pop("_static")
        ids = batches[0][:, :8]

        dense = init_layer_caches(cfg, 2, 128, jnp.float32)
        ld, cd, _ = infer_forward_unrolled(ip, ids, cfg, dense, jnp.int32(0),
                                           static=st)
        packed = init_layer_caches(cfg, 2, 128, jnp.float32,
                                   kv_layout="packed")
        lp, cp, _ = infer_forward_unrolled(ip, ids, cfg, packed, jnp.int32(0),
                                           static=st, attn_interpret=True)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                                   rtol=1e-5, atol=1e-5)
        tok = jnp.argmax(ld[:, -1:], axis=-1)
        pos = 8
        for _ in range(3):
            ld, cd, _ = infer_forward_unrolled(ip, tok, cfg, cd,
                                               jnp.int32(pos), static=st)
            lp, cp, _ = infer_forward_unrolled(ip, tok, cfg, cp,
                                               jnp.int32(pos), static=st,
                                               attn_interpret=True)
            np.testing.assert_allclose(np.asarray(lp), np.asarray(ld),
                                       rtol=1e-4, atol=1e-5)
            tok = jnp.argmax(ld[:, -1:], axis=-1)
            pos += 1


class TestFusedDecodeLayers:
    """Fused LN+QKV / post-attention decode kernels (`ops/fused_decode.py`).
    Opt-in (`infer_forward_unrolled(fused_linears=True)`): measured SLOWER
    than the XLA chain on v5e (0.95 vs 0.71 ms/step — XLA's latency-hiding
    scheduler overlaps weight fetches across ops better than serialized
    kernel prologues; docs/RESULTS_R1.md), kept for future grid-pipelined
    variants. Numerics must match the unfused int8 path to f32 ulp."""

    def test_erf_matches_lax(self):
        from llm_qat_tpu.ops.fused_decode import _erf

        x = jnp.linspace(-6.0, 6.0, 4097)
        err = float(jnp.max(jnp.abs(_erf(x) - jax.lax.erf(x))))
        assert err < 5e-7, err  # 1.5e-7 A&S bound + f32 rounding

    def test_fused_steps_match_unfused(self):
        from llm_qat_tpu.models import (GPT2Config, QuantConfig,
                                        SPModelConfig, init_sp_params)
        from llm_qat_tpu.models.inference import (infer_forward_unrolled,
                                                  init_layer_caches,
                                                  quantize_for_inference)
        from llm_qat_tpu.train import CalibrationManager

        rng = np.random.default_rng(0)
        cfg = SPModelConfig(
            model=GPT2Config(vocab_size=256, n_positions=512, n_embd=64,
                             n_layer=2, n_head=2),
            quant=QuantConfig(bit_widths=(4, 8, 32),
                              quantizer_per_bit={8: "minmax"},
                              per_channel=False,
                              lora_rank_per_bit={b: 4 for b in range(2, 17)}
                              | {32: 0},
                              lora_alpha_per_bit={b: 8 for b in range(2, 17)}
                              | {32: 0}))
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(7)  # non-zero LoRA exercises the epilogue
        for blk in ("c_attn", "attn_proj", "c_fc", "mlp_proj"):
            lin = params["blocks"][blk]
            lin["lora_B"] = 0.05 * jax.random.normal(
                key, lin["lora_B"].shape, lin["lora_B"].dtype)
        batches = [jnp.asarray(rng.integers(0, 256, (2, 16)))
                   for _ in range(2)]
        params = CalibrationManager(cfg, 2).calibrate_all_precisions(
            params, batches)
        ip = quantize_for_inference(params, cfg, 8, jnp.float32,
                                    weight_format="int8_xla")
        st = ip.pop("_static")
        ids = batches[0][:, :8]
        caches = init_layer_caches(cfg, 2, 128, jnp.float32,
                                   kv_layout="packed")
        l0, c0, _ = infer_forward_unrolled(ip, ids, cfg, caches, jnp.int32(0),
                                           static=st, attn_interpret=True)
        c1 = tuple(jnp.array(np.asarray(c)) for c in c0)
        tok = jnp.argmax(l0[:, -1:], axis=-1)
        pos = 8
        for _ in range(3):
            la, c0, _ = infer_forward_unrolled(ip, tok, cfg, c0,
                                               jnp.int32(pos), static=st,
                                               attn_interpret=True)
            lb, c1, _ = infer_forward_unrolled(ip, tok, cfg, c1,
                                               jnp.int32(pos), static=st,
                                               attn_interpret=True,
                                               fused_linears=True)
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=1e-5, atol=1e-6)
            tok = jnp.argmax(la[:, -1:], axis=-1)
            pos += 1


class TestFlashPrefill:
    """Initial-prefill flash path in infer_forward_unrolled (VERDICT r2 #8):
    logits must match the dense-softmax prefill; caches are identical by
    construction (written before attention)."""

    def test_matches_dense_prefill(self):
        import dataclasses
        from llm_qat_tpu.models import (
            init_sp_params, tiny_test_config,
        )
        from llm_qat_tpu.models.inference import (
            infer_forward_unrolled, init_layer_caches,
            quantize_for_inference,
        )
        from llm_qat_tpu.train import CalibrationManager

        cfg = tiny_test_config((8, 32))
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, n_positions=256,
                                           n_embd=128, n_head=2))
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        batch = [jnp.asarray(rng.integers(0, 256, (2, 32)))]
        params = CalibrationManager(cfg, 1).calibrate_all_precisions(
            params, batch)
        ip = quantize_for_inference(params, cfg, 8, dtype=jnp.float32)
        static = ip.pop("_static")
        ids = jnp.asarray(rng.integers(0, 256, (2, 128)))

        caches = init_layer_caches(cfg, 2, 160, dtype=jnp.float32)
        want, cd, _ = infer_forward_unrolled(ip, ids, cfg, caches,
                                             jnp.int32(0), static=static)
        caches = init_layer_caches(cfg, 2, 160, dtype=jnp.float32)
        got, cf, _ = infer_forward_unrolled(ip, ids, cfg, caches,
                                            jnp.int32(0), static=static,
                                            initial_prefill=True,
                                            attn_interpret=True)
        # 1e-3: the r4 flash kernel applies sm_scale to the f32 scores
        # (post-dot) instead of pre-scaling q, shifting rounding vs the
        # dense path by a few 1e-4 through the softmax exp.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=1e-3)
        for a, b in zip(cd, cf):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_padded_length_matches(self):
        """S=192 (not a 128 multiple): the pad-to-256 path must still match
        the dense reference on the real rows."""
        from llm_qat_tpu.models.inference import _flash_prefill_attn
        from llm_qat_tpu.ops.attention import causal_attention_reference

        rng = np.random.default_rng(1)
        q, k, v = (jnp.asarray(rng.normal(size=(2, 2, 192, 64)),
                               jnp.float32) for _ in range(3))
        want = causal_attention_reference(q, k, v)
        got = _flash_prefill_attn(q, k, v, attn_interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


class TestFlashTrainingDispatch:
    def test_forced_flash_matches_dense_forward_and_grad(self):
        """attention_impl='flash' (forced): sp_forward logits and grads
        match the dense default within f32 tolerance at T=128."""
        import dataclasses
        from llm_qat_tpu.models import (
            init_sp_params, prec_tables, sp_forward, tiny_test_config,
        )
        from llm_qat_tpu.train import CalibrationManager

        base = tiny_test_config((8, 32))
        base = dataclasses.replace(
            base, model=dataclasses.replace(base.model, n_positions=128,
                                            n_embd=128, n_head=2))
        params = init_sp_params(jax.random.PRNGKey(0), base)
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, 256, (2, 128)))
        params = CalibrationManager(base, 1).calibrate_all_precisions(
            params, [ids])
        tables = prec_tables(base.quant)
        flash_cfg = dataclasses.replace(base, attention_impl="flash")

        def loss(p, cfg):
            return sp_forward(p, ids, jnp.int32(0), cfg, tables=tables,
                              labels=ids)["loss"]

        ld, gd = jax.value_and_grad(lambda p: loss(p, base))(params)
        lf, gf = jax.value_and_grad(lambda p: loss(p, flash_cfg))(params)
        np.testing.assert_allclose(float(lf), float(ld), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gf)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=5e-3)
