"""Numerics tests for the r4 training-path rework: flat fake-quant, the
fused Pallas linear (interpret mode), AMP matmul, and the restructured
distillation cache.

Reference semantics under test:
- `fake_quant_flat` must equal `fake_quant` (cond/switch form) exactly —
  both implement `quantization_methods.py:5-98`.
- `sp_linear(linear_impl='fused')` must match `linear_impl='cond'` forward
  (same op order/dtypes) and backward within AMP tolerance (the fused
  backward casts cotangents to bf16 — the reference's fp16-autocast
  backward, `train_sp.py:319,452`).
- `prepare_teacher` + decomposed KL must match the inline KL formula
  (`distillation_manager.py:64-81`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_qat_tpu.models.config import (
    GPT2Config, QuantConfig, SPModelConfig, TrainConfig,
)
from llm_qat_tpu.models.sp_model import (
    _init_linear, dynamic_scale, prec_tables, sp_linear,
)
from llm_qat_tpu.ops.matmul import matmul_bf16
from llm_qat_tpu.quant.calibration import calibrate_tensor, dynamic_scale_flat
from llm_qat_tpu.quant.functional import (
    KIND_LOG, KIND_MINMAX, fake_quant, fake_quant_flat,
)


def _cfg(bit_widths=(4, 8, 32), rank=16, **kw):
    return SPModelConfig(
        model=GPT2Config(n_embd=256, n_layer=2, n_head=4, vocab_size=512),
        quant=QuantConfig(
            bit_widths=bit_widths,
            lora_rank_per_bit={b: rank for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 2 * rank for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="bfloat16",
        **kw,
    )


def _calibrated_linear(cfg, d_in=256, d_out=384, seed=0):
    q = cfg.quant
    tables = prec_tables(q)
    p = _init_linear(jax.random.PRNGKey(seed), d_in, d_out, q)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (2, 128, d_in))
    for i, b in enumerate(q.bit_widths):
        kind = int(tables.kind[i])
        ws, wz = calibrate_tensor(p["w"], float(b), kind, channel_dim=1)
        p["wq_scale"] = p["wq_scale"].at[i].set(ws.reshape(-1))
        p["wq_zp"] = p["wq_zp"].at[i].set(wz.reshape(-1))
        is_, iz = calibrate_tensor(x, float(b), kind, channel_dim=-1)
        p["iq_scale"] = p["iq_scale"].at[i].set(is_.reshape(-1))
        p["iq_zp"] = p["iq_zp"].at[i].set(iz.reshape(-1))
    p["lora_B"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(seed + 2), p["lora_B"].shape)
    return p, x, tables


class TestFakeQuantFlat:
    @pytest.mark.parametrize("kind", [KIND_MINMAX, KIND_LOG])
    @pytest.mark.parametrize("bits", [3.0, 4.0, 8.0, 32.0])
    def test_forward_matches_cond(self, kind, bits):
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
        if kind == KIND_LOG:
            scale, zp = calibrate_tensor(x, bits, kind, channel_dim=1)
        else:
            scale, zp = calibrate_tensor(x, bits, kind, channel_dim=1)
        a = fake_quant(x, scale, zp, bits, kind)
        b = fake_quant_flat(x, scale, zp, bits, kind)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.parametrize("kind,bits,expect_clamp", [
        (KIND_MINMAX, 4.0, False),
        (KIND_LOG, 8.0, True),
        (KIND_LOG, 32.0, False),  # passthrough: no clamp
    ])
    def test_ste_backward(self, kind, bits, expect_clamp):
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        scale, zp = calibrate_tensor(x, min(bits, 8.0), kind, channel_dim=1)
        big_g = 25.0 * jnp.ones_like(x)

        def f(xx):
            return jnp.sum(fake_quant_flat(xx, scale, zp, bits, kind) * big_g)

        g = jax.grad(f)(x)
        if expect_clamp:
            np.testing.assert_allclose(np.asarray(g), 10.0, rtol=1e-6)
        else:
            np.testing.assert_allclose(np.asarray(g), 25.0, rtol=1e-6)

    def test_dynamic_scale_flat_matches_switch(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (48, 24))
        for kind in (KIND_MINMAX, KIND_LOG):
            s0, z0 = dynamic_scale(x, 4.0, kind, 1)
            s1, z1 = dynamic_scale_flat(x, 4.0, kind, 1)
            np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                       rtol=1e-6)
            np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                                       rtol=1e-6)


class TestMatmulBf16:
    def test_forward(self):
        a = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 32))
        b = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        got = matmul_bf16(a, b, jnp.bfloat16)
        want = jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert got.dtype == jnp.float32

    def test_backward_is_bf16_rounded(self):
        a = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
        b = jax.random.normal(jax.random.PRNGKey(1), (16, 8))

        def f(aa, bb):
            return jnp.sum(matmul_bf16(aa, bb, jnp.bfloat16) ** 2)

        da, db = jax.grad(f, argnums=(0, 1))(a, b)
        # reference: same dots with bf16-cast cotangent
        g = 2.0 * matmul_bf16(a, b, jnp.bfloat16)
        gb = g.astype(jnp.bfloat16)
        want_da = jnp.dot(gb, b.astype(jnp.bfloat16).T,
                          preferred_element_type=jnp.float32)
        np.testing.assert_allclose(np.asarray(da), np.asarray(want_da),
                                   rtol=1e-5, atol=1e-5)
        assert da.shape == a.shape and db.shape == b.shape

    def test_float32_mode_identity(self):
        a = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
        b = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
        got = matmul_bf16(a, b, jnp.float32)
        want = jnp.dot(a, b, preferred_element_type=jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestFusedLinear:
    @pytest.mark.parametrize("prec", [0, 1, 2])
    def test_forward_matches_cond(self, prec):
        cfg = _cfg()
        p, x, tables = _calibrated_linear(cfg)
        out_c, _ = sp_linear(x, p, jnp.int32(prec), tables,
                             cfg.replace(linear_impl="cond"))
        out_f, _ = sp_linear(x, p, jnp.int32(prec), tables,
                             cfg.replace(linear_impl="fused"))
        np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_f),
                                   rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("prec", [0, 1, 2])
    def test_grads_match_cond_within_amp_tol(self, prec):
        cfg = _cfg()
        p, x, tables = _calibrated_linear(cfg)

        def loss(pp, xx, impl):
            out, _ = sp_linear(xx, pp, jnp.int32(prec), tables,
                               cfg.replace(linear_impl=impl))
            return jnp.sum(out * jnp.cos(0.1 * out))

        (gc_p, gc_x) = jax.grad(lambda pp, xx: loss(pp, xx, "cond"),
                                argnums=(0, 1))(p, x)
        (gf_p, gf_x) = jax.grad(lambda pp, xx: loss(pp, xx, "fused"),
                                argnums=(0, 1))(p, x)
        for leaf in ("w", "b", "lora_A", "lora_B"):
            c = np.asarray(gc_p[leaf])
            f = np.asarray(gf_p[leaf])
            scale = max(np.abs(c).max(), 1e-6)
            # bf16 cotangent rounding: ~0.4% relative
            assert np.abs(c - f).max() / scale < 0.03, leaf
        scale = max(np.abs(np.asarray(gc_x)).max(), 1e-6)
        assert np.abs(np.asarray(gc_x) - np.asarray(gf_x)).max() / scale < 0.03

    def test_quant_bank_grads_are_zero(self):
        cfg = _cfg()
        p, x, tables = _calibrated_linear(cfg)

        def loss(pp):
            out, _ = sp_linear(x, pp, jnp.int32(0), tables,
                               cfg.replace(linear_impl="fused"))
            return jnp.sum(out)

        g = jax.grad(loss)(p)
        for leaf in ("wq_scale", "wq_zp", "iq_scale", "iq_zp"):
            assert float(jnp.max(jnp.abs(g[leaf]))) == 0.0, leaf

    def test_unsupported_shape_falls_back(self):
        cfg = _cfg()
        p, _, tables = _calibrated_linear(cfg)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 100, 256))  # M=100
        out_f, _ = sp_linear(x, p, jnp.int32(0), tables,
                             cfg.replace(linear_impl="fused"))
        out_c, _ = sp_linear(x, p, jnp.int32(0), tables,
                             cfg.replace(linear_impl="cond"))
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                                   rtol=1e-5, atol=1e-4)


class TestTeacherCache:
    def test_decomposed_kl_matches_inline(self):
        from llm_qat_tpu.train.distillation import (
            kl_distillation_loss, prepare_teacher,
        )
        s = 5.0 * jax.random.normal(jax.random.PRNGKey(0), (2, 16, 101))
        t = 5.0 * jax.random.normal(jax.random.PRNGKey(1), (2, 16, 101))
        inline = float(kl_distillation_loss(s, t, 3.0))
        teacher32 = prepare_teacher(t, None, 3.0, cache_dtype=jnp.float32)
        got32 = float(kl_distillation_loss(s, teacher32, 3.0))
        assert abs(inline - got32) < 1e-4 * max(abs(inline), 1.0)
        teacher16 = prepare_teacher(t, None, 3.0, cache_dtype=jnp.bfloat16)
        got16 = float(kl_distillation_loss(s, teacher16, 3.0))
        assert abs(inline - got16) < 2e-2 * max(abs(inline), 1.0)


@pytest.mark.slow
class TestStudentUnroll:
    def test_unrolled_matches_scan(self):
        from llm_qat_tpu.models.config import tiny_test_config
        from llm_qat_tpu.models.sp_model import init_sp_params
        from llm_qat_tpu.train.calibration_manager import CalibrationManager
        from llm_qat_tpu.train.sp_trainer import make_sp_train_step

        cfg = tiny_test_config()
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        batch = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, 32)))
        params = CalibrationManager(cfg, 1).calibrate_all_precisions(
            params, [batch])
        losses = {}
        for unroll in (True, False):
            tcfg = TrainConfig(batch_size=2, max_seq_length=32,
                               gradient_accumulation_steps=3,
                               num_iterations=4, eval_interval=100,
                               unroll_students=unroll,
                               distill_cache_dtype="float32")
            init_state, step = make_sp_train_step(cfg, tcfg)
            state = init_state(jax.tree.map(jnp.array, params))
            ls = []
            for i in range(3):
                state, m = jax.jit(step)(state, batch,
                                         jax.random.PRNGKey(7 + i))
                ls.append(float(m["loss"]))
            losses[unroll] = ls
        np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)
