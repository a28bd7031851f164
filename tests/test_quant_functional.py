"""Numerics tests for fake-quant primitives vs independently-computed expectations.

Covers the reference quantizer semantics (SURVEY.md §2.1):
`part1_switchable_precision/quantization_methods.py:5-98` and the calibration
formulas of `part1_switchable_precision/quantization.py:104-139`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.quant import (
    KIND_LOG,
    KIND_MINMAX,
    QuantStats,
    calibrate_tensor,
    fake_quant,
    fake_quant_log,
    fake_quant_minmax,
    finalize,
    init_stats,
    quantize_gradient,
    reduction_axes,
    update_stats,
)


def ref_minmax(x, scale, zp, bits, symmetric=True):
    """Independent numpy recomputation of the reference minmax formulas."""
    if symmetric:
        q = np.clip(np.round(x / scale), -(2 ** (bits - 1) - 1), 2 ** (bits - 1) - 1)
        return q * scale
    q = np.clip(np.round(x / scale + zp), 0, 2**bits - 1)
    return (q - zp) * scale


def ref_log(x, log_min, log_range, bits, symmetric=True, eps=1e-5):
    """Independent numpy recomputation of the reference log-quant formulas."""
    zero_mask = np.abs(x) < eps
    sign = np.sign(x)
    la = np.log2(np.maximum(np.abs(x), eps))
    ln = np.clip((la - log_min) / max(log_range, eps), 0, 1)
    if symmetric:
        n = 2 ** (bits - 1) - 1
        q = np.clip(np.round((ln - 0.5) * 2 * n), -n, n)
        q = (q / (2 * n) + 0.5) * (2**bits - 1)
        qn = q / (2**bits - 1)
    else:
        n = 2**bits - 1
        qn = np.clip(np.round(ln * n), 0, n) / n
    out = 2.0 ** (qn * log_range + log_min) * sign
    return np.where(zero_mask, 0.0, out)


class TestMinMax:
    def test_symmetric_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(64, 32)).astype(np.float32)
        scale = 0.05
        for bits in [3, 4, 8]:
            got = fake_quant_minmax(x, scale, 0.0, float(bits), True)
            want = ref_minmax(x, scale, 0.0, bits, True)
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_asymmetric_matches_reference_formula(self):
        rng = np.random.default_rng(1)
        x = rng.normal(loc=0.3, size=(16, 8)).astype(np.float32)
        scale, zp = 0.02, 7.0
        got = fake_quant_minmax(x, scale, zp, 8.0, False)
        want = ref_minmax(x, scale, zp, 8, False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_per_channel_broadcast(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 6)).astype(np.float32)
        scale = np.abs(rng.normal(size=(1, 6))).astype(np.float32) + 0.01
        got = fake_quant_minmax(x, scale, 0.0, 4.0, True)
        want = ref_minmax(x, scale, 0.0, 4, True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    def test_ste_backward_identity(self):
        x = jnp.array([0.1, -0.5, 2.0, 0.0])
        g = jax.grad(lambda v: jnp.sum(fake_quant_minmax(v, 0.1, 0.0, 4.0, True) * 3.0))(x)
        np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones(4), rtol=1e-6)

    def test_quantization_levels_count(self):
        # 3-bit symmetric has at most 2*(2^2-1)+1 = 7 distinct levels
        x = np.linspace(-1, 1, 1001).astype(np.float32)
        out = np.asarray(fake_quant_minmax(x, 1 / 3.0, 0.0, 3.0, True))
        assert len(np.unique(out)) <= 7


class TestLog:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(32, 16)).astype(np.float32)
        log_min, log_range = -8.0, 7.0
        for bits in [5, 8]:
            got = fake_quant_log(x, log_min, log_range, float(bits), True)
            want = ref_log(x, log_min, log_range, bits, True)
            np.testing.assert_allclose(np.asarray(got), want, rtol=3e-2, atol=1e-6)

    def test_zeros_preserved(self):
        x = jnp.array([0.0, 1e-7, -1e-9, 0.5])
        out = np.asarray(fake_quant_log(x, -5.0, 4.0, 8.0, True))
        assert out[0] == 0.0 and out[1] == 0.0 and out[2] == 0.0 and out[3] != 0.0

    def test_sign_preserved(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(100,)).astype(np.float32)
        x = x[np.abs(x) > 1e-3]
        out = np.asarray(fake_quant_log(jnp.asarray(x), -6.0, 5.0, 6.0, True))
        assert np.all(np.sign(out) == np.sign(x))

    def test_backward_clamped(self):
        x = jnp.array([0.1, -0.5, 2.0])
        # upstream gradient of 25 should clamp to 10 (reference ±10 clamp)
        g = jax.grad(lambda v: jnp.sum(fake_quant_log(v, -5.0, 4.0, 5.0, True) * 25.0))(x)
        np.testing.assert_allclose(np.asarray(g), 10.0 * np.ones(3), rtol=1e-6)


class TestDispatch:
    def test_passthrough_at_32_bits(self):
        x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4) - 5.0
        out = fake_quant(x, 0.1, 0.0, 32, KIND_MINMAX)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_traced_bits_one_compile(self):
        compiles = [0]

        @jax.jit
        def f(x, bits, kind):
            compiles[0] += 1
            return fake_quant(x, 0.1, 0.0, bits, kind)

        x = jnp.ones((8, 8))
        for bits, kind in [(4, KIND_MINMAX), (8, KIND_LOG), (32, KIND_MINMAX)]:
            f(x, jnp.float32(bits), jnp.int32(kind)).block_until_ready()
        assert compiles[0] == 1, "precision switch must not retrace"

    def test_kind_selects_correct_math(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(16,)).astype(np.float32)
        mm = fake_quant(x, 0.05, 0.0, 4, KIND_MINMAX)
        np.testing.assert_allclose(
            np.asarray(mm), ref_minmax(x, 0.05, 0.0, 4), rtol=1e-5, atol=1e-6
        )
        # log kind: scale slot carries log_range, zero_point slot carries log_min
        lg = fake_quant(x, 6.0, -7.0, 6, KIND_LOG)
        np.testing.assert_allclose(
            np.asarray(lg), ref_log(x, -7.0, 6.0, 6), rtol=3e-2, atol=1e-6
        )

    def test_grad_through_dispatch(self):
        x = jnp.ones((4,))
        g = jax.grad(
            lambda v: jnp.sum(fake_quant(v, 0.1, 0.0, jnp.float32(4), KIND_MINMAX))
        )(x)
        np.testing.assert_allclose(np.asarray(g), np.ones(4), rtol=1e-6)


class TestCalibration:
    def test_reduction_axes(self):
        assert reduction_axes(2, 0) == (1,)
        assert reduction_axes(2, -1) == (0,)
        assert reduction_axes(3, -1) == (0, 1)
        assert reduction_axes(3, None) == (0, 1, 2)

    def test_minmax_symmetric_scale(self):
        x = np.array([[-2.0, 1.0], [0.5, 3.0]], np.float32)
        scale, zp = calibrate_tensor(x, 4, KIND_MINMAX, channel_dim=None)
        # abs_max=3.0, scale = 3/(2^3-1)
        np.testing.assert_allclose(float(np.asarray(scale).squeeze()), 3.0 / 7.0, rtol=1e-6)
        assert float(np.asarray(zp).squeeze()) == 0.0

    def test_minmax_asymmetric(self):
        x = np.array([[-1.0, 3.0]], np.float32)
        scale, zp = calibrate_tensor(x, 8, KIND_MINMAX, channel_dim=None, symmetric=False)
        np.testing.assert_allclose(float(np.asarray(scale).squeeze()), 4.0 / 255.0, rtol=1e-6)
        np.testing.assert_allclose(float(np.asarray(zp).squeeze()), np.round(1.0 / (4.0 / 255.0)), rtol=1e-6)

    def test_log_calibration_roundtrip(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=(128,)).astype(np.float32) * 4
        scale, zp = calibrate_tensor(x, 8, KIND_LOG, channel_dim=None)
        # scale holds log_range, zp holds log_min
        la = np.log2(np.maximum(np.abs(x), 1e-5))
        np.testing.assert_allclose(float(np.asarray(zp).squeeze()), la.min(), rtol=1e-5)
        np.testing.assert_allclose(float(np.asarray(scale).squeeze()), la.max() - la.min(), rtol=1e-5)
        # 8-bit log quantization should reconstruct within a fine log grid
        out = np.asarray(fake_quant_log(x, float(np.asarray(zp).squeeze()), float(np.asarray(scale).squeeze()), 8.0, True))
        nz = np.abs(x) > 1e-3
        np.testing.assert_allclose(out[nz], x[nz], rtol=0.05)

    def test_per_channel_calibration_shapes(self):
        x = np.random.default_rng(7).normal(size=(64, 16)).astype(np.float32)
        scale, zp = calibrate_tensor(x, 8, KIND_MINMAX, channel_dim=1)
        assert scale.shape == (1, 16)

    def test_streaming_update_folds_batches(self):
        rng = np.random.default_rng(8)
        batches = [rng.normal(size=(32, 8)).astype(np.float32) for _ in range(5)]
        stats = init_stats((1, 8))
        for b in batches:
            stats = update_stats(stats, b, channel_dim=-1, kind=KIND_MINMAX)
        allx = np.concatenate(batches, 0)
        np.testing.assert_allclose(
            np.asarray(stats.running_min)[0], allx.min(0), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(stats.running_max)[0], allx.max(0), rtol=1e-6
        )
        assert int(stats.count) == 5


class TestGradientQuantizer:
    def test_forward_identity(self):
        x = jnp.arange(6, dtype=jnp.float32)
        out = quantize_gradient(x, 0.1, 0.0, 8.0, jnp.float32(KIND_MINMAX))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_backward_quantizes_cotangent(self):
        x = jnp.zeros((8,))
        coeff = jnp.linspace(-1, 1, 8)

        def loss(v):
            y = quantize_gradient(v, 0.09, 0.0, 4.0, jnp.float32(KIND_MINMAX))
            return jnp.sum(y * coeff)

        g = jax.grad(loss)(x)
        want = ref_minmax(np.asarray(coeff), 0.09, 0.0, 4)
        np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-7)


class TestParityWithTorchReference:
    """Direct parity against the reference torch implementation when importable."""

    @pytest.fixture(autouse=True)
    def _ref(self):
        torch = pytest.importorskip("torch")
        import importlib.util, pathlib

        p = pathlib.Path("/root/reference/part1_switchable_precision/quantization_methods.py")
        if not p.exists():
            pytest.skip("reference not mounted")
        spec = importlib.util.spec_from_file_location("ref_qm", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        self.torch = torch
        self.ref = mod

    def test_minmax_parity(self):
        torch = self.torch
        rng = np.random.default_rng(9)
        x = rng.normal(size=(32, 16)).astype(np.float32)
        for bits in [3, 4, 8]:
            want = self.ref.apply_minmax_quantization(
                torch.tensor(x), torch.tensor(0.07), torch.tensor(0.0), bits, True
            ).numpy()
            got = np.asarray(fake_quant_minmax(x, 0.07, 0.0, float(bits), True))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_log_parity(self):
        torch = self.torch
        rng = np.random.default_rng(10)
        x = rng.normal(size=(32, 16)).astype(np.float32)
        for bits in [5, 7, 8]:
            want = self.ref.apply_log_quantization(
                torch.tensor(x), torch.tensor(-7.5), torch.tensor(6.5), bits, True
            ).numpy()
            got = np.asarray(fake_quant_log(x, -7.5, 6.5, float(bits), True))
            np.testing.assert_allclose(got, want, rtol=3e-2, atol=1e-6)
