"""Calibration-manager tests (reference behavior: `train_sp.py:32-213`;
state-machine test coverage modeled on
`part2_cyclic_precision_training/test/test_gradient_calibration.py`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.models import (
    init_sp_params,
    prec_tables,
    sp_forward,
    tiny_test_config,
)
from llm_qat_tpu.train import (
    CalibrationManager,
    calibrate_input_quantizers,
    calibrate_weight_quantizers,
)


@pytest.fixture(scope="module")
def calibrated():
    cfg = tiny_test_config((4, 8, 32))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, 16))) for _ in range(3)
    ]
    mgr = CalibrationManager(cfg, calibration_batches=3)
    params = mgr.calibrate_all_precisions(params, batches)
    return cfg, params, mgr, batches


class TestWeightCalibration:
    def test_scale_matches_formula(self, calibrated):
        cfg, params, _, _ = calibrated
        q = cfg.quant
        p4 = q.prec_index(4)  # minmax kind
        lin = jax.tree.map(np.asarray, params["blocks"]["c_fc"])
        w = lin["w"]  # (L, in, out)
        abs_max = np.maximum(np.abs(w).max(axis=1), q.eps)
        want = abs_max / (2**3 - 1)
        np.testing.assert_allclose(lin["wq_scale"][:, p4], want, rtol=1e-5)
        np.testing.assert_allclose(lin["wq_zp"][:, p4], 0.0)

    def test_log_slot_holds_log_range(self, calibrated):
        cfg, params, _, _ = calibrated
        q = cfg.quant
        p8 = q.prec_index(8)  # log kind
        lin = jax.tree.map(np.asarray, params["blocks"]["c_fc"])
        la = np.log2(np.maximum(np.abs(lin["w"]), q.eps))
        np.testing.assert_allclose(
            lin["wq_zp"][:, p8], la.min(axis=1), rtol=1e-5
        )
        np.testing.assert_allclose(
            lin["wq_scale"][:, p8], la.max(axis=1) - la.min(axis=1), rtol=1e-5
        )


class TestInputCalibration:
    def test_input_scales_written(self, calibrated):
        cfg, params, _, _ = calibrated
        q = cfg.quant
        for bits in (4, 8):
            p = q.prec_index(bits)
            s = np.asarray(params["blocks"]["c_attn"]["iq_scale"])[:, p]
            assert not np.allclose(s, 1.0), f"{bits}-bit input scale untouched"
            assert np.all(np.isfinite(s))

    def test_forward_after_calibration_is_sane(self, calibrated):
        cfg, params, mgr, batches = calibrated
        out8 = sp_forward(params, batches[0], cfg.quant.prec_index(8), cfg,
                          tables=mgr.tables, labels=batches[0])
        out32 = sp_forward(params, batches[0], cfg.quant.prec_index(32), cfg,
                           tables=mgr.tables, labels=batches[0])
        l8, l32 = float(out8["loss"]), float(out32["loss"])
        assert np.isfinite(l8) and np.isfinite(l32)
        # 8-bit log quantization should stay in the same ballpark as fp32
        assert abs(l8 - l32) / l32 < 0.5

    def test_gradients_flow_when_calibrated(self, calibrated):
        """Re-check of the uncalibrated-zero-gradient failure mode: once
        calibrated, low-bit training must produce nonzero LoRA gradients."""
        cfg, params, mgr, batches = calibrated
        ids = batches[0]

        def loss_fn(p):
            return sp_forward(p, ids, cfg.quant.prec_index(4), cfg,
                              tables=mgr.tables, labels=ids)["loss"]

        grads = jax.grad(loss_fn)(params)
        p4 = cfg.quant.prec_index(4)
        gB = np.asarray(grads["blocks"]["c_fc"]["lora_B"])[:, p4]
        gW = np.asarray(grads["blocks"]["c_fc"]["w"])
        assert np.abs(gB).sum() > 0
        assert np.abs(gW).sum() > 0


class TestManagerState:
    def test_ensure_calibrated_tracks(self, calibrated):
        cfg, params, mgr, batches = calibrated
        assert mgr.is_calibrated(4) and mgr.is_calibrated(8)
        assert mgr.is_calibrated(32)  # teacher needs no calibration

    def test_lazy_recalibration(self):
        cfg = tiny_test_config((4, 32))
        params = init_sp_params(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(1)
        batches = [jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, 8)))]
        mgr = CalibrationManager(cfg, calibration_batches=1)
        assert not mgr.is_calibrated(4)
        params = mgr.ensure_calibrated(params, 4, batches)
        assert mgr.is_calibrated(4)
