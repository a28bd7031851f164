"""SP model architecture tests.

Mirrors the reference test coverage for model shape / precision-switch /
calibration-mode behavior (`part5_squad/tests/test_model.py:15-312`), adapted
to the functional bank design.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.models import (

    init_sp_params,
    lm_cross_entropy,
    prec_tables,
    sp_forward,
    tiny_test_config,
)

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config((4, 8, 32))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    tables = prec_tables(cfg.quant)
    return cfg, params, tables


def _ids(cfg, B=2, T=16, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, T)))


class TestForward:
    def test_logits_shape(self, setup):
        cfg, params, tables = setup
        ids = _ids(cfg)
        out = sp_forward(params, ids, cfg.quant.prec_index(32), cfg, tables=tables)
        assert out["logits"].shape == (2, 16, cfg.model.vocab_size)

    def test_loss_scalar_and_finite(self, setup):
        cfg, params, tables = setup
        ids = _ids(cfg)
        out = sp_forward(
            params, ids, cfg.quant.prec_index(32), cfg, tables=tables, labels=ids
        )
        assert out["loss"].shape == ()
        assert np.isfinite(float(out["loss"]))

    def test_hidden_states_count(self, setup):
        cfg, params, tables = setup
        ids = _ids(cfg)
        out = sp_forward(
            params, ids, 2, cfg, tables=tables, output_hidden_states=True
        )
        # reference collects n_layer pre-block states + final ln_f output
        assert out["hidden_states"].shape[0] == cfg.model.n_layer + 1

    def test_weight_tying(self, setup):
        """lm_head weight is wte (reference models_sp.py:398)."""
        cfg, params, tables = setup
        ids = _ids(cfg, B=1, T=4)
        out = sp_forward(params, ids, cfg.quant.prec_index(32), cfg, tables=tables)
        # perturbing wte must change logits through both embedding and head
        p2 = dict(params)
        p2["wte"] = params["wte"] + 0.01
        out2 = sp_forward(p2, ids, cfg.quant.prec_index(32), cfg, tables=tables)
        assert not np.allclose(np.asarray(out["logits"]), np.asarray(out2["logits"]))


class TestPrecisionSwitching:
    def test_switch_changes_output(self, setup):
        cfg, params, tables = setup
        ids = _ids(cfg)
        l32 = sp_forward(params, ids, cfg.quant.prec_index(32), cfg, tables=tables)["logits"]
        l4 = sp_forward(params, ids, cfg.quant.prec_index(4), cfg, tables=tables)["logits"]
        assert not np.allclose(np.asarray(l32), np.asarray(l4))

    def test_no_retrace_across_precisions(self, setup):
        cfg, params, tables = setup
        ids = _ids(cfg)
        n_traces = [0]

        @jax.jit
        def fwd(params, ids, prec):
            n_traces[0] += 1
            return sp_forward(params, ids, prec, cfg, tables=tables)["logits"]

        for b in [4, 8, 32]:
            fwd(params, ids, jnp.int32(cfg.quant.prec_index(b))).block_until_ready()
        assert n_traces[0] == 1

    def test_32bit_is_unquantized(self, setup):
        """At 32 bits the forward must be the plain fp path: quantizing scale
        banks are untouched garbage at init, yet output must be well-formed."""
        cfg, params, tables = setup
        ids = _ids(cfg)
        logits = sp_forward(params, ids, cfg.quant.prec_index(32), cfg, tables=tables)["logits"]
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_lora_only_affects_student_precisions(self, setup):
        cfg, params, tables = setup
        ids = _ids(cfg)

        def perturb_lora(p):
            def f(path, leaf):
                return leaf + 0.5 if path[-1].key == "lora_B" else leaf
            return jax.tree_util.tree_map_with_path(f, p)

        p2 = perturb_lora(params)
        l32a = sp_forward(params, ids, cfg.quant.prec_index(32), cfg, tables=tables)["logits"]
        l32b = sp_forward(p2, ids, cfg.quant.prec_index(32), cfg, tables=tables)["logits"]
        np.testing.assert_allclose(np.asarray(l32a), np.asarray(l32b), atol=1e-6)

        l4a = sp_forward(params, ids, cfg.quant.prec_index(4), cfg, tables=tables)["logits"]
        l4b = sp_forward(p2, ids, cfg.quant.prec_index(4), cfg, tables=tables)["logits"]
        assert not np.allclose(np.asarray(l4a), np.asarray(l4b))


class TestCalibrationMode:
    def test_calibration_mode_disables_lora(self, setup):
        """calibration_mode must bypass LoRA (reference lora.py:146-147)."""
        cfg, params, tables = setup
        ids = _ids(cfg)

        def perturb_lora(p):
            def f(path, leaf):
                return leaf + 0.5 if path[-1].key == "lora_B" else leaf
            return jax.tree_util.tree_map_with_path(f, p)

        p2 = perturb_lora(params)
        a = sp_forward(params, ids, 0, cfg, tables=tables, calibration_mode=True)["logits"]
        b = sp_forward(p2, ids, 0, cfg, tables=tables, calibration_mode=True)["logits"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_collect_stats_shapes(self, setup):
        cfg, params, tables = setup
        ids = _ids(cfg)
        out = sp_forward(params, ids, 0, cfg, tables=tables, collect_stats=True)
        stats = out["stats"]
        d = cfg.model.n_embd
        L = cfg.model.n_layer
        assert stats["c_attn"]["mm_min"].shape == (L, d)
        assert stats["mlp_proj"]["mm_max"].shape == (L, 4 * d)
        assert np.all(
            np.asarray(stats["c_fc"]["mm_min"]) <= np.asarray(stats["c_fc"]["mm_max"])
        )


class TestLoss:
    def test_ignore_index(self):
        logits = jnp.zeros((1, 4, 8))
        labels = jnp.asarray([[1, 2, -100, -100]])
        loss = lm_cross_entropy(logits, labels)
        # only positions 1,2 of shifted labels count; uniform logits → log(8)
        np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)

    def test_all_ignored_no_nan(self):
        logits = jnp.zeros((1, 3, 8))
        labels = jnp.full((1, 3), -100)
        assert np.isfinite(float(lm_cross_entropy(logits, labels)))

    def test_gradient_flows_at_low_bits(self, setup):
        """Uses the 8-bit (log) slot: log fake-quant keeps signal even with
        uncalibrated unit scales, so gradients flow without calibration here.
        The calibrated 4-bit gradient-flow case is covered in
        test_calibration.py::TestInputCalibration."""
        cfg, params, tables = setup
        ids = _ids(cfg, B=1, T=8)
        p8 = cfg.quant.prec_index(8)

        def loss_fn(p):
            return sp_forward(p, ids, p8, cfg, tables=tables, labels=ids)["loss"]

        grads = jax.grad(loss_fn)(params)
        gB = np.asarray(grads["blocks"]["c_fc"]["lora_B"])
        # active student precision slot must receive gradient
        assert np.abs(gB[:, p8]).sum() > 0
