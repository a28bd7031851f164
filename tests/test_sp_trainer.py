"""SP training-step tests (reference coverage model:
`part5_squad/tests/test_training_step.py:75-187` and
`test_distillation.py:24-118`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.models import (
    TrainConfig,
    init_sp_params,
    prec_tables,
    sp_forward,
    tiny_test_config,
)
from llm_qat_tpu.train import CalibrationManager
from llm_qat_tpu.train.distillation import (
    TeacherOutputs,
    feature_distillation_loss,
    kl_distillation_loss,
)
from llm_qat_tpu.train.sp_trainer import (

    make_sp_train_step,
    trainable_mask,
)

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set


class TestDistillationLosses:
    def test_kl_matches_manual(self):
        rng = np.random.default_rng(0)
        B, T, V = 2, 5, 7
        s = rng.normal(size=(B, T, V)).astype(np.float32)
        t = rng.normal(size=(B, T, V)).astype(np.float32)
        temp = 3.0
        got = float(kl_distillation_loss(jnp.asarray(s), jnp.asarray(t), temp))

        def logsoftmax(x):
            x = x / temp
            return x - np.log(np.exp(x - x.max(-1, keepdims=True)).sum(-1, keepdims=True)) - x.max(-1, keepdims=True)

        sl = logsoftmax(s[:, :-1])
        tl = logsoftmax(t[:, :-1])
        want = (np.exp(tl) * (tl - sl)).sum(-1).mean() * temp * temp
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_kl_zero_for_identical(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 9)), jnp.float32)
        assert abs(float(kl_distillation_loss(x, x, 3.0))) < 1e-5

    def test_feature_loss_selects_layer(self):
        t = jnp.zeros((3, 2, 4, 8))
        s = t.at[1].set(2.0)
        assert float(feature_distillation_loss(s, t, 0)) == 0.0
        np.testing.assert_allclose(float(feature_distillation_loss(s, t, 1)), 4.0)
        # accumulative mode averages over layers
        np.testing.assert_allclose(
            float(feature_distillation_loss(s, t, 0, accumulative=True)), 4.0 / 3
        )


@pytest.fixture(scope="module")
def trained_setup():
    cfg = tiny_test_config((4, 32))
    tcfg = TrainConfig(
        gradient_accumulation_steps=4,
        num_iterations=50,
        learning_rate=1e-3,
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, 16))) for _ in range(2)
    ]
    mgr = CalibrationManager(cfg, calibration_batches=2)
    params = mgr.calibrate_all_precisions(params, batches)
    return cfg, tcfg, params, batches


class TestTrainStep:
    def test_single_step_updates_only_trainable(self, trained_setup):
        cfg, tcfg, params, batches = trained_setup
        init_state, train_step = make_sp_train_step(cfg, tcfg)
        state = init_state(params)
        step = jax.jit(train_step)
        new_state, metrics = step(state, batches[0], jax.random.PRNGKey(42))

        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))

        # frozen leaves unchanged
        np.testing.assert_array_equal(
            np.asarray(new_state.params["wte"]), np.asarray(params["wte"])
        )
        np.testing.assert_array_equal(
            np.asarray(new_state.params["blocks"]["c_fc"]["wq_scale"]),
            np.asarray(params["blocks"]["c_fc"]["wq_scale"]),
        )
        # trainable leaves moved
        assert not np.allclose(
            np.asarray(new_state.params["blocks"]["c_fc"]["w"]),
            np.asarray(params["blocks"]["c_fc"]["w"]),
        )
        assert not np.allclose(
            np.asarray(new_state.params["ln_f"]["g"]),
            np.asarray(params["ln_f"]["g"]),
        )

    def test_vmap_students_match_scan(self, trained_setup):
        """student_mode='vmap' (one batched fwd+bwd over all students, r5)
        must reproduce the scan mode's loss and updated params — same math,
        only the accumulation moves inside the backward contractions.
        Dropout must also agree: both modes fold the same per-student rng."""
        cfg, tcfg, params, batches = trained_setup
        import dataclasses

        results = {}
        for mode in ("scan", "vmap"):
            tc = dataclasses.replace(tcfg, student_mode=mode)
            init_state, train_step = make_sp_train_step(cfg, tc)
            state = init_state(params)
            state, metrics = jax.jit(train_step)(
                state, batches[0], jax.random.PRNGKey(11))
            results[mode] = (state, metrics)
        m_s, m_v = results["scan"][1], results["vmap"][1]
        np.testing.assert_allclose(float(m_v["loss"]), float(m_s["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m_v["grad_norm"]),
                                   float(m_s["grad_norm"]), rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(m_v["precisions"]),
                                      np.asarray(m_s["precisions"]))
        # updated parameter trees agree leaf-by-leaf (float addition order
        # differs -> tiny tolerance, not exact)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
            results["scan"][0].params, results["vmap"][0].params)

    def test_student_precisions_sampled_from_students(self, trained_setup):
        cfg, tcfg, params, batches = trained_setup
        init_state, train_step = make_sp_train_step(cfg, tcfg)
        state = init_state(params)
        _, metrics = jax.jit(train_step)(state, batches[0], jax.random.PRNGKey(7))
        precs = np.asarray(metrics["precisions"])
        student_slots = {cfg.quant.prec_index(b) for b in cfg.quant.student_bits}
        assert set(precs.tolist()) <= student_slots

    def test_loss_decreases_memorizing_one_batch(self, trained_setup):
        """Smoke test mirroring the reference's loss-decreases training test
        (`test_training_step.py:150-187`)."""
        cfg, tcfg, params, batches = trained_setup
        init_state, train_step = make_sp_train_step(cfg, tcfg)
        state = init_state(params)
        step = jax.jit(train_step)
        rng = jax.random.PRNGKey(0)
        losses = []
        for i in range(12):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batches[0], sub)
            losses.append(float(metrics["teacher_loss"]))
        assert losses[-1] < losses[0], f"teacher CE did not decrease: {losses}"

    def test_no_retrace_across_steps(self, trained_setup):
        cfg, tcfg, params, batches = trained_setup
        init_state, train_step = make_sp_train_step(cfg, tcfg)
        state = init_state(params)
        traces = [0]

        def counting_step(state, ids, rng):
            traces[0] += 1
            return train_step(state, ids, rng)

        step = jax.jit(counting_step)
        rng = jax.random.PRNGKey(0)
        for i in range(3):
            rng, sub = jax.random.split(rng)
            state, _ = step(state, batches[0], sub)
        assert traces[0] == 1


class TestTrainableMask:
    def test_mask_structure(self, trained_setup):
        cfg, _, params, _ = trained_setup
        mask = trainable_mask(params)
        assert mask["wte"] is False
        assert mask["wpe"] is False
        assert mask["blocks"]["c_attn"]["w"] is True
        assert mask["blocks"]["c_attn"]["iq_scale"] is False
        assert mask["blocks"]["c_attn"]["lora_A"] is True
        assert mask["ln_f"]["g"] is True
