"""SQuAD tests: dataset span conversion (reference `tests/test_dataset.py`),
metrics (`tests/test_metrics.py:12-93`), QA loss/gradients
(`tests/test_loss.py:16-99`), span extraction (`tests/test_evaluation.py`),
training step (`tests/test_training_step.py:75-187`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.data.squad import (
    OffsetByteTokenizer,
    SQuADDataset,
    find_answer_span,
    synthetic_squad,
)
from llm_qat_tpu.evals.squad_eval import extract_answer, evaluate_squad_model
from llm_qat_tpu.evals.squad_metrics import (
    evaluate_squad,
    exact_match_score,
    f1_score,
    normalize_answer,
)
from llm_qat_tpu.models import TrainConfig, prec_tables, tiny_test_config
from llm_qat_tpu.models.qa import init_qa_params, qa_forward, qa_loss_fn
from llm_qat_tpu.train import CalibrationManager
from llm_qat_tpu.train.squad_trainer import make_squad_train_step, qa_kl_loss

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set



class TestMetrics:
    def test_normalize(self):
        assert normalize_answer("The  Cat!") == "cat"
        assert normalize_answer("An apple, a day.") == "apple day"

    def test_exact_match(self):
        assert exact_match_score("the cat", ["Cat", "dog"]) == 1.0
        assert exact_match_score("cats", ["cat"]) == 0.0

    def test_f1(self):
        # prediction "the cat sat" vs gt "cat sat down": common {cat, sat}
        f1 = f1_score("the cat sat", ["cat sat down"])
        np.testing.assert_allclose(f1, 2 * (2 / 2) * (2 / 3) / ((2 / 2) + (2 / 3)))
        assert f1_score("", ["x"]) == 0.0

    def test_corpus_eval_with_unanswerable(self):
        res = evaluate_squad(
            {"a": "cat", "b": "", "c": "wrong"},
            {"a": ["the cat"], "b": [], "c": ["right"]},
        )
        np.testing.assert_allclose(res["exact_match"], 100 * 2 / 3, rtol=1e-6)
        assert res["total"] == 3


class TestDataset:
    def test_span_conversion(self):
        tok = OffsetByteTokenizer()
        ctx = "the cat sat on the mat"
        answers = {"text": ["sat"], "answer_start": [ctx.index("sat")]}
        ids, offsets = tok.tokenize_with_offsets(ctx)
        s, e = find_answer_span(answers, offsets, 0, len(ids), context_offset=5)
        # byte tokenizer: token index == char index; +5 context offset
        assert s == ctx.index("sat") + 5
        assert e == ctx.index("sat") + 2 + 5

    def test_answer_outside_window_is_zero(self):
        tok = OffsetByteTokenizer()
        ctx = "abcdef answer ghij"
        answers = {"text": ["answer"], "answer_start": [7]}
        ids, offsets = tok.tokenize_with_offsets(ctx)
        s, e = find_answer_span(answers, offsets, 0, 5, context_offset=3)
        assert (s, e) == (0, 0)

    def test_dataset_windows_and_padding(self):
        tok = OffsetByteTokenizer()
        examples = synthetic_squad(4, seed=0)
        ds = SQuADDataset(examples, tok, max_length=64, doc_stride=24,
                          max_query_length=16)
        assert len(ds) >= 4
        f = ds[0]
        assert f["input_ids"].shape == (64,)
        assert f["attention_mask"].sum() <= 64
        batch = next(ds.batches(2))
        assert batch["input_ids"].shape == (2, 64)

    def test_unanswerable_v2(self):
        tok = OffsetByteTokenizer()
        examples = synthetic_squad(4, seed=0, unanswerable=True)
        ds = SQuADDataset(examples, tok, max_length=64, doc_stride=64)
        zero_spans = [f for f in ds.features if f["start_positions"] == 0
                      and f["end_positions"] == 0]
        assert zero_spans  # the unanswerable examples map to (0, 0)


class TestExtraction:
    def test_best_span(self):
        tok = OffsetByteTokenizer()
        T = 16
        s = np.zeros(T); e = np.zeros(T)
        s[5] = 10.0; e[7] = 9.0
        ids = np.asarray([ord(c) for c in "0123456789abcdef"])
        ans = extract_answer(s, e, ids, tok, max_answer_length=5, n_best_size=4)
        assert (ans["start"], ans["end"]) == (5, 7)
        assert ans["text"] == "567"

    def test_length_constraint(self):
        tok = OffsetByteTokenizer()
        s = np.zeros(16); e = np.zeros(16)
        s[2] = 10.0; e[14] = 9.0; e[4] = 5.0
        ans = extract_answer(s, e, np.arange(16) + 65, tok,
                             max_answer_length=5, n_best_size=4)
        assert ans["end"] == 4  # 2..14 too long, falls back to 2..4

    def test_question_exclusion(self):
        tok = OffsetByteTokenizer()
        s = np.zeros(16); e = np.zeros(16)
        s[1] = 10.0; s[8] = 6.0; e[9] = 8.0
        ans = extract_answer(s, e, np.arange(16) + 65, tok,
                             max_answer_length=8, n_best_size=4,
                             question_length=5)
        assert ans["start"] >= 5


@pytest.fixture(scope="module")
def qa_setup():
    cfg = tiny_test_config((4, 32))
    params = init_qa_params(jax.random.PRNGKey(0), cfg)
    tables = prec_tables(cfg.quant)
    tok = OffsetByteTokenizer()
    ds = SQuADDataset(synthetic_squad(8, seed=1), tok, max_length=48,
                      doc_stride=48, max_query_length=12)
    return cfg, params, tables, tok, ds


class TestQAModel:
    def test_forward_shapes(self, qa_setup):
        cfg, params, tables, tok, ds = qa_setup
        batch = next(ds.batches(2))
        out = qa_forward(params, jnp.asarray(batch["input_ids"]), 1, cfg,
                         tables=tables,
                         attention_mask=jnp.asarray(batch["attention_mask"]))
        assert out["start_logits"].shape == (2, 48)
        assert out["end_logits"].shape == (2, 48)

    def test_loss_ignore_index(self):
        logits = jnp.zeros((2, 8))
        s = jnp.asarray([3, -1])
        loss = qa_loss_fn(logits, logits, s, s)
        np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)

    def test_gradients_reach_qa_heads(self, qa_setup):
        cfg, params, tables, tok, ds = qa_setup
        batch = next(ds.batches(2))

        def loss_fn(p):
            return qa_forward(
                p, jnp.asarray(batch["input_ids"]), 1, cfg, tables=tables,
                attention_mask=jnp.asarray(batch["attention_mask"]),
                start_positions=jnp.asarray(batch["start_positions"]),
                end_positions=jnp.asarray(batch["end_positions"]),
            )["loss"]

        g = jax.grad(loss_fn)(params)
        assert float(jnp.abs(g["qa_start"]["w"]).sum()) > 0
        assert float(jnp.abs(g["blocks"]["c_fc"]["w"]).sum()) > 0

    def test_kl_loss_zero_identical(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 12)), jnp.float32)
        assert abs(float(qa_kl_loss(x, x, 3.0))) < 1e-5


class TestQATraining:
    def test_train_step_runs_and_improves(self, qa_setup):
        cfg, params, tables, tok, ds = qa_setup
        tcfg = TrainConfig(gradient_accumulation_steps=2, num_iterations=20,
                           learning_rate=1e-3)
        init_state, train_step = make_squad_train_step(cfg, tcfg, tables)
        state = init_state(params)
        step = jax.jit(train_step)
        batch = {k: jnp.asarray(v) for k, v in next(ds.batches(2)).items()
                 if k != "example_ids"}
        rng = jax.random.PRNGKey(0)
        losses = []
        for _ in range(8):
            rng, sub = jax.random.split(rng)
            state, m = step(state, batch, sub)
            losses.append(float(m["teacher_loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]


class TestEndToEndEval:
    def test_evaluate_squad_model_runs(self, qa_setup):
        cfg, params, tables, tok, ds = qa_setup

        @jax.jit
        def qa_logits_fn(ids, mask):
            out = qa_forward(params, ids, 1, cfg, tables=tables,
                             attention_mask=mask)
            return out["start_logits"], out["end_logits"]

        refs = {f"syn-{i}": ["the mat"] for i in range(8)}
        res = evaluate_squad_model(qa_logits_fn, ds, tok, refs, batch_size=4)
        assert 0.0 <= res["f1"] <= 100.0
        assert res["total"] == 8
