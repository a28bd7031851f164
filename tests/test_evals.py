"""Evaluation-harness tests: sliding-window PPL semantics, zero-shot
formatters/likelihood, size metrics, tables (reference behaviors:
`part3_eval_sp/perplexity_eval.py:36-95`, `zero_shot_tasks.py:75-199`,
`sp_metrics.py:38-49`, `bit_configurations.py:4-62`)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.data import ByteTokenizer, LMDataset, chunk_tokens, synthetic_corpus
from llm_qat_tpu.evals import (
    STANDARD_CONFIGS,
    BaselineComparison,
    PerplexityEvaluator,
    ResultTableGenerator,
    ZeroShotEvaluator,
    compression_ratio,
    count_parameters_m,
    iter_windows,
    model_size_gb,
    parse_config_string,
    validate_bits_supported,
)
from llm_qat_tpu.evals.zero_shot import (
    format_arc,
    format_boolq,
    format_hellaswag,
    format_winogrande,
)


class TestWindowing:
    def test_iter_windows_no_overlap_counting(self):
        # stride == max_length: targets tile the sequence exactly
        wins = list(iter_windows(10, 4, 4))
        assert wins == [(0, 4, 0, 4), (4, 8, 4, 8), (8, 10, 8, 10)]

    def test_iter_windows_overlap(self):
        # stride < max_length: target starts at prev_end (no double counting)
        wins = list(iter_windows(10, 6, 3))
        # targets never overlap: [0,6), [6,9), [9,10)
        assert wins == [(0, 6, 0, 6), (3, 9, 6, 9), (6, 10, 9, 10)]

    def test_ppl_uniform_model(self):
        """A uniform-logits model must give PPL == vocab size exactly."""
        V = 16

        def logits_fn(ids):
            return jnp.zeros(ids.shape + (V,), jnp.float32)

        ev = PerplexityEvaluator(logits_fn, max_length=8, stride=8, batch_size=4)
        seqs = [np.arange(20) % V, np.arange(13) % V]
        ppl = ev.calculate_perplexity(seqs)
        np.testing.assert_allclose(ppl, V, rtol=1e-5)

    def test_ppl_overlap_equals_tiled_for_uniform(self):
        V = 8

        def logits_fn(ids):
            return jnp.zeros(ids.shape + (V,), jnp.float32)

        seqs = [np.arange(50) % V]
        p1 = PerplexityEvaluator(logits_fn, 16, 16, 4).calculate_perplexity(seqs)
        p2 = PerplexityEvaluator(logits_fn, 16, 8, 4).calculate_perplexity(seqs)
        np.testing.assert_allclose(p1, p2, rtol=1e-5)

    def test_empty_returns_inf(self):
        ev = PerplexityEvaluator(lambda ids: jnp.zeros(ids.shape + (4,)), 8, 8)
        assert ev.calculate_perplexity([]) == float("inf")


class TestZeroShotFormatters:
    def test_boolq(self):
        ctx, choices, label = format_boolq(
            {"passage": "p" * 200, "question": "q?", "answer": True}
        )
        assert "..." in ctx and choices == [" True", " False"] and label == 0

    def test_hellaswag(self):
        ctx, choices, label = format_hellaswag(
            {"ctx": "A man walks", "endings": ["a", "b", "c", "d"], "label": "2"}
        )
        assert ctx.endswith(" ") and label == 2 and len(choices) == 4

    def test_winogrande_split(self):
        ctx, choices, label = format_winogrande(
            {"sentence": "The _ ran.", "option1": "dog", "option2": "cat",
             "answer": "2"}
        )
        assert choices == ["dog ran.", "cat ran."] and label == 1

    def test_arc(self):
        ctx, choices, label = format_arc(
            {"question": "Why?", "answerKey": "B",
             "choices": {"text": ["t1", "t2"], "label": ["A", "B"]}}
        )
        assert choices == [" A. t1", " B. t2"] and label == 1


class TestZeroShotLikelihood:
    def test_picks_higher_likelihood_choice(self):
        """Model that strongly predicts token 5 must pick the choice made of
        5s."""
        V = 16

        def logits_fn(ids):
            base = jnp.zeros(ids.shape + (V,), jnp.float32)
            return base.at[..., 5].set(10.0)

        tok = lambda s: [ord(c) % V for c in s]
        ev = ZeroShotEvaluator(logits_fn, tok, max_length=32)
        # choice0 tokens all == 5 (chr(5)), choice1 tokens == 7
        pred = ev.compute_choice_likelihood("ab", chr(5) * 4)
        pred = ev.compute_choice_likelihood("ab", [chr(5) * 4, chr(7) * 4])
        assert pred == 0

    def test_evaluate_task_accuracy(self):
        V = 16

        def logits_fn(ids):
            return jnp.zeros(ids.shape + (V,), jnp.float32).at[..., 5].set(10.0)

        tok = lambda s: [ord(c) % V for c in s]
        ev = ZeroShotEvaluator(logits_fn, tok, max_length=32, max_samples=10)
        ds = [
            {"ctx": "x ", "endings": [chr(5) * 3, chr(7) * 3], "label": "0"},
            {"ctx": "y ", "endings": [chr(7) * 3, chr(5) * 3], "label": "1"},
        ]
        acc = ev.evaluate_task("HellaSwag", ds)
        assert acc == 100.0


class TestMetrics:
    def test_configs_complete(self):
        assert len(STANDARD_CONFIGS) == 13
        assert STANDARD_CONFIGS["W4A8KV8"]["A"] == 8

    def test_parse_and_compression(self):
        c = parse_config_string("4-8-8")
        base = parse_config_string("16-16-16")
        np.testing.assert_allclose(compression_ratio(c, base), 48 / 20)

    def test_validate_bits(self):
        assert validate_bits_supported((4, 8, 32), {"W": 8}) == 8
        with pytest.raises(ValueError):
            validate_bits_supported((4, 32), {"W": 8})

    def test_model_size_formula(self):
        # GPT-2 124M @ INT8: weight = 124 * 8 / (8*1024) GB ≈ 0.121
        got = model_size_gb(124.0, 12, 12, 64, {"W": 8, "KV": 8})
        want_w = 124.0 * 8 / (8 * 1024)
        want_kv = 2 * 12 * 12 * 64 * 2048 * 8 / (8 * 1024**3)
        np.testing.assert_allclose(got, round(want_w + want_kv, 2))


class TestTables:
    def _results(self):
        return {
            "FP16": {"bits": "16-16-16", "model_size_gb": 0.25,
                     "zero_shot": {"BoolQ": 61.0, "Average": 50.0},
                     "perplexity": {"WikiText2": 20.0}},
            "INT4": {"bits": "4-4-4", "model_size_gb": 0.06,
                     "zero_shot": {"BoolQ": 60.0, "Average": 47.0},
                     "perplexity": {"WikiText2": 30.0}},
        }

    def test_ascii_tables(self, tmp_path):
        gen = ResultTableGenerator(self._results(), output_dir=str(tmp_path))
        t1 = gen.generate_table_1_zero_shot()
        t2 = gen.generate_table_2_perplexity()
        assert "FP16" in t1 and "BoolQ" in t1
        assert (tmp_path / "table1_zero_shot.txt").exists()
        # sorted by WikiText2 asc: FP16 first
        assert t2.index("FP16") < t2.index("INT4")

    def test_latex_export(self, tmp_path):
        gen = ResultTableGenerator(self._results(), output_dir=str(tmp_path))
        latex = gen.export_to_latex()
        assert "\\begin{table}" in latex["zero_shot"]

    def test_baseline_comparison(self):
        cmp = BaselineComparison("FP16").compare(self._results())
        assert cmp["INT4"]["zero_shot_delta"] == -3.0
        assert cmp["INT4"]["perplexity_delta"]["WikiText2"] == 10.0


class TestData:
    def test_chunking_part1_semantics(self):
        toks = np.arange(10)
        ids, labels = chunk_tokens(toks, 4, 4, pad_id=99)
        assert ids.shape == (3, 4)
        # last window partial → padded with -100 labels
        assert labels[-1].tolist().count(-100) == 2

    def test_chunking_part2_semantics(self):
        toks = np.arange(10)
        ids, _ = chunk_tokens(toks, 4, 4, pad_id=99, drop_partial=True)
        assert ids.shape == (2, 4)

    def test_lm_dataset_batches(self):
        tok = ByteTokenizer()
        ds = LMDataset(synthetic_corpus(8, seed=1), tok, max_length=32,
                       doc_stride=16)
        assert len(ds) > 0
        b = next(ds.batches(2))
        assert b[0].shape == (2, 32)
