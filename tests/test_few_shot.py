"""Few-shot evaluator tests (the reference renders Table 7 but has no
few-shot evaluator — this completes the pipeline; synthetic offline data)."""

import numpy as np
import jax.numpy as jnp
import pytest

from llm_qat_tpu.evals.few_shot import (
    FewShotEvaluator,
    format_mmlu_prompt,
    mmlu_category,
)
from llm_qat_tpu.evals.tables import ResultTableGenerator


def biased_logits_fn(target_tok):
    def fn(ids):
        V = 32
        return jnp.zeros(ids.shape + (V,), jnp.float32).at[..., target_tok].set(8.0)
    return fn


TOK = lambda s: [ord(c) % 32 for c in s][:400]


class TestMMLU:
    def test_category_mapping(self):
        assert mmlu_category("philosophy") == "Humanities"
        assert mmlu_category("astronomy") == "STEM"
        assert mmlu_category("sociology") == "Social Sciences"
        assert mmlu_category("nutrition") == "Other"

    def test_prompt_format(self):
        shots = [{"question": "Q1?", "choices": ["w", "x", "y", "z"],
                  "answer": 2}]
        ex = {"question": "Q2?", "choices": ["a", "b", "c", "d"], "answer": 0}
        p = format_mmlu_prompt(ex, shots)
        assert "Answer: C" in p           # shot carries its answer
        assert p.rstrip().endswith("Answer:")  # target leaves it open

    def test_mmlu_eval_with_biased_model(self):
        # model that always prefers the token of " A"'s 'A' → predicts A
        target = ord("A") % 32
        ev = FewShotEvaluator(biased_logits_fn(target), TOK, max_samples=6,
                              n_shots=1)
        exs = [{"question": f"q{i}", "choices": ["c0", "c1", "c2", "c3"],
                "answer": 0} for i in range(4)]
        subjects = {"philosophy": {"test": exs, "dev": exs[:1]}}
        res = ev.evaluate_mmlu(subjects)
        assert res["Humanities"] == 100.0
        assert res["Average"] == 100.0

    def test_table7_consumes_output(self, tmp_path):
        ev = FewShotEvaluator(biased_logits_fn(ord("A") % 32), TOK,
                              max_samples=2, n_shots=0)
        exs = [{"question": "q", "choices": ["a", "b", "c", "d"],
                "answer": 0}]
        few = ev.evaluate_all(
            mmlu_subjects={"philosophy": {"test": exs, "dev": []},
                           "astronomy": {"test": exs, "dev": []}})
        gen = ResultTableGenerator({"INT8": {"few_shot": few}},
                                   output_dir=str(tmp_path))
        t7 = gen.generate_table_7_few_shot()
        assert "MMLU-Hum" in t7 and "INT8" in t7


class TestTriviaQA:
    def test_em_scoring(self):
        answers = {"paris": "Paris", "rome": "Rome"}

        def gen_fn(prompt, n):
            q = prompt.rstrip().split("Q: ")[-1].split("\n")[0]
            return " " + answers.get(q.strip("?").lower(), "dunno")

        ev = FewShotEvaluator(biased_logits_fn(0), TOK, generate_fn=gen_fn,
                              max_samples=4, n_shots=1)
        exs = [
            {"question": "paris?", "answers": ["Paris", "City of Light"]},
            {"question": "rome?", "answers": ["ROME"]},
            {"question": "berlin?", "answers": ["Berlin"]},
        ]
        acc = ev.evaluate_triviaqa(exs, shots=[{"question": "x",
                                                "answers": ["y"]}])
        np.testing.assert_allclose(acc, 100 * 2 / 3, rtol=1e-6)

    def test_requires_generate_fn(self):
        ev = FewShotEvaluator(biased_logits_fn(0), TOK)
        with pytest.raises(ValueError):
            ev.evaluate_triviaqa([{"question": "q", "answers": ["a"]}])
