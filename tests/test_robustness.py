"""Part4 robustness tests (reference coverage model:
`part2_cyclic_precision_training/test/test_adversarial_robustness.py:18-139`
and the part4 evaluation driver semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.data import ByteTokenizer
from llm_qat_tpu.models import (
    init_sp_params,
    prec_tables,
    sp_forward,
    tiny_test_config,
)
from llm_qat_tpu.robustness import (
    AttackEvaluator,
    BERTAttack,
    DefenseEvaluator,
    SimplifiedRandomSwitching,
    StaticMLMProposer,
    StaticSynonyms,
    TextFoolerAttack,
    defense_success_rate,
    run_rpi_evaluation,
    token_level_metrics,
)


class TestRandomSwitching:
    def _fwd(self):
        calls = []

        def forward_fn(ids, prec):
            calls.append(int(prec))
            return {"logits": jnp.zeros(ids.shape + (8,))}

        return forward_fn, calls

    def test_no_switch_at_p0(self):
        fwd, calls = self._fwd()
        s = SimplifiedRandomSwitching(fwd, [4, 8, 32], {4: 0, 8: 1, 32: 2},
                                      switch_probability=0.0, seed=0)
        for _ in range(10):
            s.forward_with_switching(np.zeros((1, 4), np.int32))
        assert s.switch_count == 0
        assert set(s.precision_history) == {32}

    def test_switching_statistics(self):
        fwd, calls = self._fwd()
        s = SimplifiedRandomSwitching(fwd, [4, 8, 32], {4: 0, 8: 1, 32: 2},
                                      switch_probability=1.0, seed=3)
        for _ in range(50):
            s.forward_with_switching(np.zeros((1, 4), np.int32))
        stats = s.get_statistics()
        assert stats["total_forwards"] == 50
        assert set(stats["precision_distribution"]) <= {4, 8, 32}
        assert 0.0 < stats["switch_rate"] <= 1.0

    def test_token_level_metrics_uniform(self):
        logits = np.zeros((1, 5, 8), np.float32)
        labels = np.asarray([[1, 2, 3, -100, -100]])
        loss, correct, n = token_level_metrics(logits, labels)
        assert n == 2  # shifted positions 1,2 valid
        np.testing.assert_allclose(loss / n, np.log(8), rtol=1e-5)

    def test_defense_success_math(self):
        # reference criterion: recovery > 0.15
        d = defense_success_rate(0.5, 0.1, 0.3)
        np.testing.assert_allclose(d["recovery_ratio"], 0.5)
        assert d["success"]
        assert not defense_success_rate(0.5, 0.1, 0.12)["success"]


class _ToyVictim:
    """Deterministic toy LM: loss grows when rare words appear (simulates a
    model hurt by substitutions)."""

    BAD = {"feline", "canine", "sprint", "large", "huge"}

    def metrics(self, text):
        words = text.split()
        bad = sum(1 for w in words if w.lower() in self.BAD)
        loss = 1.0 + 0.5 * bad
        acc = max(0.0, 0.8 - 0.2 * bad)
        return loss, acc

    def embed(self, text):
        v = np.zeros(16)
        for i, w in enumerate(text.split()):
            v[hash(w) % 16] += 1
        return v


class TestAttacks:
    def test_textfooler_finds_substitution(self):
        victim = _ToyVictim()
        atk = TextFoolerAttack(victim.metrics, embed_fn=None,
                               synonyms=StaticSynonyms(), sim_threshold=0.0)
        r = atk.generate_adversarial("the big cat can run")
        assert r["num_changes"] >= 1
        assert r["adv_loss"] > r["orig_loss"]
        assert r["success"]  # accuracy dropped > 0.05

    def test_attack_respects_perturb_ratio(self):
        victim = _ToyVictim()
        atk = TextFoolerAttack(victim.metrics, synonyms=StaticSynonyms())
        r = atk.generate_adversarial("the big cat and the big dog run fast",
                                     max_perturb_ratio=0.1)
        assert r["num_changes"] <= 1

    def test_bert_attack_with_static_proposer(self):
        victim = _ToyVictim()

        class Proposer:
            def propose(self, words, idx, k=8):
                return ["feline", "canine"][:k]

        atk = BERTAttack(victim.metrics, proposer=Proposer())
        r = atk.generate_adversarial("the big cat sat down quietly")
        assert r["adv_loss"] >= r["orig_loss"]

    def test_attack_evaluator_aggregates(self):
        victim = _ToyVictim()
        atk = TextFoolerAttack(victim.metrics, synonyms=StaticSynonyms())
        res = AttackEvaluator(atk).evaluate(
            ["the big cat ran", "a small dog sat", "hello world today"]
        )
        assert res["total_samples"] == 3
        assert 0 <= res["attack_success_rate"] <= 1
        assert len(res["adversarial_examples"]) == res["successful_attacks"]


class TestEndToEndRPI:
    def test_rpi_pipeline_report(self):
        victim = _ToyVictim()

        def switched_metrics(text, p, seed):
            # switching partially recovers accuracy (simulates RPI defense)
            loss, acc = victim.metrics(text)
            return loss, min(0.8, acc + 0.3 * p)

        attacks = {
            "TextFooler": TextFoolerAttack(victim.metrics,
                                           synonyms=StaticSynonyms()),
        }
        report = run_rpi_evaluation(
            victim.metrics, switched_metrics, attacks,
            ["the big cat ran home", "a good dog sat down"],
            switch_probs=(0.0, 0.5),
        )
        assert "TextFooler" in report["defense"]
        d = report["defense"]["TextFooler"]["by_probability"]
        assert d["0.5"]["recovery_ratio"] >= d["0.0"]["recovery_ratio"]
        assert report["defense"]["TextFooler"]["optimal_p"] in (0.0, 0.5)


class TestWithRealModel:
    def test_switching_over_sp_model(self):
        """Defense evaluator over the real SP forward at 2 precisions."""
        cfg = tiny_test_config((8, 32))
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        tables = prec_tables(cfg.quant)

        @jax.jit
        def forward_fn(ids, prec):
            return {"logits": sp_forward(params, ids, prec, cfg,
                                         tables=tables)["logits"]}

        ev = DefenseEvaluator(forward_fn, [8, 32], {8: 0, 32: 1})
        samples = [{"input_ids": np.random.default_rng(i).integers(
            0, 200, (1, 12))} for i in range(3)]
        fixed = ev.evaluate_fixed_precision(samples, 32)
        assert np.isfinite(fixed["perplexity"]) and fixed["total_tokens"] > 0
        switched = ev.evaluate_with_switching(samples, 0.5, seed=1)
        assert np.isfinite(switched["perplexity"])
        assert switched["statistics"]["total_forwards"] == 3


class TestGradientImportance:
    def test_gradient_importance_ranks_words(self):
        from llm_qat_tpu.data import ByteTokenizer
        from llm_qat_tpu.robustness.attacks import (
            TextFoolerAttack,
            StaticSynonyms,
            make_gradient_importance_fn,
        )

        cfg = tiny_test_config((8, 32))
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        tok = ByteTokenizer()
        imp_fn = make_gradient_importance_fn(params, cfg, tok, prec_idx=1)
        scores = imp_fn(["the", "big", "cat"])
        assert len(scores) == 3
        assert all(s >= 0 for s in scores)
        assert sum(scores) > 0

        # pluggable into the attack
        victim = _ToyVictim()
        atk = TextFoolerAttack(victim.metrics, synonyms=StaticSynonyms(),
                               importance_fn=imp_fn)
        r = atk.generate_adversarial("the big cat ran")
        assert "adversarial_text" in r
