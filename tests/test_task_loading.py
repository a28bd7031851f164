"""Zero-shot task loading + end-to-end synthetic evaluation."""

import numpy as np
import jax.numpy as jnp

from llm_qat_tpu.evals.task_loading import (
    TASK_SOURCES,
    load_all_tasks,
    synthetic_tasks,
)
from llm_qat_tpu.evals.zero_shot import ZeroShotEvaluator


class TestTaskLoading:
    def test_sources_complete(self):
        assert set(TASK_SOURCES) == {"BoolQ", "HellaSwag", "WinoGrande",
                                     "ARC-e", "ARC-c", "OBQA"}

    def test_offline_returns_none_not_raise(self):
        # zero-egress: loaders must degrade to None, never raise
        tasks = load_all_tasks(["BoolQ"], max_samples=2)
        assert "BoolQ" in tasks  # value may be None offline or a list online

    def test_synthetic_schema_matches_formatters(self):
        tasks = synthetic_tasks(n=4)
        V = 16

        def logits_fn(ids):
            return jnp.zeros(ids.shape + (V,), jnp.float32)

        tok = lambda s: [ord(c) % V for c in s][:40]
        ev = ZeroShotEvaluator(logits_fn, tok, max_length=48, max_samples=4)
        results = ev.evaluate_all_tasks(tasks)
        # every synthetic task must evaluate without error
        assert set(results) == set(tasks) | {"Average"}
        for name, acc in results.items():
            assert 0.0 <= acc <= 100.0, name


def test_markov_corpus_structure():
    """synthetic_markov_corpus: deterministic, table-shared across seeds,
    and genuinely order-2 (context beats unigram prediction)."""
    import numpy as np

    from llm_qat_tpu.data import WordTokenizer, synthetic_markov_corpus

    a = synthetic_markov_corpus(4, seed=0, table_seed=0)
    b = synthetic_markov_corpus(4, seed=0, table_seed=0)
    assert a == b  # deterministic
    c = synthetic_markov_corpus(4, seed=0, table_seed=1)
    assert a != c  # table_seed changes the language

    tok = WordTokenizer(vocab_size=128)
    assert tok.vocab_size == 130  # +pad +eos
    ids = tok(a[0])
    assert 1 <= min(ids) and max(ids) <= 128
    assert tok.decode(ids).split()[:5] == a[0].split()[:5]

    # order-2 structure: trigram continuations concentrate far below the
    # unigram entropy (the mixture keeps them non-deterministic)
    import collections

    tri = collections.defaultdict(collections.Counter)
    for t in synthetic_markov_corpus(256, seed=1, table_seed=0):
        s = tok(t)
        for i in range(2, len(s)):
            tri[(s[i - 2], s[i - 1])][s[i]] += 1
    top1 = [cnt.most_common(1)[0][1] / sum(cnt.values())
            for cnt in tri.values() if sum(cnt.values()) >= 10]
    assert np.mean(top1) > 0.25  # vs ~1/128 for unigram


def test_word_tokenizer_unk_pad():
    from llm_qat_tpu.data import WordTokenizer

    tok = WordTokenizer(texts=["a b c", "b d"])
    assert tok("a d zz") == [tok("a")[0], tok("d")[0], 0]  # unk -> 0
