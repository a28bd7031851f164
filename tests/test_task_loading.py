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
