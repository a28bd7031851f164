"""KV-cache decode tests: the cached path must match full-prefix recomputation
(the reference decodes by full recompute, `models_sp.py:467-468`; our KV cache
is the TPU-native replacement and must be numerically equivalent)."""

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
from llm_qat_tpu.models.generate import (

    forward_with_cache,
    generate,
    init_kv_cache,
    _filter_logits,
)

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config((8, 32))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    tables = prec_tables(cfg.quant)
    return cfg, params, tables


class TestKVCacheEquivalence:
    def test_prefill_matches_full_forward(self, setup):
        cfg, params, tables = setup
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 200, (2, 12)))
        full = sp_forward(params, ids, 1, cfg, tables=tables)["logits"]
        cache = init_kv_cache(cfg, 2, 12)
        cached, new_cache = forward_with_cache(params, ids, 1, cfg, cache, tables)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(cached), rtol=2e-4, atol=2e-4
        )
        assert int(new_cache.length) == 12

    def test_incremental_decode_matches_full(self, setup):
        """Token-by-token decode with cache == full-prefix forward each step."""
        cfg, params, tables = setup
        rng = np.random.default_rng(1)
        prompt = jnp.asarray(rng.integers(0, 200, (1, 5)))

        # cached path: prefill then 4 single-token steps
        cache = init_kv_cache(cfg, 1, 16)
        logits, cache = forward_with_cache(params, prompt, 1, cfg, cache, tables)
        ids = prompt
        cached_last = [np.asarray(logits[:, -1])]
        for _ in range(4):
            nxt = jnp.argmax(logits[:, -1:], axis=-1)
            ids = jnp.concatenate([ids, nxt], axis=1)
            logits, cache = forward_with_cache(params, nxt, 1, cfg, cache, tables)
            cached_last.append(np.asarray(logits[:, -1]))

        # reference path: full recompute per step (what models_sp.py:467 does)
        full_last = []
        cur = prompt
        for i in range(5):
            full = sp_forward(params, cur, 1, cfg, tables=tables)["logits"]
            full_last.append(np.asarray(full[:, -1]))
            nxt = jnp.argmax(full[:, -1:], axis=-1)
            cur = jnp.concatenate([cur, nxt], axis=1)

        for a, b in zip(cached_last, full_last):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)

    def test_generate_greedy_matches_reference_loop(self, setup):
        cfg, params, tables = setup
        prompt = jnp.asarray([[3, 17, 42]])
        out = generate(params, prompt, 1, cfg, max_new_tokens=6,
                       do_sample=False, tables=tables)
        assert out.shape == (1, 9)

        cur = prompt
        for _ in range(6):
            logits = sp_forward(params, cur, 1, cfg, tables=tables)["logits"]
            nxt = jnp.argmax(logits[:, -1:], axis=-1)
            cur = jnp.concatenate([cur, nxt], axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(cur))

    def test_generate_respects_precision(self, setup):
        cfg, params, tables = setup
        prompt = jnp.asarray([[3, 17, 42]])
        o8 = generate(params, prompt, 0, cfg, max_new_tokens=5,
                      do_sample=False, tables=tables)
        o32 = generate(params, prompt, 1, cfg, max_new_tokens=5,
                       do_sample=False, tables=tables)
        # different precisions generally diverge on random weights
        assert o8.shape == o32.shape


class TestLogitFiltering:
    def test_top_k(self):
        logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
        f = _filter_logits(logits, 1.0, 2, None)
        valid = np.asarray(f)[0] > -1e29
        np.testing.assert_array_equal(valid, [False, True, True, False])

    def test_top_p_keeps_first_above_threshold(self):
        # one dominant token: top_p tiny must still keep it
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        f = _filter_logits(logits, 1.0, None, 0.01)
        valid = np.asarray(f)[0] > -1e29
        assert valid[0]
        assert valid.sum() == 1

    def test_vec_matches_scalar_with_topk_and_topp(self):
        """Regression (r3 advisor, medium): _filter_logits_vec computed the
        top-p mass on the PRE-top-k distribution, widening the nucleus vs
        the scalar path / reference (models_sp.py:478-486). Both knobs set,
        vec and scalar must keep identical token sets."""
        from llm_qat_tpu.models.generate import _filter_logits_vec
        rng = np.random.default_rng(11)
        logits = jnp.asarray(rng.normal(size=(4, 50)) * 3, jnp.float32)
        for tk, tp in [(5, 0.5), (3, 0.9), (10, 0.3)]:
            want = np.asarray(_filter_logits(logits, 1.0, tk, tp)) > -1e29
            got = np.asarray(_filter_logits_vec(
                logits, jnp.full((4,), 1.0), jnp.full((4,), tk, jnp.int32),
                jnp.full((4,), tp, jnp.float32))) > -1e29
            np.testing.assert_array_equal(got, want)

    def test_temperature_scales(self):
        logits = jnp.asarray([[2.0, 4.0]])
        f = _filter_logits(logits, 2.0, None, None)
        np.testing.assert_allclose(np.asarray(f), [[1.0, 2.0]])

    def test_eos_freezes_sequence(self):
        cfg = tiny_test_config((32,))
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        tables = prec_tables(cfg.quant)
        prompt = jnp.asarray([[1, 2]])
        out = generate(params, prompt, 0, cfg, max_new_tokens=8,
                       do_sample=True, temperature=1.0,
                       rng=jax.random.PRNGKey(3), eos_token_id=0,
                       tables=tables)
        toks = np.asarray(out)[0, 2:]
        if (toks == 0).any():
            first = int(np.argmax(toks == 0))
            assert np.all(toks[first:] == 0)
