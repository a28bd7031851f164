"""Continuous-batching engine tests: per-slot correctness vs the sequential
engine, slot recycling, queue draining. (The reference has no serving layer —
SURVEY.md §L8 — so the correctness oracle is our own InferenceEngine.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llm_qat_tpu.models import init_sp_params, tiny_test_config
from llm_qat_tpu.models.inference import InferenceEngine
from llm_qat_tpu.serving import ContinuousBatchingEngine

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set



@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config((8, 32))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


class TestContinuousBatching:
    def test_matches_sequential_engine(self, setup):
        """Interleaved continuous decoding must produce the same tokens as
        generating each prompt alone."""
        cfg, params = setup
        rng = np.random.default_rng(0)
        prompts = [rng.integers(1, 200, (n,)).astype(np.int32)
                   for n in (5, 9, 7)]

        eng = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=2,
                                       max_len=48, dtype=jnp.float32)
        ids = [eng.submit(p, max_new_tokens=6) for p in prompts]
        finished = eng.run_until_done()
        assert set(finished) == set(ids)

        ref = InferenceEngine(params, cfg, bits=8, max_batch=1, max_len=48,
                              dtype=jnp.float32)
        for rid, prompt in zip(ids, prompts):
            want = np.asarray(
                ref.generate(prompt[None], max_new_tokens=6,
                             do_sample=False))[0, len(prompt):]
            got = np.asarray(finished[rid].generated)
            np.testing.assert_array_equal(got, want)

    def test_slot_recycling(self, setup):
        """More requests than slots: slots must be reused."""
        cfg, params = setup
        rng = np.random.default_rng(1)
        eng = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=1,
                                       max_len=32, dtype=jnp.float32)
        ids = [eng.submit(rng.integers(1, 200, (4,)), max_new_tokens=3)
               for _ in range(3)]
        finished = eng.run_until_done()
        assert set(finished) == set(ids)
        for rid in ids:
            assert len(finished[rid].generated) == 3

    def test_zero_max_new_tokens_generates_nothing(self, setup):
        """Regression (r3 advisor): max_new_tokens=0 must not emit the
        prefill-sampled token."""
        cfg, params = setup
        rng = np.random.default_rng(3)
        eng = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=1,
                                       max_len=32, dtype=jnp.float32)
        rid0 = eng.submit(rng.integers(1, 200, (4,)), max_new_tokens=0)
        rid1 = eng.submit(rng.integers(1, 200, (4,)), max_new_tokens=2)
        finished = eng.run_until_done()
        assert finished[rid0].generated == []
        assert len(finished[rid1].generated) == 2

    def test_eos_frees_slot_early(self, setup):
        cfg, params = setup
        rng = np.random.default_rng(2)
        eng = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=1,
                                       max_len=32, eos_token_id=None,
                                       dtype=jnp.float32)
        rid = eng.submit(rng.integers(1, 200, (4,)), max_new_tokens=20)
        finished = eng.run_until_done()
        # without EOS it should stop at max_new_tokens
        assert len(finished[rid].generated) == 20

    def test_overlong_prompt_rejected_cleanly(self, setup):
        """VERDICT r4 #6: cache overflow must be a recoverable host-side
        error, not a TPU-backend abort (the megakernel's pos < T
        contract). A prompt with no room for even one generated token
        raises ValueError at submit; the engine keeps serving."""
        cfg, params = setup
        rng = np.random.default_rng(4)
        eng = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=1,
                                       max_len=16, dtype=jnp.float32)
        with pytest.raises(ValueError, match="capacity"):
            eng.submit(rng.integers(1, 200, (16,)), max_new_tokens=4)
        with pytest.raises(ValueError, match="capacity"):
            eng.submit(rng.integers(1, 200, (40,)), max_new_tokens=4)
        # engine still healthy after the rejections
        rid = eng.submit(rng.integers(1, 200, (4,)), max_new_tokens=2)
        finished = eng.run_until_done()
        assert len(finished[rid].generated) == 2

    def test_max_new_beyond_capacity_truncates(self, setup):
        """A request whose prompt+max_new_tokens exceeds max_len finishes
        early at the cache limit (reference `models_sp.py:501-505` stops at
        n_positions) instead of aborting the backend."""
        cfg, params = setup
        rng = np.random.default_rng(5)
        eng = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=1,
                                       max_len=16, dtype=jnp.float32)
        rid = eng.submit(rng.integers(1, 200, (10,)), max_new_tokens=50)
        finished = eng.run_until_done()
        got = len(finished[rid].generated)
        assert 1 <= got < 50  # truncated at capacity, returned cleanly
        # both chunked and stepwise paths hold the bound
        eng2 = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=1,
                                        max_len=16, dtype=jnp.float32)
        rid2 = eng2.submit(rng.integers(1, 200, (10,)), max_new_tokens=50)
        fin2 = eng2.run_until_done(chunk=8)
        assert 1 <= len(fin2[rid2].generated) < 50

    def test_inference_engine_overlong_raises(self, setup):
        """InferenceEngine.generate enforces the same bound with a
        ValueError (was a bare assert)."""
        cfg, params = setup
        rng = np.random.default_rng(6)
        eng = InferenceEngine(params, cfg, bits=8, max_batch=1, max_len=16,
                              dtype=jnp.float32)
        with pytest.raises(ValueError, match="max_len"):
            eng.generate(rng.integers(1, 200, (1, 10)), max_new_tokens=20)
        with pytest.raises(ValueError, match="max_batch"):
            eng.generate(rng.integers(1, 200, (2, 4)), max_new_tokens=2)

    def test_chunked_matches_stepwise(self, setup):
        """step_chunk(k) must produce identical tokens to per-step decode."""
        cfg, params = setup
        rng = np.random.default_rng(3)
        prompts = [rng.integers(1, 200, (n,)).astype(np.int32)
                   for n in (5, 9, 7)]

        a = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=2,
                                     max_len=48, dtype=jnp.float32)
        ids_a = [a.submit(p, max_new_tokens=7) for p in prompts]
        fin_a = a.run_until_done(chunk=1)

        b = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=2,
                                     max_len=48, dtype=jnp.float32)
        ids_b = [b.submit(p, max_new_tokens=7) for p in prompts]
        fin_b = b.run_until_done(chunk=4)

        for ra, rb in zip(ids_a, ids_b):
            np.testing.assert_array_equal(fin_a[ra].generated,
                                          fin_b[rb].generated)


class TestMegaContinuousBatching:
    """kv_layout='mega' CB engine: whole-model Pallas decode step with
    per-slot positions (VERDICT r3 #6)."""

    @pytest.fixture(scope="class")
    def mega_setup(self):
        from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig
        from llm_qat_tpu.train.calibration_manager import (
            calibrate_input_quantizers, calibrate_weight_quantizers,
        )

        cfg = SPModelConfig(
            model=GPT2Config(vocab_size=256, n_positions=128, n_embd=128,
                             n_layer=2, n_head=2),
            quant=QuantConfig(bit_widths=(8, 32),
                              quantizer_per_bit={8: "minmax"},
                              per_channel=False,
                              lora_rank_per_bit={8: 4, 32: 0},
                              lora_alpha_per_bit={8: 8, 32: 0}),
            compute_dtype="float32",
        )
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        params = calibrate_weight_quantizers(params, cfg)
        rng = np.random.default_rng(1)
        params = calibrate_input_quantizers(
            params, cfg,
            [jnp.asarray(rng.integers(0, 256, (2, 16))) for _ in range(2)])
        return cfg, params

    def test_mega_cb_matches_single_stream_mega_engine(self, mega_setup):
        """One request through the mega CB engine must token-match the
        single-stream kv8 megakernel InferenceEngine (same quantized
        cache math; the per-slot mask reduces to the scalar-pos mask)."""
        from llm_qat_tpu.models.inference import InferenceEngine

        cfg, params = mega_setup
        rng = np.random.default_rng(2)
        prompt = rng.integers(1, 200, (6,))
        kw = dict(bits=8, dtype=jnp.float32, weight_format="int8_xla",
                  kv_layout="mega", kv_bits=8, attn_interpret=True)
        single = InferenceEngine(params, cfg, max_batch=1, max_len=64, **kw)
        want = np.asarray(single.generate(prompt[None], max_new_tokens=5,
                                          do_sample=False))[0, 6:]

        eng = ContinuousBatchingEngine(params, cfg, n_slots=2, max_len=64,
                                       **kw)
        rid = eng.submit(prompt, max_new_tokens=5)
        fin = eng.run_until_done()
        np.testing.assert_array_equal(np.asarray(fin[rid].generated), want)

    def test_mega_cb_mixed_requests_and_recycling(self, mega_setup):
        """Mixed prompt lengths + more requests than slots: every request
        finishes with its own token count, deterministically."""
        cfg, params = mega_setup
        rng = np.random.default_rng(3)
        kw = dict(bits=8, dtype=jnp.float32, weight_format="int8_xla",
                  kv_layout="mega", kv_bits=8, attn_interpret=True)
        prompts = [rng.integers(1, 200, (n,)) for n in (3, 9, 5)]

        def run():
            eng = ContinuousBatchingEngine(params, cfg, n_slots=2,
                                           max_len=64, **kw)
            ids = [eng.submit(p, max_new_tokens=4) for p in prompts]
            fin = eng.run_until_done()
            return [fin[i].generated for i in ids]

        a = run()
        b = run()
        assert all(len(g) == 4 for g in a)
        assert a == b  # deterministic across engine instances


class TestSampling:
    def test_mixed_sampling_reproducible_and_chunk_invariant(self, setup):
        """Slots with different sampling settings (greedy / temp / top-k /
        top-p) interleaved in one batch: same seeds → same tokens, and
        chunked decode == stepwise decode (the per-request fold_in stream
        depends only on the token index)."""
        cfg, params = setup
        rng = np.random.default_rng(4)
        prompts = [rng.integers(1, 200, (n,)).astype(np.int32)
                   for n in (5, 7, 6, 4)]
        kw = [dict(do_sample=False),
              dict(do_sample=True, temperature=0.7),
              dict(do_sample=True, top_k=5),
              dict(do_sample=True, top_p=0.9, temperature=1.3)]

        def run(chunk):
            eng = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=2,
                                           max_len=48, dtype=jnp.float32,
                                           rng=jax.random.PRNGKey(11))
            ids = [eng.submit(p, max_new_tokens=6, **k)
                   for p, k in zip(prompts, kw)]
            fin = eng.run_until_done(chunk=chunk)
            return [fin[i].generated for i in ids]

        a, b, c = run(1), run(1), run(4)
        for ga, gb, gc in zip(a, b, c):
            np.testing.assert_array_equal(ga, gb)
            np.testing.assert_array_equal(ga, gc)
        # the sampled slots actually sample (≥1 differs from greedy rerun)
        eng_g = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=2,
                                         max_len=48, dtype=jnp.float32,
                                         rng=jax.random.PRNGKey(11))
        idg = [eng_g.submit(p, max_new_tokens=6) for p in prompts]
        fing = eng_g.run_until_done()
        greedy = [fing[i].generated for i in idg]
        assert any(ga != gg for ga, gg in zip(a[1:], greedy[1:]))

    def test_greedy_first_token_in_generated(self, setup):
        """`generated` must start with the token sampled from the prefill
        logits (t_T0) — the serving oracle is InferenceEngine.generate."""
        cfg, params = setup
        rng = np.random.default_rng(5)
        prompt = rng.integers(1, 200, (5,)).astype(np.int32)
        eng = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=1,
                                       max_len=32, dtype=jnp.float32)
        rid = eng.submit(prompt, max_new_tokens=1)
        fin = eng.run_until_done()
        ref = InferenceEngine(params, cfg, bits=8, max_batch=1, max_len=32,
                              dtype=jnp.float32)
        want = np.asarray(ref.generate(prompt[None], max_new_tokens=1,
                                       do_sample=False))[0, len(prompt):]
        np.testing.assert_array_equal(fin[rid].generated, want)


class TestPackedContinuousBatching:
    def test_packed_matches_dense_engine(self, setup):
        """kv_layout="packed" continuous batching (per-slot HBM kernel,
        interpret mode on CPU) produces the same tokens as the dense-cache
        engine across interleaved variable-length requests."""
        cfg, params = setup
        rng = np.random.default_rng(0)
        prompts = [rng.integers(1, 200, (n,)).astype(np.int32)
                   for n in (5, 9, 7)]

        dense = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=2,
                                         max_len=48, dtype=jnp.float32,
                                         kv_layout="dense")
        packed = ContinuousBatchingEngine(params, cfg, bits=8, n_slots=2,
                                          max_len=48, dtype=jnp.float32,
                                          kv_layout="packed",
                                          attn_interpret=True)
        ids_d = [dense.submit(p, max_new_tokens=6) for p in prompts]
        ids_p = [packed.submit(p, max_new_tokens=6) for p in prompts]
        fin_d = dense.run_until_done()
        fin_p = packed.run_until_done()
        for rd, rp in zip(ids_d, ids_p):
            np.testing.assert_array_equal(
                np.asarray(fin_p[rp].generated),
                np.asarray(fin_d[rd].generated))
