"""Inference-path equivalence: pre-quantized forward must match the training
forward at the same precision (fake-quant is idempotent on grid values)."""

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
from llm_qat_tpu.models.generate import forward_with_cache, init_kv_cache
from llm_qat_tpu.models.inference import (
    infer_forward_with_cache,
    quantize_for_inference,
)
from llm_qat_tpu.train import CalibrationManager

pytestmark = pytest.mark.slow  # heavy tier; `-m 'not slow'` is the smoke set



@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config((4, 8, 32))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, 16)))
               for _ in range(2)]
    mgr = CalibrationManager(cfg, 2)
    params = mgr.calibrate_all_precisions(params, batches)
    return cfg, params, prec_tables(cfg.quant), batches


class TestPrequantizedEquivalence:
    @pytest.mark.parametrize("bits", [4, 8])
    def test_matches_training_path(self, setup, bits):
        cfg, params, tables, batches = setup
        ids = batches[0][:, :12]
        want = np.asarray(
            sp_forward(params, ids, cfg.quant.prec_index(bits), cfg,
                       tables=tables)["logits"]
        )
        iparams = quantize_for_inference(params, cfg, bits, dtype=jnp.float32)
        cache = init_kv_cache(cfg, ids.shape[0], ids.shape[1])
        got, _ = infer_forward_with_cache(iparams, ids, cfg, cache)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)

    def test_decode_steps_match(self, setup):
        cfg, params, tables, batches = setup
        ids = batches[0][:1, :6]
        iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.float32)
        cache = init_kv_cache(cfg, 1, 10)
        logits, cache = infer_forward_with_cache(iparams, ids, cfg, cache)
        toks = [int(jnp.argmax(logits[0, -1]))]
        for _ in range(3):
            nxt = jnp.asarray([[toks[-1]]])
            logits, cache = infer_forward_with_cache(iparams, nxt, cfg, cache)
            toks.append(int(jnp.argmax(logits[0, -1])))

        # reference: full recompute through the training path
        cur = ids
        ref = []
        for _ in range(4):
            full = sp_forward(params, cur, cfg.quant.prec_index(8), cfg,
                              tables=tables)["logits"]
            t = int(jnp.argmax(full[0, -1]))
            ref.append(t)
            cur = jnp.concatenate([cur, jnp.asarray([[t]])], axis=1)
        assert toks == ref

    def test_bf16_close(self, setup):
        cfg, params, tables, batches = setup
        ids = batches[0][:, :8]
        want = np.asarray(
            sp_forward(params, ids, cfg.quant.prec_index(8), cfg,
                       tables=tables)["logits"]
        )
        iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.bfloat16)
        cache = init_kv_cache(cfg, ids.shape[0], ids.shape[1],
                              dtype=jnp.bfloat16)
        got, _ = infer_forward_with_cache(iparams, ids, cfg, cache)
        # bf16 storage: agreement to ~1e-2 relative
        np.testing.assert_allclose(np.asarray(got), want, rtol=0.1, atol=0.15)


@pytest.fixture(scope="module")
def setup_pt():
    """Per-tensor quantization (the deployment/eval mode the int-serving
    formats target; reference forces per-tensor at eval load,
    `main_sp_eval.py:60`). The int4/int8 static activation scale is exact
    only in this mode — per-channel input quantizers are approximated by
    their max."""
    import dataclasses

    cfg = tiny_test_config((4, 8, 32))
    cfg = dataclasses.replace(
        cfg, quant=dataclasses.replace(cfg.quant, per_channel=False))
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, 16)))
               for _ in range(2)]
    mgr = CalibrationManager(cfg, 2)
    params = mgr.calibrate_all_precisions(params, batches)
    return cfg, params, prec_tables(cfg.quant), batches


class TestInt4Format:
    """weight_format="int4_xla": nibble-packed W4 deployment (VERDICT r2
    missing #2 / BASELINE.md north star). Exact on the minmax-4 grid."""

    def test_codes_roundtrip_exact(self, setup):
        cfg, params, tables, batches = setup
        i4 = quantize_for_inference(params, cfg, 4, dtype=jnp.float32,
                                    weight_format="int4_xla")
        dense = quantize_for_inference(params, cfg, 4, dtype=jnp.float32)
        blocks4, blocksd = i4["blocks"], dense["blocks"]
        for name in ("c_attn", "attn_proj", "c_fc", "mlp_proj"):
            p = np.asarray(blocks4[name]["w_i4"]).astype(np.int32)
            lo = ((p << 28) >> 28)
            hi = (p >> 4)
            codes = np.concatenate([lo, hi], axis=1).astype(np.float32)
            ws = np.asarray(blocks4[name]["w_s"], np.float32)
            wsb = ws[:, None, :] if ws.ndim == 2 else ws[:, None, None]
            wq = np.asarray(blocksd[name]["w_q"], np.float32)
            assert np.abs(codes).max() <= 7
            np.testing.assert_allclose(codes * wsb, wq, rtol=1e-6,
                                       atol=1e-7, err_msg=name)

    def test_forward_matches_training_path(self, setup_pt):
        from llm_qat_tpu.models.inference import (
            infer_forward_unrolled, init_layer_caches,
        )

        cfg, params, tables, batches = setup_pt
        ids = batches[0][:, :12]
        want = np.asarray(
            sp_forward(params, ids, cfg.quant.prec_index(4), cfg,
                       tables=tables)["logits"])
        i4 = quantize_for_inference(params, cfg, 4, dtype=jnp.float32,
                                    weight_format="int4_xla")
        static = i4.pop("_static")
        caches = init_layer_caches(cfg, ids.shape[0], 16, dtype=jnp.float32)
        got, _, _ = infer_forward_unrolled(i4, ids, cfg, caches,
                                           jnp.int32(0), static=static)
        # int32 accumulation vs the f32 fake-quant dots: tiny rounding gap
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-3)

    def test_rejects_non_minmax_bits(self, setup):
        cfg, params, tables, batches = setup
        with pytest.raises(ValueError, match="int4_xla"):
            quantize_for_inference(params, cfg, 8, dtype=jnp.float32,
                                   weight_format="int4_xla")


class TestUnrolledDecode:
    def test_unrolled_matches_scan_path(self, setup):
        from llm_qat_tpu.models.inference import (
            infer_forward_unrolled,
            init_layer_caches,
        )
        import jax.numpy as jnp

        cfg, params, tables, batches = setup
        ids = batches[0][:, :10]
        iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.float32)

        cache = init_kv_cache(cfg, ids.shape[0], 10)
        want, _ = infer_forward_with_cache(iparams, ids, cfg, cache)

        # size 11: room for the incremental step below
        caches = init_layer_caches(cfg, ids.shape[0], 11, dtype=jnp.float32)
        got, new_caches, new_len = infer_forward_unrolled(
            iparams, ids, cfg, caches, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        assert int(new_len) == 10
        # incremental step also matches
        nxt = jnp.argmax(got[:, -1:], axis=-1)
        l2, _, _ = infer_forward_unrolled(iparams, nxt, cfg, new_caches,
                                          new_len)
        cache2 = init_kv_cache(cfg, ids.shape[0], 11)
        full = jnp.concatenate([ids, nxt], axis=1)
        w2, _ = infer_forward_with_cache(iparams, full, cfg, cache2)
        np.testing.assert_allclose(np.asarray(l2[:, -1]),
                                   np.asarray(w2[:, -1]),
                                   rtol=1e-4, atol=1e-4)


class TestInferenceEngine:
    def test_engine_greedy_matches_generate(self, setup):
        from llm_qat_tpu.models.generate import generate
        from llm_qat_tpu.models.inference import InferenceEngine
        import jax.numpy as jnp

        cfg, params, tables, batches = setup
        prompt = batches[0][:1, :5]
        eng = InferenceEngine(params, cfg, bits=8, max_batch=2, max_len=32,
                              dtype=jnp.float32)
        got = eng.generate(prompt, max_new_tokens=6, do_sample=False)
        want = generate(params, prompt, cfg.quant.prec_index(8), cfg,
                        max_new_tokens=6, do_sample=False, tables=tables)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_engine_greedy_matches_generate_varied(self, setup):
        """4-bit, several prompt lengths: the tiny 8-bit model collapses to
        a repeated token, which masked a shifted-by-one emission bug (the
        engine dropped the token sampled from the prefill logits). The
        4-bit T0=3 case produces a varied sequence and catches it."""
        from llm_qat_tpu.models.generate import generate
        from llm_qat_tpu.models.inference import InferenceEngine
        import jax.numpy as jnp

        cfg, params, tables, batches = setup
        eng = InferenceEngine(params, cfg, bits=4, max_batch=2, max_len=32,
                              dtype=jnp.float32)
        for T0 in (3, 5, 7):
            prompt = batches[1][:1, :T0]
            got = eng.generate(prompt, max_new_tokens=4, do_sample=False)
            want = generate(params, prompt, cfg.quant.prec_index(4), cfg,
                            max_new_tokens=4, do_sample=False, tables=tables)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                          err_msg=f"T0={T0}")

    def test_engine_sampled_matches_generate(self, setup):
        """Fixed seed, sampling on: token-for-token equality incl. the FIRST
        token (previously silently greedy, VERDICT r2 weak #2; reference
        samples every token, `models_sp.py:488-491`)."""
        from llm_qat_tpu.models.generate import generate
        from llm_qat_tpu.models.inference import InferenceEngine
        import jax, jax.numpy as jnp

        cfg, params, tables, batches = setup
        eng = InferenceEngine(params, cfg, bits=8, max_batch=2, max_len=32,
                              dtype=jnp.float32)
        prompt = batches[0][:2, :5]
        rng = jax.random.PRNGKey(7)
        got = eng.generate(prompt, max_new_tokens=6, do_sample=True,
                           temperature=0.8, top_k=5, rng=rng)
        want = generate(params, prompt, cfg.quant.prec_index(8), cfg,
                        max_new_tokens=6, do_sample=True, temperature=0.8,
                        top_k=5, rng=rng, tables=tables)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_engine_eos_freeze(self, setup):
        from llm_qat_tpu.models.inference import InferenceEngine
        import jax, jax.numpy as jnp

        cfg, params, tables, batches = setup
        eng = InferenceEngine(params, cfg, bits=8, max_batch=2, max_len=32,
                              dtype=jnp.float32)
        out = eng.generate(batches[0][:1, :4], max_new_tokens=8,
                           do_sample=True, temperature=1.0, eos_token_id=0,
                           rng=jax.random.PRNGKey(5))
        toks = np.asarray(out)[0, 4:]
        if (toks == 0).any():
            first = int(np.argmax(toks == 0))
            assert np.all(toks[first:] == 0)


class TestStaticQuantPath:
    def test_static_matches_traced(self, setup):
        """Cond-free static-precision path == traced-dispatch path."""
        from llm_qat_tpu.models.inference import (
            infer_forward_unrolled,
            init_layer_caches,
        )
        import jax.numpy as jnp

        cfg, params, tables, batches = setup
        ids = batches[0][:, :8]
        for bits in (4, 8):
            iparams = quantize_for_inference(params, cfg, bits,
                                             dtype=jnp.float32)
            static = iparams.pop("_static")
            assert static.bits == bits
            caches = init_layer_caches(cfg, ids.shape[0], 8, jnp.float32)
            traced, _, _ = infer_forward_unrolled(
                iparams, ids, cfg, caches, jnp.int32(0))
            caches = init_layer_caches(cfg, ids.shape[0], 8, jnp.float32)
            staticp, _, _ = infer_forward_unrolled(
                iparams, ids, cfg, caches, jnp.int32(0), static=static)
            np.testing.assert_allclose(np.asarray(staticp),
                                       np.asarray(traced),
                                       rtol=1e-5, atol=1e-5)


class TestInt8PackedWeights:
    def test_int8_format_close_to_dense(self, setup):
        """int8-packed path ≈ dense path (exact for minmax-kind, re-quantized
        for log-kind)."""
        from llm_qat_tpu.models.inference import (
            infer_forward_unrolled,
            init_layer_caches,
        )
        import jax.numpy as jnp

        cfg, params, tables, batches = setup
        ids = batches[0][:, :8]
        for bits in (4, 8):
            dense = quantize_for_inference(params, cfg, bits, jnp.float32)
            sd = dense.pop("_static")
            packed = quantize_for_inference(params, cfg, bits, jnp.float32,
                                            weight_format="int8")
            sp_ = packed.pop("_static")
            assert "w_int8" in packed["blocks"]["c_fc"]
            assert packed["blocks"]["c_fc"]["w_int8"].dtype == jnp.int8

            c1 = init_layer_caches(cfg, ids.shape[0], 8, jnp.float32)
            a, _, _ = infer_forward_unrolled(dense, ids, cfg, c1,
                                             jnp.int32(0), static=sd)
            c2 = init_layer_caches(cfg, ids.shape[0], 8, jnp.float32)
            b, _, _ = infer_forward_unrolled(packed, ids, cfg, c2,
                                             jnp.int32(0), static=sp_)
            a, b = np.asarray(a), np.asarray(b)
            # logits agree closely (int8 regrid of log values adds small err;
            # bf16 kernel compute on TPU adds more — CPU fallback is tighter)
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert corr > 0.99, f"{bits}: corr {corr}"
            assert np.abs(a - b).mean() < 0.5


class TestInt8XLAPath:
    """True-INT8 W8A8 serving path (`weight_format="int8_xla"`): s8xs8->s32
    MXU dot with the activation quantize fused into the prologue. Reference
    semantics: per-tensor symmetric int8 export
    (`part1_switchable_precision/deploy.py:31-34`)."""

    def test_int8_dot_matches_explicit_dequant(self):
        from llm_qat_tpu.models.inference import _int8_dot

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 5, 32)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
        ws = jnp.max(jnp.abs(w), axis=0) / 127.0
        wi = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        got = np.asarray(_int8_dot(x, wi, ws))
        xa = np.max(np.abs(np.asarray(x)), axis=(1, 2), keepdims=True)
        xs = xa / 127.0
        qx = np.clip(np.round(np.asarray(x) / xs), -127, 127)
        ref = (qx * xs) @ (np.asarray(wi, np.float32) * np.asarray(ws))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_bit_exact_at_per_tensor_minmax8(self):
        """On the per-tensor minmax grid (the mode the reference forces at
        eval, `main_sp_eval.py:60`) the int8 tree is bit-identical to the
        fake-quant weights AND the calibrated activation scale reproduces the
        fake-quant activation grid — logits must match exactly (f32)."""
        from llm_qat_tpu.models import (GPT2Config, QuantConfig,
                                        SPModelConfig)
        from llm_qat_tpu.models.inference import (infer_forward_unrolled,
                                                  init_layer_caches)

        cfg = SPModelConfig(
            model=GPT2Config(vocab_size=256, n_positions=64, n_embd=32,
                             n_layer=2, n_head=2),
            quant=QuantConfig(bit_widths=(4, 8, 32),
                              quantizer_per_bit={8: "minmax"},
                              per_channel=False,
                              lora_rank_per_bit={b: 4 for b in range(2, 17)}
                              | {32: 0},
                              lora_alpha_per_bit={b: 8 for b in range(2, 17)}
                              | {32: 0}),
        )
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        batches = [jnp.asarray(rng.integers(0, 256, (2, 16)))
                   for _ in range(2)]
        params = CalibrationManager(cfg, 2).calibrate_all_precisions(
            params, batches)
        ids = batches[0][:, :8]
        outs = {}
        for fmt in ("dense", "int8_xla"):
            ip = quantize_for_inference(params, cfg, 8, jnp.float32,
                                        weight_format=fmt)
            st = ip.pop("_static")
            caches = init_layer_caches(cfg, 2, 8, jnp.float32)
            logits, _, _ = infer_forward_unrolled(ip, ids, cfg, caches,
                                                  jnp.int32(0), static=st)
            outs[fmt] = np.asarray(logits)
        np.testing.assert_allclose(outs["int8_xla"], outs["dense"],
                                   rtol=1e-5, atol=1e-6)

    def test_log_kind_falls_back_to_dynamic(self, setup):
        """Log-kind 8-bit config: no static scale is stored (the calibrated
        log params aren't a linear grid) and the dynamic-quant path stays
        well-correlated with the dense path."""
        from llm_qat_tpu.models.inference import (infer_forward_unrolled,
                                                  init_layer_caches)

        cfg, params, tables, batches = setup
        ids = batches[0][:, :8]
        ip = quantize_for_inference(params, cfg, 8, jnp.float32,
                                    weight_format="int8_xla")
        st = ip.pop("_static")
        assert "x_s" not in ip["blocks"]["c_fc"]  # log kind → dynamic
        assert ip["blocks"]["c_fc"]["w_i8"].dtype == jnp.int8
        caches = init_layer_caches(cfg, ids.shape[0], 8, jnp.float32)
        b, _, _ = infer_forward_unrolled(ip, ids, cfg, caches, jnp.int32(0),
                                         static=st)
        dense = quantize_for_inference(params, cfg, 8, jnp.float32)
        sd = dense.pop("_static")
        caches = init_layer_caches(cfg, ids.shape[0], 8, jnp.float32)
        a, _, _ = infer_forward_unrolled(dense, ids, cfg, caches,
                                         jnp.int32(0), static=sd)
        a, b = np.asarray(a), np.asarray(b)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.95

    def test_factored_lora_matches_folded(self):
        """Rank-factored LoRA (x@Aq@(scaling·Bq), the reference's own
        two-matmul evaluation `lora.py:45-54`) == pre-folded (in, out)
        matrix, with non-zero B (init B is zero, which would vacuously
        pass)."""
        from llm_qat_tpu.models import (GPT2Config, QuantConfig,
                                        SPModelConfig)
        from llm_qat_tpu.models.inference import (infer_forward_unrolled,
                                                  init_layer_caches)

        cfg = SPModelConfig(
            model=GPT2Config(vocab_size=256, n_positions=64, n_embd=32,
                             n_layer=2, n_head=2),
            quant=QuantConfig(bit_widths=(4, 8, 32),
                              quantizer_per_bit={8: "minmax"},
                              per_channel=False,
                              lora_rank_per_bit={b: 4 for b in range(2, 17)}
                              | {32: 0},
                              lora_alpha_per_bit={b: 8 for b in range(2, 17)}
                              | {32: 0}),
        )
        params = init_sp_params(jax.random.PRNGKey(0), cfg)
        key = jax.random.PRNGKey(7)
        for blk in ("c_attn", "attn_proj", "c_fc", "mlp_proj"):
            lin = params["blocks"][blk]
            lin["lora_B"] = 0.05 * jax.random.normal(
                key, lin["lora_B"].shape, lin["lora_B"].dtype)
        rng = np.random.default_rng(0)
        batches = [jnp.asarray(rng.integers(0, 256, (2, 16)))
                   for _ in range(2)]
        params = CalibrationManager(cfg, 2).calibrate_all_precisions(
            params, batches)
        ids = batches[0][:, :8]
        outs = {}
        for fmt in ("folded", "factored"):
            ip = quantize_for_inference(params, cfg, 8, jnp.float32,
                                        weight_format="int8_xla",
                                        lora_format=fmt)
            st = ip.pop("_static")
            if fmt == "factored":
                assert "lora_A" in ip["blocks"]["c_fc"]
            else:
                assert "lora_AB" in ip["blocks"]["c_fc"]
            caches = init_layer_caches(cfg, 2, 8, jnp.float32)
            logits, _, _ = infer_forward_unrolled(ip, ids, cfg, caches,
                                                  jnp.int32(0), static=st)
            outs[fmt] = np.asarray(logits)
        np.testing.assert_allclose(outs["factored"], outs["folded"],
                                   rtol=1e-4, atol=1e-5)

    def test_int8_lm_head(self, setup):
        """int8 weight-tied head: per-vocab-row scales factor out exactly;
        logits stay tightly correlated with the dense head."""
        from llm_qat_tpu.models.inference import (infer_forward_unrolled,
                                                  init_layer_caches)

        cfg, params, tables, batches = setup
        ids = batches[0][:, :8]
        ip = quantize_for_inference(params, cfg, 8, jnp.float32,
                                    weight_format="int8_xla",
                                    lm_head_int8=True)
        st = ip.pop("_static")
        assert ip["head_i8"].dtype == jnp.int8
        assert ip["head_i8"].shape == (cfg.model.vocab_size, cfg.model.n_embd)
        caches = init_layer_caches(cfg, ids.shape[0], 8, jnp.float32)
        b, _, _ = infer_forward_unrolled(ip, ids, cfg, caches, jnp.int32(0),
                                         static=st)
        ip2 = quantize_for_inference(params, cfg, 8, jnp.float32,
                                     weight_format="int8_xla")
        st2 = ip2.pop("_static")
        caches = init_layer_caches(cfg, ids.shape[0], 8, jnp.float32)
        a, _, _ = infer_forward_unrolled(ip2, ids, cfg, caches, jnp.int32(0),
                                         static=st2)
        a, b = np.asarray(a), np.asarray(b)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999
        assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.9


class TestPackedEngine:
    def test_packed_engine_matches_dense(self, setup):
        """kv_layout="packed" engine == dense engine token-for-token (CPU
        f32), including prompts shorter than / unaligned to the pack
        factor (tail tokens go through single decode steps)."""
        from llm_qat_tpu.models.inference import InferenceEngine

        cfg, params, tables, batches = setup
        e_dense = InferenceEngine(params, cfg, bits=8, max_batch=2,
                                  max_len=64, dtype=jnp.float32,
                                  kv_layout="dense")
        e_packed = InferenceEngine(params, cfg, bits=8, max_batch=2,
                                   max_len=64, dtype=jnp.float32,
                                   kv_layout="packed", attn_interpret=True)
        for T0 in (8, 7, 5, 3):
            prompt = batches[0][:2, :T0]
            a = np.asarray(e_dense.generate(prompt, max_new_tokens=5,
                                            do_sample=False))
            b = np.asarray(e_packed.generate(prompt, max_new_tokens=5,
                                             do_sample=False))
            np.testing.assert_array_equal(b, a, err_msg=f"T0={T0}")


class TestFusedDecodeAttention:
    def test_fused_matches_unfused_decode(self, setup):
        from llm_qat_tpu.models.inference import (
            infer_forward_unrolled,
            init_layer_caches,
        )
        import jax.numpy as jnp

        cfg, params, tables, batches = setup
        iparams = quantize_for_inference(params, cfg, 8, jnp.float32)
        static = iparams.pop("_static")
        tok = batches[0][:, :1]

        c1 = init_layer_caches(cfg, tok.shape[0], 8, jnp.float32)
        # seed some prior context rows
        c1 = tuple(c.at[:, :, :3, :].set(0.1) for c in c1)
        c2 = tuple(np.asarray(c).copy() for c in c1)
        c2 = tuple(jnp.asarray(c) for c in c2)

        a, ca, _ = infer_forward_unrolled(iparams, tok, cfg, c1, jnp.int32(3),
                                          static=static)
        b, cb, _ = infer_forward_unrolled(iparams, tok, cfg, c2, jnp.int32(3),
                                          static=static, fused_attention=True,
                                          attn_interpret=True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-3)
        for x, y in zip(ca, cb):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                       rtol=1e-4, atol=1e-4)


class TestQuantizedKVDecode:
    def test_kv8_close_to_dense(self, setup):
        from llm_qat_tpu.models.inference import (
            infer_forward_unrolled,
            init_layer_caches,
        )
        import jax.numpy as jnp

        cfg, params, tables, batches = setup
        iparams = quantize_for_inference(params, cfg, 8, jnp.float32)
        static = iparams.pop("_static")
        ids = batches[0][:, :10]

        dense = init_layer_caches(cfg, ids.shape[0], 12, jnp.float32)
        a, _, _ = infer_forward_unrolled(iparams, ids, cfg, dense,
                                         jnp.int32(0), static=static)
        kv8 = init_layer_caches(cfg, ids.shape[0], 12, kv_bits=8)
        b, kv8b, n = infer_forward_unrolled(iparams, ids, cfg, kv8,
                                            jnp.int32(0), static=static)
        assert int(n) == 10
        a, b = np.asarray(a), np.asarray(b)
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.999, corr
        # incremental step still works on the quantized cache
        nxt = jnp.argmax(b[:, -1:], axis=-1)
        l2, _, _ = infer_forward_unrolled(iparams, nxt, cfg, kv8b,
                                          jnp.int32(10), static=static)
        assert np.isfinite(np.asarray(l2)).all()
