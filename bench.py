"""Benchmark: GPT-2 124M INT4+LoRA (W4A8KV4) decode + SP-QAT train step.

Prints TWO JSON lines; the LAST is the headline the driver parses:
  1. {"metric": "sp_train_step_ms_gpt2_124m", ...}  — full SP distillation
     train step (teacher + 3 students, B=8 T=256 accum=4) ms/step + MFU.
  2. {"metric": "decode_tokens_per_sec_per_chip_gpt2_124m_int4_lora", ...}

The reference publishes no throughput numbers (BASELINE.md: "no tokens/s
anywhere"; its decode recomputes the full prefix per token,
`part1_switchable_precision/models_sp.py:460-507`), so vs_baseline is null
and the recorded series is the round-over-round target.

Decode path — the BASELINE.json north star ("GPT-2 124M INT4+LoRA decoding
at roofline tokens/s/chip") in the reference's named W4A8KV4 configuration
(`part3_eval_sp/bit_configurations.py:4`): the whole-model decode
MEGAKERNEL (`ops/mega_decode.py`) behind `InferenceEngine`, r5 stream diet
on (int8 LoRA banks with SMEM scalar scales, int4 nibble-packed LM head).

Timing methodology (r5, after the r4 tunnel-artifact finding and the r4
advisor note): NO separately-estimated fetch baseline is subtracted.
The decode headline times one 512-token window call and one jitted chain
of K windows IN THE SAME RUN; per-window = (t_K - t_1) / (K - 1), so the
fixed dispatch+fetch roundtrip cancels exactly (same call type, same
sync). The raw amortized K-window rate is also reported. The train metric
uses the same construction with two in-jit scan lengths.
"""

import json
import time

import numpy as np

B = 8
PROMPT = 64
NEW = 512
K_WINDOWS = 3
TRAIN_B, TRAIN_T, TRAIN_ACCUM = 8, 256, 4
TRAIN_INNERS = (2, 8)


def gpt2_flops_per_train_step(cfg, accum):
    """Matmul FLOPs for one full SP iteration (teacher + students), fwd+bwd.

    fwd = 2*P_matmul per token, bwd = 2x fwd (dx + dW) — the standard 6*P
    accounting, plus attention's 2*(2*T*d) per token per layer fwd (x3 for
    bwd). Embedding lookups excluded."""
    m = cfg.model
    d, ff, L, V, T = m.n_embd, 4 * m.n_embd, m.n_layer, m.vocab_size, TRAIN_T
    p_block = d * 3 * d + d * d + d * ff + ff * d
    p_head = d * V  # tied head matmul (teacher CE + student KL paths)
    flops_tok = 6 * (L * p_block + p_head) + 3 * L * 2 * (2 * T * d)
    return flops_tok * TRAIN_B * T * accum


def bench_train():
    import jax
    import jax.numpy as jnp

    from llm_qat_tpu.models import (
        GPT2Config, QuantConfig, SPModelConfig, TrainConfig, init_sp_params,
    )
    from llm_qat_tpu.train import CalibrationManager
    from llm_qat_tpu.train.sp_trainer import make_sp_train_step

    rank = 64
    cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(
            bit_widths=(4, 8, 32),
            lora_rank_per_bit={b: rank for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 2 * rank for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="bfloat16",
        linear_impl="flat",
        scan_unroll=12,
        attention_impl="dense",  # r4: dense beats flash below T=1024
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, cfg.model.vocab_size,
                                     (TRAIN_B, TRAIN_T)))
    params = CalibrationManager(cfg, 1).calibrate_all_precisions(
        params, [batch[:2, :64]])
    tcfg = TrainConfig(batch_size=TRAIN_B, max_seq_length=TRAIN_T,
                       gradient_accumulation_steps=TRAIN_ACCUM,
                       num_iterations=100, eval_interval=10_000,
                       student_mode="vmap",
                       distill_cache_dtype="bfloat16")
    init_state, train_step = make_sp_train_step(cfg, tcfg)

    def make_run(inner):
        def run(state, batch, rng):
            def body(carry, i):
                state = carry
                state, m = train_step(state, batch,
                                      jax.random.fold_in(rng, i))
                return state, m["loss"]
            state, losses = jax.lax.scan(body, state, jnp.arange(inner))
            return state, losses[-1]
        return jax.jit(run, donate_argnums=(0,))

    lo, hi = TRAIN_INNERS
    run_lo, run_hi = make_run(lo), make_run(hi)
    state = init_state(jax.tree.map(jnp.array, params))

    def timed(fn, state, key, reps=3):
        state2, loss = fn(state, batch, jax.random.PRNGKey(key))
        float(loss)  # compile + sync
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            state2, loss = fn(state2, batch, jax.random.PRNGKey(key + i))
            float(loss)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), state2

    t_lo, state = timed(run_lo, state, 1)
    t_hi, state = timed(run_hi, state, 100)
    step_s = (t_hi - t_lo) / (hi - lo)  # dispatch+fetch cancels
    flops = gpt2_flops_per_train_step(cfg, TRAIN_ACCUM)
    mfu = flops / step_s / 197e12  # v5e bf16 peak
    print(json.dumps({
        "metric": "sp_train_step_ms_gpt2_124m",
        "value": round(step_s * 1e3, 1),
        "unit": "ms",
        "vs_baseline": None,
        "mfu": round(mfu, 3),
        "detail": f"B={TRAIN_B} T={TRAIN_T} accum={TRAIN_ACCUM} "
                  f"teacher+{TRAIN_ACCUM-1} students, same-run "
                  f"(t{hi}-t{lo})/{hi-lo}",
    }), flush=True)


def _decode_rate_b16(params, cfg):
    """Production-batch throughput point: the kernel is stream-bound, so
    per-step time is ~batch-independent and B=16 nearly doubles
    tokens/s/chip (docs/RESULTS_R5.md). Measured with the B=16-optimal
    bank format (bf16 LoRA — int8 banks reverse at this batch)."""
    import jax
    import jax.numpy as jnp

    from llm_qat_tpu.models.inference import (
        InferenceEngine, init_layer_caches,
    )

    B16 = 16
    eng = InferenceEngine(params, cfg, bits=4, max_batch=B16,
                          max_len=PROMPT + NEW, weight_format="int4_xla",
                          lm_head_bits=8, kv_layout="mega", kv_bits=4,
                          mega_tbp=64, mega_lora_int8=False)
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.integers(0, cfg.model.vocab_size,
                                      (B16, PROMPT)))
    T_all = -(-(PROMPT + NEW) // 32) * 32
    caches = init_layer_caches(cfg, B16, T_all, jnp.bfloat16,
                               kv_layout="dense")
    logits, caches, _ = eng._prefill(eng.iparams, prompt, caches)
    cs = eng._to_mega(caches)
    l0 = logits[:, -1]
    kw = dict(n_new=NEW, temperature=1.0, top_k=None, top_p=None,
              do_sample=False, eos_token_id=None)

    def dec(cs):
        toks, *cs = eng._decode_mega_kv8(
            eng.iparams, eng.mega, l0, *cs, jnp.int32(PROMPT),
            jax.random.PRNGKey(0), **kw)
        np.asarray(toks)
        return tuple(cs)

    cs = dec(cs)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        cs = dec(cs)
        ts.append(time.perf_counter() - t0)
    # window-pair subtraction is overkill here (informational field);
    # the raw median slightly UNDER-reports (carries one dispatch+fetch)
    return B16 * NEW / float(np.median(ts))


def bench_decode():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from llm_qat_tpu.models import (
        GPT2Config, QuantConfig, SPModelConfig, init_sp_params,
    )
    from llm_qat_tpu.models.inference import (
        InferenceEngine, init_layer_caches,
    )
    from llm_qat_tpu.train.calibration_manager import (
        calibrate_input_quantizers, calibrate_weight_quantizers,
    )

    cfg = SPModelConfig(
        model=GPT2Config(),
        # minmax per-tensor: the reference's own eval/deploy mode
        # (`part3_eval_sp/main_sp_eval.py:60` forces per-tensor) and the
        # grid on which int4/int8 codes are exact.
        quant=QuantConfig(bit_widths=(4, 8, 32),
                          quantizer_per_bit={8: "minmax"},
                          per_channel=False),
        compute_dtype="bfloat16",
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    crng = np.random.default_rng(5)
    cal = [jnp.asarray(crng.integers(0, cfg.model.vocab_size, (2, 64)))
           for _ in range(3)]
    params = calibrate_input_quantizers(params, cfg, cal)

    eng = InferenceEngine(params, cfg, bits=4, max_batch=B,
                          max_len=PROMPT + NEW, weight_format="int4_xla",
                          lm_head_bits=4, kv_layout="mega", kv_bits=4,
                          mega_tbp=64)

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, PROMPT)))

    T_all = -(-(PROMPT + NEW) // 32) * 32
    caches = init_layer_caches(cfg, B, T_all, jnp.bfloat16,
                               kv_layout="dense")
    logits, caches, _ = eng._prefill(eng.iparams, prompt, caches)
    cs = eng._to_mega(caches)
    logits0 = logits[:, -1]
    kw = dict(n_new=NEW, temperature=1.0, top_k=None, top_p=None,
              do_sample=False, eos_token_id=None)

    def decode1(cs):
        toks, *cs = eng._decode_mega_kv8(
            eng.iparams, eng.mega, logits0, *cs, jnp.int32(PROMPT),
            jax.random.PRNGKey(0), **kw)
        np.asarray(toks)  # host transfer forces completion
        return tuple(cs)

    # K windows chained inside ONE jit: each re-decodes the same window
    # (cache state threads through, so XLA cannot CSE the iterations)
    @partial(jax.jit, donate_argnums=(0,))
    def decode_k_fn(cs):
        last = None
        for i in range(K_WINDOWS):
            toks, *cs = eng._decode_mega_kv8(
                eng.iparams, eng.mega, logits0, *cs, jnp.int32(PROMPT),
                jax.random.PRNGKey(i), **kw)
            last = toks
        return last, tuple(cs)

    def decode_k(cs):
        toks, cs = decode_k_fn(cs)
        np.asarray(toks)
        return cs

    cs = decode1(cs)   # compile single window
    cs = decode_k(cs)  # compile K-window chain

    n_rep = 5
    t1s, tks = [], []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        cs = decode1(cs)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        cs = decode_k(cs)
        tks.append(time.perf_counter() - t0)
    t1 = float(np.median(t1s))
    tk = float(np.median(tks))
    # same-call-type subtraction: dispatch + fetch cancel exactly
    per_window = max((tk - t1) / (K_WINDOWS - 1), 1e-9)
    tps = B * NEW / per_window
    raw_amortized = B * NEW * K_WINDOWS / tk
    # best-window rate: the tunnel shares the chip with other tenants and
    # session-to-session spread reaches ±20-40% (docs/RESULTS_R5.md); the
    # min-based figure estimates uncontended chip capability
    best = B * NEW / max((min(tks) - min(t1s)) / (K_WINDOWS - 1), 1e-9)
    try:
        b16 = round(_decode_rate_b16(params, cfg), 1)
    except Exception:
        b16 = None
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip_gpt2_124m_int4_lora",
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": None,
        "raw_amortized": round(raw_amortized, 1),
        "best_window": round(best, 1),
        "b16_tokens_per_sec": b16,
        "detail": f"W4A8KV4 + int8-LoRA banks + int4 head; B={B} "
                  f"new={NEW}; per-window=(t{K_WINDOWS}-t1)/"
                  f"{K_WINDOWS-1}, raw={K_WINDOWS}-window wall",
    }), flush=True)


def main():
    try:
        bench_train()
    except Exception as e:  # decode headline must still print
        print(json.dumps({"metric": "sp_train_step_ms_gpt2_124m",
                          "value": None, "unit": "ms",
                          "vs_baseline": None,
                          "error": repr(e)[:200]}), flush=True)
    bench_decode()


if __name__ == "__main__":
    main()
