"""Decode-throughput benchmark: SP GPT-2 124M, true-INT8 W8A8 decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md: "no tokens/s
anywhere"; its decode recomputes the full prefix per token,
`part1_switchable_precision/models_sp.py:460-507`), so vs_baseline is null
and the recorded tokens/s/chip series is the round-over-round target.

Path under test: the whole-model decode MEGAKERNEL (`ops/mega_decode.py`)
behind `InferenceEngine(kv_layout="mega", kv_bits=8)` — every transformer
layer of a decode step in ONE grid-pipelined Pallas call (int8 weight-tile
streaming double-buffered under compute, HBM-resident head-interleaved
int8 KV caches with per-row scales and all-s8 attention dots, factored
bf16 LoRA), plus the int8 weight-tied LM head. This is the reference's own
"INT8" configuration, W8A8KV8 (`part3_eval_sp/bit_configurations.py` 8-8-8).
Round-3 progression on chip: unfused 13.9k -> megakernel 20.6k -> +KV8
21.7k tok/s (scripts/mega_tpu_check.py has comparisons and the
teacher-forced parity bound). Completion is forced with a host transfer
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
        # minmax-8 per-tensor: the reference's own eval/deploy mode
        # (`part3_eval_sp/main_sp_eval.py:60` forces per-tensor) and the grid
        # on which int8 codes are exact.
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

    eng = InferenceEngine(params, cfg, bits=8, max_batch=B,
                          max_len=PROMPT + NEW, weight_format="int8_xla",
                          lm_head_int8=True, kv_layout="mega", kv_bits=8)

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

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        cs = decode(cs)
    dt = (time.perf_counter() - t0) / n_rep

    tps = B * NEW / dt
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip_gpt2_124m_int8",
        "value": round(tps, 1),
        "unit": "tokens/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
