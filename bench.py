"""Decode-throughput benchmark: SP GPT-2 124M, true-INT8 W8A8 decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md: "no tokens/s
anywhere"; its decode recomputes the full prefix per token,
`part1_switchable_precision/models_sp.py:460-507`), so vs_baseline is null
and the recorded tokens/s/chip series is the round-over-round target.

Path under test (`llm_qat_tpu/models/inference.py`, `weight_format=
"int8_xla"`): int8 weight codes on the calibrated minmax grid (bit-identical
to the fake-quant weights — see test_inference.py), s8xs8->s32 MXU matmuls
with the activation quantize fused into the prologue, int8 weight-tied LM
head, python-unrolled layers, per-layer donated bf16 KV caches, decode under
one jitted lax.scan. Weight HBM traffic is half of the bf16 path; measured
+23% tok/s over it (docs/RESULTS_R1.md has the progression). Completion is
forced with a host transfer (block_until_ready is unreliable through the
axon tunnel with donated buffers).
"""

import functools
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
        infer_forward_unrolled, init_layer_caches, quantize_for_inference,
    )
    from llm_qat_tpu.train.calibration_manager import calibrate_weight_quantizers

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
    iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.bfloat16,
                                     weight_format="int8_xla",
                                     lm_head_int8=True)
    static = iparams.pop("_static")  # static precision → cond-free kernels

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, PROMPT)))
    T_max = PROMPT + NEW

    @jax.jit
    def prefill(iparams, ids, caches):
        return infer_forward_unrolled(iparams, ids, cfg, caches, jnp.int32(0),
                                      static=static)

    @functools.partial(jax.jit, donate_argnums=(2,))
    def decode_n(iparams, tok0, caches, length0):
        def body(carry, i):
            tok, caches = carry
            logits, caches, _ = infer_forward_unrolled(
                iparams, tok, cfg, caches, length0 + i, static=static)
            nxt = jnp.argmax(logits[:, -1:], axis=-1)
            return (nxt, caches), nxt[:, 0]

        (_, caches), toks = jax.lax.scan(body, (tok0, caches), jnp.arange(NEW))
        return toks, caches

    # packed (B, H, T/2, 2·head_dim) caches + the length-aware HBM decode-
    # attention kernel: unpadded bf16 rows (head_dim 64 is tile-padded to
    # 128 lanes otherwise) and per-step cache traffic ~ live prefix instead
    # of XLA's ~3x T_max (docs/RESULTS_R1.md).
    caches = init_layer_caches(cfg, B, T_max, kv_layout="packed")
    logits, caches, _ = prefill(iparams, prompt, caches)
    tok0 = jnp.argmax(logits[:, -1:], axis=-1)

    toks, caches = decode_n(iparams, tok0, caches, jnp.int32(PROMPT))
    np.asarray(toks)  # warmup + force completion

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        toks, caches = decode_n(iparams, tok0, caches, jnp.int32(PROMPT))
        np.asarray(toks)
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
