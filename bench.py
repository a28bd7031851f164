"""Decode-throughput benchmark: SP GPT-2 124M, INT8 slot, KV-cached decode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md: "no tokens/s
anywhere"; its decode recomputes the full prefix per token,
`part1_switchable_precision/models_sp.py:460-507`), so vs_baseline is null
and the recorded tokens/s/chip series is the round-over-round target.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from llm_qat_tpu.models import (
        GPT2Config,
        QuantConfig,
        SPModelConfig,
        init_sp_params,
        prec_tables,
    )
    from llm_qat_tpu.models.generate import forward_with_cache, init_kv_cache
    from llm_qat_tpu.train.calibration_manager import calibrate_weight_quantizers

    B = 8
    PROMPT = 64
    NEW = 128

    cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(bit_widths=(4, 8, 32)),
        compute_dtype="bfloat16",
    )
    tables = prec_tables(cfg.quant)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    # input scales: benign defaults are fine for a throughput benchmark
    prec = jnp.int32(cfg.quant.prec_index(8))

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, PROMPT)))

    max_len = PROMPT + NEW
    cache0 = init_kv_cache(cfg, B, max_len, dtype=jnp.bfloat16)

    @jax.jit
    def prefill(params, ids, prec):
        return forward_with_cache(params, ids, prec, cfg, cache0, tables)

    @jax.jit
    def decode_n(params, tok0, cache, prec):
        def body(carry, _):
            tok, cache = carry
            logits, cache = forward_with_cache(params, tok, prec, cfg, cache,
                                               tables)
            nxt = jnp.argmax(logits[:, -1:], axis=-1)
            return (nxt, cache), nxt[:, 0]

        (_, cache), toks = jax.lax.scan(body, (tok0, cache), None, length=NEW)
        return toks, cache

    logits, cache = prefill(params, prompt, prec)
    tok0 = jnp.argmax(logits[:, -1:], axis=-1)

    # warmup (compile)
    toks, _ = decode_n(params, tok0, cache, prec)
    toks.block_until_ready()

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        toks, _ = decode_n(params, tok0, cache, prec)
    toks.block_until_ready()
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
