"""Real-TPU check for the megakernel engine path (kv_layout="mega").

1. Decode throughput: B=8, 64-token prompt, 512 new tokens — same protocol
   as bench.py so numbers are comparable round-over-round.
2. Greedy step-parity vs the unfused path the kernel mirrors: the megakernel
   reproduces the PACKED serving decode (`decode_attention_hbm` online
   softmax + int8_xla linears), so the oracle is: one shared dense prefill →
   convert the SAME caches to (a) packed layout + unfused decode scan and
   (b) mega layout + megakernel decode scan → compare greedy tokens.
   (Comparing whole engines across kv layouts is NOT exact even without the
   megakernel: packed-vs-dense engines diverge within ~1 token on chip
   because bf16 attention reduction orders differ. The shared-prefill
   comparison isolates exactly the kernel under test.)

Run: python scripts/mega_tpu_check.py  (needs the TPU backend)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    from llm_qat_tpu.models import (
        GPT2Config, QuantConfig, SPModelConfig, init_sp_params,
    )
    from llm_qat_tpu.models.inference import (
        InferenceEngine, init_layer_caches,
    )
    from llm_qat_tpu.ops.decode_attention import pack_kv
    from llm_qat_tpu.train.calibration_manager import (
        calibrate_weight_quantizers,
    )

    assert jax.default_backend() != "cpu", "this script needs the TPU"

    cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(bit_widths=(4, 8, 32),
                          quantizer_per_bit={8: "minmax"},
                          per_channel=False),
        compute_dtype="bfloat16",
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)

    rng = np.random.default_rng(0)
    B, PROMPT, NEW = 8, 64, 512

    print("== building engines (int8_xla bf16) ==", flush=True)
    packed = InferenceEngine(params, cfg, bits=8, max_batch=B,
                             max_len=PROMPT + NEW, weight_format="int8_xla",
                             lm_head_int8=True, kv_layout="packed")
    mega = InferenceEngine(params, cfg, bits=8, max_batch=B,
                           max_len=PROMPT + NEW, weight_format="int8_xla",
                           lm_head_int8=True, kv_layout="mega")

    print("== throughput (B=8, prompt 64, 512 new) ==", flush=True)
    big_prompt = jnp.asarray(
        rng.integers(0, cfg.model.vocab_size, (B, PROMPT)))

    def bench(eng, label):
        out = eng.generate(big_prompt, max_new_tokens=NEW, do_sample=False)
        np.asarray(out)  # warm/compile
        t0 = time.perf_counter()
        out = eng.generate(big_prompt, max_new_tokens=NEW, do_sample=False)
        np.asarray(out)  # host transfer forces completion
        dt = time.perf_counter() - t0
        tps = B * NEW / dt
        print(f"{label}: {dt*1e3:.1f} ms -> {tps:,.0f} tok/s "
              f"({dt/NEW*1e3:.3f} ms/step)", flush=True)
        return tps

    t_packed = bench(packed, "unfused int8_xla + packed KV")
    t_mega = bench(mega, "megakernel")
    print(f"speedup: {t_mega / t_packed:.2f}x", flush=True)

    print("== greedy step-parity, shared prefill (B=2, T0=37, 64 new) ==",
          flush=True)
    T0, N_PAR = 37, 64
    prompt = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (2, T0)))
    T_all = 128  # covers T0 + N_PAR; multiple of the packed unit
    caches = init_layer_caches(cfg, 2, T_all, jnp.bfloat16,
                               kv_layout="dense")
    logits, caches, _ = mega._prefill(mega.iparams, prompt, caches)
    kc, vc = mega._to_mega(caches)
    pk = tuple(pack_kv(c) for c in caches)
    r = jax.random.PRNGKey(0)
    toks_p, _ = packed._decode(
        mega.iparams, logits[:, -1], pk, jnp.int32(T0), r, n_new=N_PAR,
        temperature=1.0, top_k=None, top_p=None, do_sample=False,
        eos_token_id=None)
    toks_m, _, _ = mega._decode_mega(
        mega.iparams, mega.mega, logits[:, -1], kc, vc, jnp.int32(T0), r,
        n_new=N_PAR, temperature=1.0, top_k=None, top_p=None,
        do_sample=False, eos_token_id=None)
    a, b = np.asarray(toks_p), np.asarray(toks_m)
    n_eq = int((a == b).all(axis=0).sum())
    print(f"equal decode steps: {n_eq}/{N_PAR}")
    if not (a == b).all():
        idx = np.argwhere(a != b)
        print("FIRST DIVERGENCE at", idx[0], "packed:", a[tuple(idx[0])],
              "mega:", b[tuple(idx[0])])
    assert (a == b).all(), "megakernel diverged from the packed decode path"
    print("parity OK", flush=True)


if __name__ == "__main__":
    main()
