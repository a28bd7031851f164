"""Real-TPU check for the megakernel engine path (kv_layout="mega").

1. Decode throughput: B=8, 64-token prompt, 512 new tokens — same protocol
   as bench.py so numbers are comparable round-over-round.
2. Numeric step-parity, teacher-forced: one shared dense prefill → decode
   the SAME forced tokens through (a) the dense XLA path, (b) the packed
   `decode_attention_hbm` path, and (c) the megakernel, comparing per-step
   logits. The acceptance bound is RELATIVE to the measured inter-path bf16
   noise: max|mega − packed| must not exceed 2× max(|dense − packed|).
   Greedy-token equality is NOT a meaningful on-chip metric for a
   random-weight model (top-1 margins sit below bf16 noise, so every
   implementation pair diverges within a few tokens — measured for
   dense-vs-packed too); exact-token equality is pinned by the CPU
   interpret-mode suites instead (tests/test_mega_decode.py). Compiled
   kernel == interpret kernel was verified bit-exactly at full GPT-2 dims
   across f32/bf16 tree/cache/act combinations.

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
        calibrate_input_quantizers,
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
    # calibrate INPUT quantizers too: with the default iq_scale=1 the static
    # activation scale quantizes LN-range (~±3) activations to a handful of
    # integer codes — a chaotic regime where any bf16 ulp flips codes and
    # every decode implementation diverges from every other (measured ~1.5
    # max|dlogit| between the dense and packed XLA paths). Calibrated scales
    # are the deployment configuration and make parity meaningful.
    crng = np.random.default_rng(5)
    cal = [jnp.asarray(crng.integers(0, cfg.model.vocab_size, (2, 64)))
           for _ in range(3)]
    params = calibrate_input_quantizers(params, cfg, cal)

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

    print("== teacher-forced step parity (B=2, T0=37, 16 steps) ==",
          flush=True)
    from llm_qat_tpu.models.inference import (
        _lm_head, _ln, infer_forward_unrolled,
    )
    from llm_qat_tpu.ops.mega_decode import mega_decode_step

    m = cfg.model
    ip, static = mega.iparams, mega.static
    T0, N_PAR = 37, 16
    prompt = jnp.asarray(rng.integers(0, m.vocab_size, (2, T0)))
    forced = jnp.asarray(rng.integers(0, m.vocab_size, (2, N_PAR)))
    caches = init_layer_caches(cfg, 2, 128, jnp.bfloat16, kv_layout="dense")
    logits, caches, _ = mega._prefill(ip, prompt, caches)
    kc, vc = mega._to_mega(caches)
    pk = list(pack_kv(c) for c in caches)
    dn = list(caches)

    @jax.jit
    def step_any(ip, tok, caches, pos):
        return infer_forward_unrolled(ip, tok, cfg, tuple(caches), pos,
                                      static=static)

    @jax.jit
    def step_mega(ip, mw, tok, kc, vc, pos):
        wte = ip["wte"]
        h = (wte[tok[:, 0]] + ip["wpe"][pos][None].astype(wte.dtype)
             ).astype(jnp.float32)
        h_out, kc, vc = mega_decode_step(
            h, mw, kc, vc, pos, n_head=m.n_head, head_dim=m.head_dim,
            has_lora=True, eps=m.layer_norm_epsilon,
            act_dtype=jnp.bfloat16)
        hf = _ln(h_out[:, None, :].astype(jnp.bfloat16), ip["ln_f"]["g"],
                 ip["ln_f"]["b"], m.layer_norm_epsilon)
        return _lm_head(ip, hf), kc, vc

    noise, gap = 0.0, 0.0
    for i in range(N_PAR):
        tok = forced[:, i:i + 1]
        pos = jnp.int32(T0 + i)
        ld, dn_new, _ = step_any(ip, tok, dn, pos)
        dn = list(dn_new)
        lp, pk_new, _ = step_any(ip, tok, pk, pos)
        pk = list(pk_new)
        lm_, kc, vc = step_mega(ip, mega.mega, tok, kc, vc, pos)
        a = np.asarray(ld[:, -1], np.float32)
        b = np.asarray(lp[:, -1], np.float32)
        c = np.asarray(lm_[:, 0], np.float32)
        noise = max(noise, float(np.abs(a - b).max()))
        gap = max(gap, float(np.abs(b - c).max()))
    print(f"inter-path bf16 noise |dense-packed|: {noise:.4f}")
    print(f"megakernel gap |packed-mega|:        {gap:.4f}")
    assert gap <= max(2 * noise, 1e-3), (
        f"megakernel logit gap {gap} exceeds 2x the dense-vs-packed bf16 "
        f"noise {noise} — a real numeric divergence, not rounding")
    print("parity OK (within inter-path bf16 noise)", flush=True)


if __name__ == "__main__":
    main()
