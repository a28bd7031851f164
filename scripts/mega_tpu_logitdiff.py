"""Teacher-forced logit comparison: megakernel vs unfused packed decode.

Random-weight models have near-uniform logits, so greedy tokens flip on any
bf16 reduction-order difference — token equality is not a meaningful parity
metric on-chip. This measures the actual numeric gap: both paths decode the
SAME forced token sequence from the SAME prefilled caches; report per-step
max |Δlogit| and the top-1 margin distribution.
"""

import sys
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
        InferenceEngine, _ln, _lm_head, infer_forward_unrolled,
        init_layer_caches,
    )
    from llm_qat_tpu.ops.decode_attention import pack_kv
    from llm_qat_tpu.ops.mega_decode import mega_decode_step
    from llm_qat_tpu.train.calibration_manager import (
        calibrate_weight_quantizers,
    )

    cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(bit_widths=(4, 8, 32),
                          quantizer_per_bit={8: "minmax"},
                          per_channel=False),
        compute_dtype="bfloat16",
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    params = calibrate_weight_quantizers(params, cfg)
    m = cfg.model

    eng = InferenceEngine(params, cfg, bits=8, max_batch=2, max_len=128,
                          weight_format="int8_xla", kv_layout="mega")
    ip = eng.iparams
    static = eng.static

    rng = np.random.default_rng(0)
    B, T0, N = 2, 37, 32
    prompt = jnp.asarray(rng.integers(0, m.vocab_size, (B, T0)))
    forced = jnp.asarray(rng.integers(0, m.vocab_size, (B, N)))

    caches = init_layer_caches(cfg, B, 128, jnp.bfloat16, kv_layout="dense")
    logits, caches, _ = eng._prefill(ip, prompt, caches)
    kc, vc = eng._to_mega(caches)
    pk = list(pack_kv(c) for c in caches)

    @jax.jit
    def step_packed(ip, tok, pk, pos):
        return infer_forward_unrolled(ip, tok, cfg, tuple(pk), pos,
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

    diffs, margins, agree = [], [], 0
    for i in range(N):
        tok = forced[:, i:i + 1]
        pos = jnp.int32(T0 + i)
        lp, pk_new, _ = step_packed(ip, tok, pk, pos)
        pk = list(pk_new)
        lm, kc, vc = step_mega(ip, eng.mega, tok, kc, vc, pos)
        a = np.asarray(lp[:, -1], np.float32)
        b = np.asarray(lm[:, 0], np.float32)
        diffs.append(np.abs(a - b).max())
        srt = np.sort(a, axis=-1)
        margins.append((srt[:, -1] - srt[:, -2]).min())
        agree += int((a.argmax(-1) == b.argmax(-1)).all())
    diffs = np.asarray(diffs)
    rel = diffs / max(1e-9, np.abs(a).max())
    print(f"max|dlogit| per step: mean={diffs.mean():.4f} "
          f"max={diffs.max():.4f}")
    print(f"logit magnitude ~{np.abs(a).max():.1f}; "
          f"relative diff max={rel.max():.2e}")
    print(f"top-1 margin (min per step): mean={np.mean(margins):.4f}")
    print(f"argmax agreement: {agree}/{N} steps")


if __name__ == "__main__":
    main()
