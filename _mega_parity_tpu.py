"""Teacher-forced logit-delta check: mega vs unfused on TPU, same tokens."""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig
from llm_qat_tpu.models.inference import (
    infer_forward_unrolled, init_layer_caches, quantize_for_inference, _ln,
)
from llm_qat_tpu.models.sp_model import init_sp_params
from llm_qat_tpu.ops.mega_decode import pack_mega_weights, mega_decode_step
from llm_qat_tpu.train.calibration_manager import calibrate_weight_quantizers

B, PROMPT, NEW = 8, 64, 32
cfg = SPModelConfig(
    model=GPT2Config(),
    quant=QuantConfig(bit_widths=(4, 8, 32), quantizer_per_bit={8: "minmax"},
                      per_channel=False),
    compute_dtype="bfloat16",
)
m = cfg.model
params = init_sp_params(jax.random.PRNGKey(0), cfg)
params = calibrate_weight_quantizers(params, cfg)
iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.bfloat16,
                                 weight_format="int8_xla")
static = iparams.pop("_static")
mw = pack_mega_weights(iparams, cfg)

rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, m.vocab_size, (B, PROMPT)))
forced = jnp.asarray(rng.integers(0, m.vocab_size, (B, NEW)))
T_max = PROMPT + NEW
T_cap = ((T_max + 127) // 128) * 128


@jax.jit
def prefill(iparams, ids, caches):
    return infer_forward_unrolled(iparams, ids, cfg, caches, jnp.int32(0),
                                  static=static)


@jax.jit
def step_unfused(iparams, tok, caches, pos):
    return infer_forward_unrolled(iparams, tok, cfg, caches, pos,
                                  static=static)


@jax.jit
def step_mega(iparams, mw, tok, kc, vc, pos):
    wte = iparams["wte"]
    h = (wte[tok[:, 0]]
         + iparams["wpe"][pos][None].astype(wte.dtype)).astype(jnp.float32)
    h_out, kc, vc = mega_decode_step(h, mw, kc, vc, pos, n_head=m.n_head,
                                     head_dim=m.head_dim, has_lora=True)
    hf = _ln(h_out[:, None, :], iparams["ln_f"]["g"], iparams["ln_f"]["b"],
             m.layer_norm_epsilon)
    logits = jnp.dot(hf, iparams["wte"].T.astype(hf.dtype),
                     preferred_element_type=jnp.float32)
    return logits, kc, vc


def stack_caches(caches, head_dim, T_cap):
    from llm_qat_tpu.ops.decode_attention import unpack_kv

    def conv(c):
        u = unpack_kv(c, head_dim)
        r = u.transpose(0, 2, 1, 3).reshape(u.shape[0], u.shape[2], -1)
        pad = T_cap - r.shape[1]
        return jnp.pad(r, ((0, 0), (0, pad), (0, 0))) if pad > 0 else r

    return (jnp.stack([conv(c) for c in caches[0::2]]),
            jnp.stack([conv(c) for c in caches[1::2]]))


caches = init_layer_caches(cfg, B, T_max, kv_layout="packed")
logits, caches, _ = prefill(iparams, prompt, caches)
kc, vc = stack_caches(caches, m.head_dim, T_cap)

for i in range(NEW):
    tok = forced[:, i:i + 1]
    pos = jnp.int32(PROMPT + i)
    want, caches, _ = step_unfused(iparams, tok, caches, pos)
    got, kc, vc = step_mega(iparams, mw, tok, kc, vc, pos)
    dl = float(jnp.max(jnp.abs(got - want)))
    agree = float((jnp.argmax(got[:, -1], -1)
                   == jnp.argmax(want[:, -1], -1)).mean())
    if i < 5 or i % 8 == 0 or dl > 1.0:
        print(f"step {i:3d}: max|dlogits|={dl:.4f} argmax agree={agree:.2f}")

# cache content comparison at the end
wk, wv = stack_caches(caches, m.head_dim, T_cap)
print("k cache max diff:",
      float(jnp.max(jnp.abs(kc.astype(jnp.float32) - wk.astype(jnp.float32)))))
print("v cache max diff:",
      float(jnp.max(jnp.abs(vc.astype(jnp.float32) - wv.astype(jnp.float32)))))
