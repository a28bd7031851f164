"""Megakernel vs unfused int8 decode on the real TPU: GPT-2 124M, B=8."""
import functools
import time

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

B, PROMPT, NEW = 8, 64, 512
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
                                 weight_format="int8_xla", lm_head_int8=True)
static = iparams.pop("_static")
mw = pack_mega_weights(iparams, cfg)

rng = np.random.default_rng(0)
prompt = jnp.asarray(rng.integers(0, m.vocab_size, (B, PROMPT)))
T_max = PROMPT + NEW


@jax.jit
def prefill(iparams, ids, caches):
    return infer_forward_unrolled(iparams, ids, cfg, caches, jnp.int32(0),
                                  static=static)


def head(iparams, h):
    hf = _ln(h[:, None, :], iparams["ln_f"]["g"], iparams["ln_f"]["b"],
             m.layer_norm_epsilon)
    if "head_i8" in iparams:
        hf32 = hf.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(hf32), axis=(1, 2), keepdims=True),
                           1e-8)
        xs = amax / 127.0
        qh = jnp.clip(jnp.round(hf32 / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(qh, iparams["head_i8"],
                                  (((2,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (xs[..., :1] * iparams["head_s"])
    return jnp.dot(hf, iparams["wte"].T, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, donate_argnums=(3, 4))
def decode_mega(iparams, mw, tok0, kc, vc, length0):
    def body(carry, i):
        tok, kc, vc = carry
        h = (iparams["wte"][tok[:, 0]]
             + iparams["wpe"][length0 + i][None]).astype(jnp.float32)
        h_out, kc, vc = mega_decode_step(
            h, mw, kc, vc, length0 + i, n_head=m.n_head,
            head_dim=m.head_dim, has_lora=True)
        logits = head(iparams, h_out)
        nxt = jnp.argmax(logits[:, -1:], axis=-1)
        return (nxt, kc, vc), nxt[:, 0]

    (_, kc, vc), toks = jax.lax.scan(body, (tok0, kc, vc), jnp.arange(NEW))
    return toks, kc, vc


@functools.partial(jax.jit, donate_argnums=(2,))
def decode_unfused(iparams, tok0, caches, length0):
    def body(carry, i):
        tok, caches = carry
        logits, caches, _ = infer_forward_unrolled(
            iparams, tok, cfg, caches, length0 + i, static=static)
        nxt = jnp.argmax(logits[:, -1:], axis=-1)
        return (nxt, caches), nxt[:, 0]

    (_, caches), toks = jax.lax.scan(body, (tok0, caches), jnp.arange(NEW))
    return toks, caches


def stack_caches(caches, head_dim, T_cap):
    from llm_qat_tpu.ops.decode_attention import unpack_kv

    def conv(c):  # packed (B, H, Tp, P*D) -> rowmajor (B, T, d)
        u = unpack_kv(c, head_dim)
        r = u.transpose(0, 2, 1, 3).reshape(u.shape[0], u.shape[2], -1)
        pad = T_cap - r.shape[1]
        return jnp.pad(r, ((0, 0), (0, pad), (0, 0))) if pad else r

    ks = jnp.stack([conv(c) for c in caches[0::2]])
    vs = jnp.stack([conv(c) for c in caches[1::2]])
    return ks, vs


T_cap = ((T_max + 127) // 128) * 128
caches = init_layer_caches(cfg, B, T_max, kv_layout="packed")
logits, caches, _ = prefill(iparams, prompt, caches)
tok0 = jnp.argmax(logits[:, -1:], axis=-1)
kc, vc = stack_caches(caches, m.head_dim, T_cap)

# --- unfused baseline ---
toks_u, _ = decode_unfused(iparams, tok0, caches, jnp.int32(PROMPT))
toks_u_host = np.asarray(toks_u)
caches2 = init_layer_caches(cfg, B, T_max, kv_layout="packed")
logits, caches2, _ = prefill(iparams, prompt, caches2)
n_rep = 3
t0 = time.perf_counter()
for _ in range(n_rep):
    toks_u2, caches2 = decode_unfused(iparams, tok0, caches2,
                                      jnp.int32(PROMPT))
    np.asarray(toks_u2)
dt_u = (time.perf_counter() - t0) / n_rep
print(f"unfused: {B * NEW / dt_u:.1f} tok/s  ({dt_u / NEW * 1e3:.3f} ms/step)")

# --- megakernel ---
t_c0 = time.perf_counter()
toks_m, kc, vc = decode_mega(iparams, mw, tok0, kc, vc, jnp.int32(PROMPT))
toks_m_host = np.asarray(toks_m)
print(f"mega compile+run: {time.perf_counter() - t_c0:.1f}s")
match = (toks_m_host == toks_u_host).mean()
print(f"greedy token agreement vs unfused: {match:.4f}")

t0 = time.perf_counter()
for _ in range(n_rep):
    toks_m, kc, vc = decode_mega(iparams, mw, tok0, kc, vc, jnp.int32(PROMPT))
    np.asarray(toks_m)
dt_m = (time.perf_counter() - t0) / n_rep
print(f"mega:    {B * NEW / dt_m:.1f} tok/s  ({dt_m / NEW * 1e3:.3f} ms/step)")
print(f"speedup: {dt_u / dt_m:.2f}x")
