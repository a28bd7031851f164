"""Sub-stage comparison: jnp mirror of megakernel math vs unfused path (CPU).

One decode step at pos=0 (empty caches -> attention = v_new only), bf16 tree.
"""
import sys
sys.path.insert(0, "tests")
import conftest  # noqa: F401  (forces CPU backend)

import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig
from llm_qat_tpu.models.inference import (
    quantize_for_inference, _ln, _infer_linear, _int8_dot, _lora_branch,
)
from llm_qat_tpu.models.sp_model import init_sp_params
from llm_qat_tpu.ops.mega_decode import pack_mega_weights
from llm_qat_tpu.train.calibration_manager import calibrate_weight_quantizers

cfg = SPModelConfig(
    model=GPT2Config(vocab_size=256, n_positions=64, n_embd=256, n_layer=1,
                     n_head=4),
    quant=QuantConfig(bit_widths=(4, 8, 32), quantizer_per_bit={8: "minmax"},
                      per_channel=False,
                      lora_rank_per_bit={b: 8 for b in range(2, 17)} | {32: 0},
                      lora_alpha_per_bit={b: 16 for b in range(2, 17)} | {32: 0}),
    compute_dtype="bfloat16",
)
m = cfg.model
params = init_sp_params(jax.random.PRNGKey(0), cfg)
params = calibrate_weight_quantizers(params, cfg)
iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.bfloat16,
                                 weight_format="int8_xla")
static = iparams.pop("_static")
mw = pack_mega_weights(iparams, cfg)

B, d, H, D = 4, m.n_embd, m.n_head, m.head_dim
rng = np.random.default_rng(0)
h_bf = jnp.asarray(rng.normal(size=(B, d)), jnp.bfloat16)

bp = jax.tree.map(lambda a: a[0], iparams["blocks"])
eps = m.layer_norm_epsilon

# ---------------- unfused path (mirrors infer_forward_unrolled, S=1, pos=0)
h_u = h_bf[:, None, :]  # (B, 1, d)
hn_u = _ln(h_u, bp["ln1"]["g"], bp["ln1"]["b"], eps)
qkv_u = _infer_linear(hn_u, bp["c_attn"], None, None, cfg, True, static)
qh, kh, vh = jnp.split(qkv_u, 3, axis=-1)
# pos=0 attention == v_new
attn_u = vh.astype(jnp.bfloat16)  # kernel f32 path writes o f32; XLA path?
proj_u = _infer_linear(attn_u, bp["attn_proj"], None, None, cfg, True, static)
h1_u = h_u + proj_u.astype(h_u.dtype)
hn2_u = _ln(h1_u, bp["ln2"]["g"], bp["ln2"]["b"], eps)
fc_u = _infer_linear(hn2_u, bp["c_fc"], None, None, cfg, True, static)
g_u = jax.nn.gelu(fc_u, approximate=False).astype(h_u.dtype)
mlp_u = _infer_linear(g_u, bp["mlp_proj"], None, None, cfg, True, static)
h2_u = h1_u + mlp_u.astype(h_u.dtype)

# ---------------- mega mirror (kernel math with _rt casts)
def rt(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)

def ln32(x, g, b):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return g * (x - mean) * jax.lax.rsqrt(var + eps) + b

def q8(x, xs):
    return jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)

def mega_lin(x32, tiles, xs, lora_at, lora_bt, nt):
    outs = []
    qx = q8(x32, xs)
    for i, t in enumerate(nt):
        acc = jax.lax.dot_general(qx, mw.wt[0, t], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o = acc.astype(jnp.float32) * (xs * mw.ws[0, t]) + mw.bias[0, t]
        if lora_at is not None:
            xa = jnp.dot(x32.astype(mw.at.dtype), mw.at[0, lora_at],
                         preferred_element_type=jnp.float32)
            o = o + jnp.dot(xa.astype(mw.bt.dtype), mw.bt[0, t],
                            preferred_element_type=jnp.float32)
        outs.append(o)
    return jnp.concatenate(outs, axis=-1)

h32 = h_bf.astype(jnp.float32)
hn_m = rt(ln32(h32, mw.ln[0, 0][None], mw.ln[0, 1][None]))
qkv_m = mega_lin(hn_m, mw.wt, mw.xs[0, 0], 0, None, [0, 1, 2])
# redo with lora: qkv tiles use A tile 0, B tiles 0..2
def mega_lin2(x32, xs, a_idx, b_idxs):
    qx = q8(x32, xs)
    outs = []
    xa = jnp.dot(x32.astype(mw.at.dtype), mw.at[0, a_idx],
                 preferred_element_type=jnp.float32) if a_idx is not None else None
    for t in b_idxs:
        acc = jax.lax.dot_general(qx, mw.wt[0, t], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o = acc.astype(jnp.float32) * (xs * mw.ws[0, t][0]) + mw.bias[0, t][0]
        if xa is not None:
            o = o + jnp.dot(xa.astype(mw.bt.dtype), mw.bt[0, t],
                            preferred_element_type=jnp.float32)
        outs.append(o)
    return jnp.concatenate(outs, axis=-1)

qkv_m = mega_lin2(hn_m, mw.xs[0, 0], 0, [0, 1, 2])
q_m, k_m, v_m = jnp.split(qkv_m, 3, axis=-1)
vn = v_m.astype(jnp.bfloat16).astype(jnp.float32)
attn_m = rt(vn)  # pos=0: softmax of single element = 1 -> out = v_new
proj_m = mega_lin2(attn_m, mw.xs[0, 1], 3, [3])
h1_m = rt(h32 + rt(proj_m))
hn2_m = rt(ln32(h1_m, mw.ln[0, 2][None], mw.ln[0, 3][None]))
fc_m = mega_lin2(hn2_m, mw.xs[0, 2], 4, [4, 5, 6, 7])
g_m = rt(jax.nn.gelu(fc_m, approximate=False))
# mlp partials
qg = q8(g_m, mw.xs[0, 3])
acc = sum(jax.lax.dot_general(qg[:, i * d:(i + 1) * d], mw.wt[0, 8 + i],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
          for i in range(4))
mlp_m = acc.astype(jnp.float32) * (mw.xs[0, 3] * mw.ws[0, 11][0]) + mw.bias[0, 11][0]
xam = sum(jnp.dot(g_m[:, i * d:(i + 1) * d].astype(mw.at.dtype),
                  mw.at[0, 8 + i], preferred_element_type=jnp.float32)
          for i in range(4))
mlp_m = mlp_m + jnp.dot(xam.astype(mw.bt.dtype), mw.bt[0, 11],
                        preferred_element_type=jnp.float32)
h2_m = rt(h1_m + rt(mlp_m))


def cmp(name, a, b):
    a = np.asarray(a, np.float32).reshape(B, -1)
    b = np.asarray(b, np.float32).reshape(B, -1)
    print(f"{name:8s} max|d|={np.abs(a - b).max():.6f}  |a|max={np.abs(a).max():.3f}")

cmp("hn", hn_u, hn_m)
cmp("qkv", qkv_u, qkv_m)
cmp("attn", attn_u.astype(jnp.float32), attn_m)
cmp("proj", proj_u, proj_m)
cmp("h1", h1_u, h1_m)
cmp("hn2", hn2_u, hn2_m)
cmp("fc", fc_u, fc_m)
cmp("gelu", g_u.astype(jnp.float32), g_m)
cmp("mlp", mlp_u, mlp_m)
cmp("h2", h2_u, h2_m)
