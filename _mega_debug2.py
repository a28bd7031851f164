"""Compiled vs interpret at full GPT-2 124M scale, bf16 + f32 caches."""
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig
from llm_qat_tpu.models.inference import quantize_for_inference
from llm_qat_tpu.models.sp_model import init_sp_params
from llm_qat_tpu.ops.mega_decode import pack_mega_weights, mega_decode_step
from llm_qat_tpu.train.calibration_manager import calibrate_weight_quantizers

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
iparams.pop("_static")
mw = pack_mega_weights(iparams, cfg)

B, T_cap = 8, 640
rng = np.random.default_rng(0)
h0 = jnp.asarray(rng.normal(size=(B, m.n_embd)), jnp.float32)

for cdt in (jnp.bfloat16, jnp.float32):
    for pos_i in (64, 0):
        kc = (jnp.asarray(rng.normal(size=(m.n_layer, B, T_cap, m.n_embd)))
              * 0.1).astype(cdt)
        vc = (jnp.asarray(rng.normal(size=(m.n_layer, B, T_cap, m.n_embd)))
              * 0.1).astype(cdt)
        mask = (jnp.arange(T_cap) < pos_i)[None, None, :, None]
        kc = jnp.where(mask, kc, 0)
        vc = jnp.where(mask, vc, 0)
        outs = {}
        for interp in (True, False):
            ho, kco, vco = mega_decode_step(
                h0, mw, kc, vc, jnp.int32(pos_i), n_head=m.n_head,
                head_dim=m.head_dim, has_lora=True, interpret=interp)
            outs[interp] = (np.asarray(ho), np.asarray(kco, np.float32),
                            np.asarray(vco, np.float32))
        dh = np.abs(outs[True][0] - outs[False][0]).max()
        dk = np.abs(outs[True][1] - outs[False][1]).max()
        dv = np.abs(outs[True][2] - outs[False][2]).max()
        hmag = np.abs(outs[True][0]).max()
        print(f"cdt={cdt.__name__} pos={pos_i}: max|dh|={dh:.5f} "
              f"max|dk|={dk:.5f} max|dv|={dv:.5f}  (|h| up to {hmag:.1f})")
