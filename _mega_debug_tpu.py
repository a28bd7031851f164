"""Bisect the compiled megakernel vs interpret mode on TPU, tiny config."""
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig
from llm_qat_tpu.models.inference import quantize_for_inference
from llm_qat_tpu.models.sp_model import init_sp_params
from llm_qat_tpu.ops.mega_decode import pack_mega_weights, mega_decode_step
from llm_qat_tpu.train.calibration_manager import calibrate_weight_quantizers

cfg = SPModelConfig(
    model=GPT2Config(vocab_size=256, n_positions=128, n_embd=256,
                     n_layer=2, n_head=4),
    quant=QuantConfig(bit_widths=(4, 8, 32), quantizer_per_bit={8: "minmax"},
                      per_channel=False,
                      lora_rank_per_bit={b: 8 for b in range(2, 17)} | {32: 0},
                      lora_alpha_per_bit={b: 16 for b in range(2, 17)} | {32: 0}),
    compute_dtype="float32",
)
m = cfg.model
params = init_sp_params(jax.random.PRNGKey(0), cfg)
params = calibrate_weight_quantizers(params, cfg)
iparams = quantize_for_inference(params, cfg, 8, dtype=jnp.float32,
                                 weight_format="int8_xla")
iparams.pop("_static")
mw = pack_mega_weights(iparams, cfg)

B, T_cap = 8, 128
rng = np.random.default_rng(0)
h0 = jnp.asarray(rng.normal(size=(B, m.n_embd)), jnp.float32)

for cdt in (jnp.float32,):
    for pos_i, fill in ((0, 0), (3, 3), (40, 40), (41, 41)):
        kc = jnp.asarray(rng.normal(size=(m.n_layer, B, T_cap, m.n_embd)),
                         cdt) * 0.1
        vc = jnp.asarray(rng.normal(size=(m.n_layer, B, T_cap, m.n_embd)),
                         cdt) * 0.1
        # zero beyond the live prefix to make diffs attributable
        mask = (jnp.arange(T_cap) < fill)[None, None, :, None]
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
        print(f"cdt={cdt.__name__} pos={pos_i}: "
              f"max|dh|={dh:.6f} max|dk|={dk:.6f} max|dv|={dv:.6f}")
