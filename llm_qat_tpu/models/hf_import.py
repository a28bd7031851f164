"""HuggingFace GPT-2 checkpoint import into the SP parameter banks.

Re-design of the reference's weight loading
(`part1_switchable_precision/main_sp.py:55-141`,
`models_sp.py:338-388`): the reference copies HF weights into torch
`nn.Linear`s, transposing Conv1D weights with `.t().contiguous()`
(`models_sp.py:359-377`, `main_sp.py:81-99`) and replicating each pretrained
LayerNorm into every per-precision bank slot (`models_sp.py:347-357`).

Our linear layout is (in, out) == HF Conv1D's (nx, nf) layout, so **no
transpose is needed** — the reference only transposes because torch
`nn.Linear` stores (out, in). LayerNorm gamma/beta broadcast into all P bank
slots; embeddings copy directly; LoRA banks and quantizer scale banks keep
their fresh initialization (the reference also re-initializes adapters and
calibrates quantizers after loading).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from .config import SPModelConfig


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def hf_state_dict_to_sp_params(state_dict: Mapping[str, Any], params,
                               cfg: SPModelConfig):
    """Overlay a HF GPT2LMHeadModel/GPT2Model state_dict onto SP params.

    Accepts keys with or without the `transformer.` prefix. Returns a new
    params pytree; existing LoRA/quantizer banks are preserved.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        sd[k] = _to_np(v)

    m = cfg.model
    P = cfg.quant.n_prec
    L = m.n_layer

    out = dict(params)
    out["wte"] = jnp.asarray(sd["wte.weight"][: m.vocab_size])
    out["wpe"] = jnp.asarray(sd["wpe.weight"][: m.n_positions])

    def stack_layers(key_fmt: str) -> np.ndarray:
        return np.stack([sd[key_fmt.format(i)] for i in range(L)], axis=0)

    def ln_bank(prefix: str) -> Dict[str, Any]:
        # replicate pretrained LN into every precision slot (models_sp.py:347-357)
        g = stack_layers(prefix + ".weight")  # (L, d)
        b = stack_layers(prefix + ".bias")
        return {
            "g": jnp.asarray(np.repeat(g[:, None], P, axis=1)),  # (L, P, d)
            "b": jnp.asarray(np.repeat(b[:, None], P, axis=1)),
        }

    blocks = {k: dict(v) if isinstance(v, dict) else v
              for k, v in params["blocks"].items()}

    name_map = {
        "c_attn": "attn.c_attn",
        "attn_proj": "attn.c_proj",
        "c_fc": "mlp.c_fc",
        "mlp_proj": "mlp.c_proj",
    }
    for ours, hf in name_map.items():
        lin = dict(blocks[ours])
        # HF Conv1D weight is (in, out) — matches our layout, no transpose.
        lin["w"] = jnp.asarray(stack_layers("h.{}." + hf + ".weight"))
        lin["b"] = jnp.asarray(stack_layers("h.{}." + hf + ".bias"))
        blocks[ours] = lin

    blocks["ln1"] = ln_bank("h.{}.ln_1")
    blocks["ln2"] = ln_bank("h.{}.ln_2")
    out["blocks"] = blocks

    out["ln_f"] = {
        "g": jnp.asarray(np.repeat(sd["ln_f.weight"][None], P, axis=0)),
        "b": jnp.asarray(np.repeat(sd["ln_f.bias"][None], P, axis=0)),
    }
    return out


def load_hf_gpt2(params, cfg: SPModelConfig, model_name_or_model="gpt2"):
    """Load pretrained GPT-2 weights (reference `main_sp.py:55-141`).

    `model_name_or_model` may be a transformers model instance (offline
    testing path) or a hub name. Returns updated params.
    """
    if isinstance(model_name_or_model, str):
        from transformers import GPT2LMHeadModel

        hf = GPT2LMHeadModel.from_pretrained(model_name_or_model)
    else:
        hf = model_name_or_model
    return hf_state_dict_to_sp_params(hf.state_dict(), params, cfg)
