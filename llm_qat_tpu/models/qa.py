"""Switchable-precision extractive QA model (SQuAD).

Re-implements `SPQuestionAnsweringModel`
(`part5_squad/models_squad.py:336-462`): the SP transformer backbone plus
dropout(0.1) and two Linear(n_embd, 1) heads (start/end, normal std 0.02
init), QA loss = mean of start/end CE with ignore_index=-1
(`models_squad.py:378-399`). Forward returns
{loss?, start_logits, end_logits, hidden_states?}.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .config import SPModelConfig
from .sp_model import PrecTables, init_sp_params, prec_tables, sp_forward


def init_qa_params(rng, cfg: SPModelConfig) -> Dict[str, Any]:
    k_t, k_s, k_e = jax.random.split(rng, 3)
    params = init_sp_params(k_t, cfg)
    d = cfg.model.n_embd
    params["qa_start"] = {
        "w": 0.02 * jax.random.normal(k_s, (d, 1), jnp.float32),
        "b": jnp.zeros((1,), jnp.float32),
    }
    params["qa_end"] = {
        "w": 0.02 * jax.random.normal(k_e, (d, 1), jnp.float32),
        "b": jnp.zeros((1,), jnp.float32),
    }
    return params


def qa_loss_fn(start_logits, end_logits, start_positions, end_positions):
    """Mean of start/end CE, ignore_index=-1 (`models_squad.py:378-399`)."""

    def ce(logits, positions):
        valid = positions >= 0
        safe = jnp.where(valid, positions, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
        nll = jnp.where(valid, nll, 0.0)
        return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)

    return (ce(start_logits, start_positions) + ce(end_logits, end_positions)) / 2.0


def qa_forward(params, input_ids, prec, cfg: SPModelConfig, *,
               tables: Optional[PrecTables] = None, attention_mask=None,
               start_positions=None, end_positions=None,
               deterministic: bool = True, dropout_rng=None,
               calibration_mode: bool = False, collect_stats: bool = False,
               input_passthrough: bool = False,
               output_hidden_states: bool = False):
    """QA forward (`models_squad.py:401-462`).

    The backbone reuses `sp_forward` (hidden trunk only — the LM head's tied
    logits are computed but unused; XLA dead-code-eliminates them since we
    never touch `logits`... except we do need hidden states, so we request
    them and take the final one, matching the reference's use of the ln_f
    output as the QA head input).
    """
    if tables is None:
        tables = prec_tables(cfg.quant)
    out = sp_forward(
        params, input_ids, prec, cfg, tables=tables, mask=attention_mask,
        deterministic=deterministic, dropout_rng=dropout_rng,
        calibration_mode=calibration_mode, collect_stats=collect_stats,
        input_passthrough=input_passthrough, output_hidden_states=True,
    )
    # `trunk` is the live ln_f output (hidden_states entries are detached for
    # distillation parity with the reference's .detach() collection)
    h = out["trunk"]

    if not deterministic and dropout_rng is not None:
        keep = 0.9  # qa_dropout(0.1), models_squad.py:349
        mask = jax.random.bernoulli(dropout_rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)

    start_logits = (h @ params["qa_start"]["w"] + params["qa_start"]["b"])[..., 0]
    end_logits = (h @ params["qa_end"]["w"] + params["qa_end"]["b"])[..., 0]

    result = {"start_logits": start_logits, "end_logits": end_logits}
    if output_hidden_states:
        result["hidden_states"] = out["hidden_states"]
    if collect_stats:
        result["stats"] = out.get("stats")
    if start_positions is not None and end_positions is not None:
        result["loss"] = qa_loss_fn(start_logits, end_logits,
                                    start_positions, end_positions)
    return result
