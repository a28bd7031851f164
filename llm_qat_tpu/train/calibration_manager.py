"""Calibration runtime: fills the per-precision quantizer scale banks.

Functional re-design of the reference `CalibrationManager`
(`part1_switchable_precision/train_sp.py:32-213`):

- weight quantizers: calibrated directly from the frozen base weights, one
  reduction pass per precision (`train_sp.py:58-88`) — here a single jitted
  tree-map over the stacked (L, in, out) weight leaves;
- input quantizers: N forward batches at the target precision with LoRA
  disabled and input quantizers passing through (`train_sp.py:90-123`) — here
  `sp_forward(..., calibration_mode=True, collect_stats=True,
  input_passthrough=True)` returns per-layer min/max stats which are folded
  across batches and finalized into the (L, P, ch) scale banks;
- LoRA quantizers: the reference re-calibrates them from the current A/B
  every low-bit micro-step (`train_sp.py:125-163,362-364`); our model computes
  those scales dynamically inside `sp_linear`, so no state is kept here;
- `ensure_calibrated` host-side bookkeeping mirrors `train_sp.py:165-176`.

Per-tensor mode further reduces the collected per-channel stats to scalars
(min of mins / max of maxes), which matches what the reference's reduction
produces when `per_channel=False`.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import SPModelConfig
from ..models.sp_model import PrecTables, prec_tables, sp_forward
from ..quant.functional import KIND_LOG, KIND_MINMAX

LINEAR_NAMES = ("c_attn", "attn_proj", "c_fc", "mlp_proj")


def _weight_scale_for(w, bits: float, kind: int, per_channel: bool,
                      symmetric: bool, eps: float):
    """Scale/zp for stacked weights w: (L, d_in, d_out), channel = d_out.

    Reference weight quantizers use channel_dim=0 over torch's (out, in)
    layout (`lora.py:75-79`) == our out axis; reduction per layer.
    """
    axes = (1,) if per_channel else (1, 2)
    if kind == KIND_LOG:
        la = jnp.log2(jnp.maximum(jnp.abs(w), eps))
        mn = jnp.min(la, axis=axes)
        mx = jnp.max(la, axis=axes)
        return mx - mn, mn  # scale=log_range, zp=log_min
    mn = jnp.min(w, axis=axes)
    mx = jnp.max(w, axis=axes)
    if symmetric:
        abs_max = jnp.maximum(jnp.maximum(jnp.abs(mn), jnp.abs(mx)), eps)
        scale = abs_max / (2.0 ** (bits - 1.0) - 1.0)
        return scale, jnp.zeros_like(scale)
    rng_val = jnp.maximum(mx - mn, eps)
    scale = rng_val / (2.0**bits - 1.0)
    return scale, jnp.round(-mn / scale)


def calibrate_weight_quantizers(params, cfg: SPModelConfig):
    """Fill every wq_scale/wq_zp bank slot from the current base weights.

    One pass per student precision over each linear's stacked weights
    (reference `_calibrate_precision` weight phase, `train_sp.py:58-88`).
    """
    q = cfg.quant
    blocks = dict(params["blocks"])
    for name in LINEAR_NAMES:
        lin = dict(blocks[name])
        w = lin["w"]  # (L, in, out)
        wq_scale = lin["wq_scale"]  # (L, P, ch)
        wq_zp = lin["wq_zp"]
        for p_idx, bits in enumerate(q.bit_widths):
            if bits >= 32:
                continue
            kind = KIND_LOG if q.kind_name(bits) == "log" else KIND_MINMAX
            scale, zp = _weight_scale_for(
                w, float(bits), kind, q.per_channel, q.symmetric, q.eps
            )
            if not q.per_channel:
                scale = scale[:, None]
                zp = zp[:, None]
            wq_scale = wq_scale.at[:, p_idx].set(scale)
            wq_zp = wq_zp.at[:, p_idx].set(zp)
        lin["wq_scale"] = wq_scale
        lin["wq_zp"] = wq_zp
        blocks[name] = lin
    out = dict(params)
    out["blocks"] = blocks
    return out


def _collect_input_stats(params, cfg: SPModelConfig, tables: PrecTables,
                         prec_idx: int, batches: Sequence[jax.Array]):
    """Fold input stats over calibration batches at one precision."""

    @jax.jit
    def one_batch(params, ids):
        out = sp_forward(
            params,
            ids,
            jnp.int32(prec_idx),
            cfg,
            tables=tables,
            calibration_mode=True,
            collect_stats=True,
            input_passthrough=True,
        )
        return out["stats"]

    agg = None
    for ids in batches:
        stats = one_batch(params, jnp.asarray(ids))
        if agg is None:
            agg = stats
        else:
            agg = {
                name: {
                    "mm_min": jnp.minimum(agg[name]["mm_min"], stats[name]["mm_min"]),
                    "mm_max": jnp.maximum(agg[name]["mm_max"], stats[name]["mm_max"]),
                    "lg_min": jnp.minimum(agg[name]["lg_min"], stats[name]["lg_min"]),
                    "lg_max": jnp.maximum(agg[name]["lg_max"], stats[name]["lg_max"]),
                }
                for name in agg
            }
    return agg


def _finalize_input_scales(stats_for_linear, bits: float, kind: int,
                           per_channel: bool, symmetric: bool, eps: float):
    """Stats dict {mm_min, mm_max, lg_min, lg_max} (L, ch) → (scale, zp)."""
    if kind == KIND_LOG:
        mn, mx = stats_for_linear["lg_min"], stats_for_linear["lg_max"]
        if not per_channel:
            pass  # already scalar-reduced at collection when per_channel=False
        return mx - mn, mn
    mn, mx = stats_for_linear["mm_min"], stats_for_linear["mm_max"]
    if symmetric:
        abs_max = jnp.maximum(jnp.maximum(jnp.abs(mn), jnp.abs(mx)), eps)
        scale = abs_max / (2.0 ** (bits - 1.0) - 1.0)
        return scale, jnp.zeros_like(scale)
    rng_val = jnp.maximum(mx - mn, eps)
    scale = rng_val / (2.0**bits - 1.0)
    return scale, jnp.round(-mn / scale)


def calibrate_input_quantizers(params, cfg: SPModelConfig,
                               batches: Sequence[jax.Array],
                               precisions: Optional[Iterable[int]] = None,
                               tables: Optional[PrecTables] = None):
    """Calibrate input-quantizer banks for the given student bit-widths.

    Runs the reference's 10-batch stat-collection forwards per precision
    (`train_sp.py:90-123`) with weight quantization active and LoRA disabled,
    then writes the finalized (scale, zp) into the (L, P, ch) banks.
    """
    q = cfg.quant
    tables = tables if tables is not None else prec_tables(q)
    if precisions is None:
        precisions = q.student_bits

    for bits in precisions:
        if bits >= 32:
            continue
        p_idx = q.prec_index(bits)
        kind = KIND_LOG if q.kind_name(bits) == "log" else KIND_MINMAX
        stats = _collect_input_stats(params, cfg, tables, p_idx, batches)
        blocks = dict(params["blocks"])
        for name in LINEAR_NAMES:
            s = stats[name]
            if not q.per_channel:
                s = {k: jnp.min(v, axis=-1, keepdims=True)
                     if "min" in k else jnp.max(v, axis=-1, keepdims=True)
                     for k, v in s.items()}
            scale, zp = _finalize_input_scales(
                s, float(bits), kind, q.per_channel, q.symmetric, q.eps
            )
            lin = dict(blocks[name])
            lin["iq_scale"] = lin["iq_scale"].at[:, p_idx].set(scale)
            lin["iq_zp"] = lin["iq_zp"].at[:, p_idx].set(zp)
            blocks[name] = lin
        params = dict(params)
        params["blocks"] = blocks
    return params


class CalibrationManager:
    """Host-side calibration orchestration (reference `train_sp.py:32-213`).

    Tracks which precisions are calibrated (`ensure_calibrated`,
    `train_sp.py:165-176`) and applies weight+input calibration to the param
    pytree. LoRA quantizer scales need no state — they are computed inline per
    forward (see `sp_model.dynamic_scale`).
    """

    def __init__(self, cfg: SPModelConfig, calibration_batches: int = 10):
        self.cfg = cfg
        self.calibration_batches = calibration_batches
        self.calibrated: set = set()
        self.tables = prec_tables(cfg.quant)

    def calibrate_all_precisions(self, params, batches: Sequence[jax.Array]):
        """Calibrate every student precision (reference `train_sp.py:436-438`)."""
        batches = list(batches)[: self.calibration_batches]
        params = calibrate_weight_quantizers(params, self.cfg)
        params = calibrate_input_quantizers(
            params, self.cfg, batches, self.cfg.quant.student_bits, self.tables
        )
        self.calibrated.update(self.cfg.quant.student_bits)
        return params

    def ensure_calibrated(self, params, bits: int, batches: Sequence[jax.Array]):
        """Lazy re-entry: calibrate `bits` if not yet done (`train_sp.py:165-176`)."""
        if bits >= 32 or bits in self.calibrated:
            return params
        params = calibrate_weight_quantizers(params, self.cfg)
        params = calibrate_input_quantizers(
            params, self.cfg, list(batches)[: self.calibration_batches],
            [bits], self.tables,
        )
        self.calibrated.add(bits)
        return params

    def is_calibrated(self, bits: int) -> bool:
        return bits >= 32 or bits in self.calibrated
