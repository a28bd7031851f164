"""Cyclic Precision Training: scheduler, precision range test, calibration, loop.

Re-implements reference part2 orchestration:
- `CyclicPrecisionScheduler` (`cyclic_scheduler.py:5-43`): epoch → bit-width
  via cosine `min + ½(max-min)(1-cos(2πt))` or triangular ramp over
  `epochs_per_cycle = total_epochs/total_cycles`, rounded to the nearest
  configured bit-width.
- `PrecisionRangeTest` (`cyclic_scheduler.py:45-123`): sweep bits upward
  measuring masked-token accuracy; lower bound where relative improvement
  exceeds threshold (or plateaus <0.005 after 3 steps); `find_bounds` →
  `(min(lower, target), min(target+4, max))`.
- `CalibrationManager` (part2 `calibration.py:8-210`): weight/input
  calibration per bit into the multi-bit banks + gradient-quantizer
  calibration via one fwd+bwd at 32 bits (`calibration.py:98-152`).
- epoch loop (`main_cpt.py:30-62,250-286`): pick bit per epoch, ensure
  calibrated, train the full epoch at that bit with plain CE, grad clip,
  cosine LR per step.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import CPTConfig
from ..models.cpt_model import (
    CPTTables,
    cpt_forward,
    cpt_tables,
    prec_index,
)
from ..quant.functional import KIND_LOG, KIND_MINMAX

CPT_LINEAR_NAMES = ("c_attn", "attn_proj", "c_fc", "mlp_proj")


class CyclicPrecisionScheduler:
    """Epoch → bit-width map (`cyclic_scheduler.py:5-43`)."""

    def __init__(self, bit_widths: Sequence[int] = (4, 6, 8),
                 schedule_type: str = "cosine", total_epochs: int = 160,
                 total_cycles: int = 32):
        self.bit_widths = sorted(bit_widths)
        self.min_bits = min(bit_widths)
        self.max_bits = max(bit_widths)
        self.schedule_type = schedule_type
        self.total_epochs = total_epochs
        self.total_cycles = total_cycles
        self.epochs_per_cycle = total_epochs / total_cycles

    def get_precision_for_epoch(self, epoch: int) -> int:
        position = epoch % self.epochs_per_cycle
        t = float(position) / self.epochs_per_cycle
        if self.schedule_type == "cosine":
            p = self.min_bits + 0.5 * (self.max_bits - self.min_bits) * (
                1 - math.cos(t * 2 * math.pi)
            )
        elif self.schedule_type == "triangular":
            if t < 0.5:
                p = self.min_bits + (self.max_bits - self.min_bits) * (2 * t)
            else:
                p = self.max_bits - (self.max_bits - self.min_bits) * (
                    2 * (t - 0.5)
                )
        else:
            raise ValueError(f"Unknown schedule type: {self.schedule_type}")
        return self._round_to_nearest(p)

    def _round_to_nearest(self, precision: float) -> int:
        return min(self.bit_widths, key=lambda bw: abs(precision - bw))


class PrecisionRangeTest:
    """Lower/upper bit-bound search (`cyclic_scheduler.py:45-123`).

    `eval_fn(bits, batch) -> (n_correct, n_total, loss)` is injected so the
    test is model-agnostic (SP or CPT params + jitted forward).
    """

    def __init__(self, eval_fn, start_bits: int, max_bits: int,
                 threshold: float, test_iterations: int, target_bits: int):
        self.eval_fn = eval_fn
        self.start_bits = start_bits
        self.max_bits = max_bits
        self.threshold = threshold
        self.test_iterations = test_iterations
        self.target_bits = target_bits

    def find_lower_bound(self, batches: Sequence) -> int:
        metrics: Dict[int, Dict] = {}
        early_stop = 0.005
        for bits in range(self.start_bits, self.max_bits + 1):
            correct = total = 0
            total_loss, n_batches = 0.0, 0
            for i, batch in enumerate(batches):
                if i >= self.test_iterations:
                    break
                c, t, loss = self.eval_fn(bits, batch)
                correct += int(c)
                total += int(t)
                total_loss += float(loss)
                n_batches += 1
            acc = correct / total if total else 0.0
            metrics[bits] = {
                "accuracy": acc,
                "loss": total_loss / n_batches if n_batches else float("inf"),
            }
            if bits > self.start_bits:
                prev = metrics[bits - 1]["accuracy"]
                improvement = (acc - prev) / max(prev, 1e-6)
                if improvement > self.threshold:
                    return bits
                if improvement < early_stop and bits >= self.start_bits + 3:
                    return bits
        # fallback: biggest absolute jump within start+1..start+3
        best_imp, optimal = 0.0, self.start_bits
        for bits in range(self.start_bits + 1,
                          min(self.start_bits + 4, self.max_bits + 1)):
            if bits in metrics and bits - 1 in metrics:
                imp = metrics[bits]["accuracy"] - metrics[bits - 1]["accuracy"]
                if imp > best_imp:
                    best_imp, optimal = imp, bits
        return optimal

    def find_bounds(self, batches: Sequence) -> Tuple[int, int]:
        lower = self.find_lower_bound(batches)
        upper = min(self.target_bits + 4, self.max_bits)
        return min(lower, self.target_bits), upper


# ---------------------------------------------------------------------------
# CPT calibration (part2 calibration.py)
# ---------------------------------------------------------------------------


def _finalize(mn, mx, bits, kind, symmetric, eps):
    if kind == KIND_LOG:
        return mx - mn, mn
    if symmetric:
        am = jnp.maximum(jnp.maximum(jnp.abs(mn), jnp.abs(mx)), eps)
        s = am / (2.0 ** (bits - 1.0) - 1.0)
        return s, jnp.zeros_like(s)
    rng = jnp.maximum(mx - mn, eps)
    s = rng / (2.0**bits - 1.0)
    return s, jnp.round(-mn / s)


def _weight_stats(w, kind, per_channel, eps, stacked: bool):
    """(min, max) of w in the quantizer domain.

    stacked=True → w has leading layer axis (L, in, out), channel = out.
    stacked=False → (in, out) (the lm_head)."""
    axes = ((1,) if per_channel else (1, 2)) if stacked else (
        (0,) if per_channel else (0, 1)
    )
    if kind == KIND_LOG:
        v = jnp.log2(jnp.maximum(jnp.abs(w), eps))
    else:
        v = w
    return jnp.min(v, axis=axes), jnp.max(v, axis=axes)


class CPTCalibrationManager:
    """Weight/input/gradient-quantizer calibration (part2 `calibration.py`)."""

    def __init__(self, cfg: CPTConfig, calibration_batches: int = 10):
        self.cfg = cfg
        self.calibration_batches = calibration_batches
        self.tables = cpt_tables(cfg)
        self.calibrated: set = set()
        self._kind = KIND_LOG if cfg.quantizer_kind == "log" else KIND_MINMAX

    # -- weights -----------------------------------------------------------
    def calibrate_weights(self, params, precisions: Iterable[int]):
        cfg = self.cfg
        blocks = dict(params["blocks"])
        for name in CPT_LINEAR_NAMES:
            lin = dict(blocks[name])
            mn, mx = _weight_stats(lin["w"], self._kind, cfg.per_channel,
                                   cfg.eps, stacked=True)
            for bits in precisions:
                if bits >= 32:
                    continue
                p = prec_index(cfg, bits)
                s, z = _finalize(mn, mx, float(bits), self._kind,
                                 cfg.symmetric, cfg.eps)
                if not cfg.per_channel:
                    s, z = s[:, None], z[:, None]
                lin["wq_scale"] = lin["wq_scale"].at[:, p].set(s)
                lin["wq_zp"] = lin["wq_zp"].at[:, p].set(z)
            blocks[name] = lin
        params = dict(params)
        params["blocks"] = blocks

        head = dict(params["lm_head"])
        mn, mx = _weight_stats(head["w"], self._kind, cfg.per_channel,
                               cfg.eps, stacked=False)
        for bits in precisions:
            if bits >= 32:
                continue
            p = prec_index(cfg, bits)
            s, z = _finalize(mn, mx, float(bits), self._kind, cfg.symmetric,
                             cfg.eps)
            if not cfg.per_channel:
                s, z = jnp.reshape(s, (1,)), jnp.reshape(z, (1,))
            head["wq_scale"] = head["wq_scale"].at[p].set(s)
            head["wq_zp"] = head["wq_zp"].at[p].set(z)
        params["lm_head"] = head
        return params

    # -- inputs ------------------------------------------------------------
    def calibrate_inputs(self, params, batches, precisions: Iterable[int]):
        """Stat-collection forwards folded across batches, then finalized per
        bit (part2 `calibration.py:17-83`)."""
        return self._calibrate_inputs_folded(params, batches, precisions)

    def _write_input_scales(self, params, agg, head_agg, precisions):
        cfg = self.cfg
        blocks = dict(params["blocks"])
        for name in CPT_LINEAR_NAMES:
            s_all = agg[name]
            lin = dict(blocks[name])
            for bits in precisions:
                if bits >= 32:
                    continue
                p = prec_index(cfg, bits)
                if self._kind == KIND_LOG:
                    mn, mx = s_all["lg_min"], s_all["lg_max"]
                else:
                    mn, mx = s_all["mm_min"], s_all["mm_max"]
                if not cfg.per_channel:
                    mn = jnp.min(mn, axis=-1, keepdims=True)
                    mx = jnp.max(mx, axis=-1, keepdims=True)
                s, z = _finalize(mn, mx, float(bits), self._kind,
                                 cfg.symmetric, cfg.eps)
                lin["iq_scale"] = lin["iq_scale"].at[:, p].set(s)
                lin["iq_zp"] = lin["iq_zp"].at[:, p].set(z)
            blocks[name] = lin
        params = dict(params)
        params["blocks"] = blocks

        head = dict(params["lm_head"])
        for bits in precisions:
            if bits >= 32:
                continue
            p = prec_index(cfg, bits)
            if self._kind == KIND_LOG:
                mn, mx = head_agg["lg_min"], head_agg["lg_max"]
            else:
                mn, mx = head_agg["mm_min"], head_agg["mm_max"]
            if not cfg.per_channel:
                mn = jnp.min(mn, keepdims=True)
                mx = jnp.max(mx, keepdims=True)
            s, z = _finalize(mn, mx, float(bits), self._kind, cfg.symmetric,
                             cfg.eps)
            head["iq_scale"] = head["iq_scale"].at[p].set(s)
            head["iq_zp"] = head["iq_zp"].at[p].set(z)
        params["lm_head"] = head
        return params

    # -- gradient quantizers ----------------------------------------------
    def calibrate_gradient_quantizers(self, params, batch_ids):
        """One fwd+bwd at 32-bit collecting LoRA-grad stats
        (part2 `calibration.py:98-152`), finalized into gq_scale_A/B."""
        cfg = self.cfg
        p32 = prec_index(cfg, 32)

        @jax.jit
        def lora_grads(params, ids):
            def loss_fn(p):
                return cpt_forward(p, ids, p32, cfg, tables=self.tables,
                                   labels=ids)["loss"]

            return jax.grad(loss_fn)(params)

        g = lora_grads(params, jnp.asarray(batch_ids))
        gbits = float(cfg.gradient_bits)

        def scale_for(grad):
            am = jnp.maximum(jnp.max(jnp.abs(grad)), cfg.eps)
            return jnp.reshape(am / (2.0 ** (gbits - 1.0) - 1.0), (1, 1))

        blocks = dict(params["blocks"])
        for name in CPT_LINEAR_NAMES:
            lin = dict(blocks[name])
            gl = g["blocks"][name]
            # per-layer scales stacked: (L, 1, 1)
            ga = jax.vmap(scale_for)(gl["lora_A"])
            gb = jax.vmap(scale_for)(gl["lora_B"])
            lin["gq_scale_A"] = ga
            lin["gq_scale_B"] = gb
            lin["gq_zp_A"] = jnp.zeros_like(ga)
            lin["gq_zp_B"] = jnp.zeros_like(gb)
            blocks[name] = lin
        params = dict(params)
        params["blocks"] = blocks

        head = dict(params["lm_head"])
        head["gq_scale_A"] = scale_for(g["lm_head"]["lora_A"])
        head["gq_scale_B"] = scale_for(g["lm_head"]["lora_B"])
        head["gq_zp_A"] = jnp.zeros_like(head["gq_scale_A"])
        head["gq_zp_B"] = jnp.zeros_like(head["gq_scale_B"])
        params["lm_head"] = head
        return params

    # -- public API --------------------------------------------------------
    def ensure_calibrated(self, params, bits: int, batches):
        """Lazy per-bit calibration (part2 `calibration.py:85-96`)."""
        if bits >= 32 or bits in self.calibrated:
            return params
        params = self.calibrate_weights(params, [bits])
        params = self._calibrate_inputs_folded(params, batches, [bits])
        self.calibrated.add(bits)
        return params

    def _calibrate_inputs_folded(self, params, batches, precisions):
        cfg = self.cfg

        @jax.jit
        def collect(params, ids):
            out = cpt_forward(params, ids, 0, cfg, tables=self.tables,
                              calibration_mode=True, collect_stats=True)
            return out["stats"], out["lm_head_stats"]

        agg = head_agg = None
        for ids in list(batches)[: self.calibration_batches]:
            stats, hstats = collect(params, jnp.asarray(ids))
            if agg is None:
                agg, head_agg = stats, hstats
            else:
                agg = _fold_stats(agg, stats)
                head_agg = _fold_stats(head_agg, hstats)
        return self._write_input_scales(params, agg, head_agg, precisions)


def _fold_stats(a, b):
    def f(path, x, y):
        name = path[-1].key
        return jnp.minimum(x, y) if "min" in name else jnp.maximum(x, y)

    return jax.tree_util.tree_map_with_path(f, a, b)


# ---------------------------------------------------------------------------
# Training loop
# ---------------------------------------------------------------------------


def cpt_trainable_mask(params):
    """CPT trains ONLY the LayerNorm affines and the shared LoRA pair.

    The reference freezes every pretrained base linear weight AND bias —
    `main_cpt.py:117-133` sets `.linear.weight/.bias.requires_grad = False`
    for all four block linears and `:141-142` for lm_head — while ln_1/
    ln_2/ln_f affines (`:107-113,143-144`) and the shared LoRA A/B
    (`:148-152`) stay trainable. This is the source of the report's
    3.2M-trainable (1.9%) CPT footprint vs SP's 132.1M (51.4%)
    (`Report...md:135-139`); round 3's mask wrongly trained the base
    linears too."""
    frozen_leaves = {"wq_scale", "wq_zp", "iq_scale", "iq_zp",
                     "gq_scale_A", "gq_zp_A", "gq_scale_B", "gq_zp_B"}
    linears = {"c_attn", "attn_proj", "c_fc", "mlp_proj", "lm_head"}

    def f(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys[0] in ("wte", "wpe"):
            return False
        if keys[-1] in frozen_leaves:
            return False
        if keys[-1] in ("w", "b") and any(k in linears for k in keys):
            return False  # frozen pretrained base linears
        return True  # LN g/b + shared lora_A/lora_B

    return jax.tree_util.tree_map_with_path(f, params)


def make_cpt_train_step(cfg: CPTConfig, learning_rate: float = 1e-4,
                        total_steps: int = 10000, max_grad_norm: float = 1.0,
                        weight_decay: float = 0.01):
    """Jitted single-precision CE step (`main_cpt.py:30-62`) with gradient
    quantization active on the LoRA branch."""
    tables = cpt_tables(cfg)

    def schedule(count):
        t = jnp.minimum(count, total_steps)
        return 0.5 * learning_rate * (1.0 + jnp.cos(jnp.pi * t / total_steps))

    opt = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(schedule, weight_decay=weight_decay),
    )

    def _masked(params):
        # see sp_trainer._masked_opt: optax.masked leaks raw grads to frozen
        # leaves; multi_transform + set_to_zero freezes them properly.
        labels = jax.tree.map(
            lambda m: "train" if m else "freeze", cpt_trainable_mask(params)
        )
        return optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels
        )

    def init_state(params):
        return {
            "params": params,
            "opt_state": _masked(params).init(params),
            "step": jnp.zeros((), jnp.int32),
        }

    def train_step(state, ids, prec):
        params = state["params"]

        def loss_fn(p):
            return cpt_forward(p, ids, prec, cfg, tables=tables, labels=ids,
                               grad_quant=True)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = _masked(params).update(
            grads, state["opt_state"], params
        )
        params = optax.apply_updates(params, updates)
        return (
            {"params": params, "opt_state": opt_state, "step": state["step"] + 1},
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    return init_state, train_step
