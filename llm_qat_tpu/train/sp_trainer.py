"""Switchable-precision training: one jitted multi-precision step.

TPU-native re-design of the reference SP train loop
(`part1_switchable_precision/train_sp.py:309-516`). The reference runs, per
iteration, `gradient_accumulation_steps` (8) host-driven micro-steps over the
SAME batch: micro-step 0 is the 32-bit teacher (CE loss + teacher-cache
update), micro-steps 1..7 each pick a random student bit and compute the
distillation loss; each micro-loss is divided by the accumulation count and
backprop'd, then one optimizer step with global-norm clipping
(`train_sp.py:341-397`). The CosineAnnealingLR is stepped once per micro-step
(`train_sp.py:380-381`).

Here the whole iteration is ONE jitted function:
- teacher fwd+bwd at the max-bits slot (CE, `models_sp.py:441-449`) whose
  outputs (logits + hidden states) double as the teacher cache
  (`distillation_manager.py:34-62` — same batch, so the reference cache always
  hits; see train/distillation.py);
- a `lax.scan` over the 7 student micro-steps, each sampling a student
  precision slot and a random feature layer with `jax.random` (reference
  `random.choice`, `train_sp.py:353-359`, `distillation_manager.py:103`);
- gradients averaged (sum of per-micro-loss/accum grads), clipped to
  max_grad_norm, AdamW over trainable leaves only (frozen: wte/wpe and the
  quantizer scale banks — reference freezes embeddings in `main_sp.py:55-141`
  and unfreezes linears+LN at 32-bit, `models_sp.py:197-222`);
- LoRA quantizer re-calibration per micro-step (`train_sp.py:362-364`) is
  implicit: `sp_linear` computes LoRA scales inline from the live A/B.

AMP GradScaler is unnecessary on TPU (bf16 needs no loss scaling).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import SPModelConfig, TrainConfig
from ..models.sp_model import PrecTables, lm_cross_entropy, prec_tables, sp_forward
from .distillation import TeacherOutputs, distillation_loss, prepare_teacher


def trainable_mask(params) -> Any:
    """True for trainable leaves.

    Frozen: wte/wpe (reference `main_sp.py:55-141` freezes embeddings) and the
    quantizer scale/zero-point banks (buffers, not parameters, in the
    reference). Trainable: linear w/b, LoRA A/B, LayerNorm banks
    (`models_sp.py:197-222`).
    """
    frozen_names = {"wq_scale", "wq_zp", "iq_scale", "iq_zp"}

    def f(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        if "wte" in keys or "wpe" in keys:
            return False
        return keys[-1] not in frozen_names

    return jax.tree_util.tree_map_with_path(f, params)


def cosine_lr(base_lr: float, total_micro_steps: int, accum: int):
    """Per-iteration LR matching torch CosineAnnealingLR stepped per micro-step.

    The reference steps the scheduler `accum` times per optimizer step
    (`train_sp.py:380-381`) with T_max = num_iterations * accum
    (`train_sp.py:448-450`), so the LR used by optimizer step i is
    cosine at t = i * accum.
    """

    def schedule(count):
        t = jnp.minimum(count * accum, total_micro_steps)
        return 0.5 * base_lr * (1.0 + jnp.cos(jnp.pi * t / total_micro_steps))

    return schedule


class SPTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_sp_train_step(cfg: SPModelConfig, tcfg: TrainConfig,
                       tables: Optional[PrecTables] = None,
                       attention_fn=None, forward_fn=None):
    """Build (init_state, train_step) for the SP multi-precision loop.

    `train_step(state, batch_ids, rng)` returns (state, metrics) and is safe
    to jit/pjit; precision sampling happens inside with `jax.random`.

    `attention_fn` is forwarded to `sp_forward` — pass
    `partial(ring_attention, mesh=mesh, axis_name=...)` to train with
    context-parallel (sequence-sharded) attention inside the same jitted
    step (see `parallel/cp_forward.py`; exercised by
    `__graft_entry__.dryrun_multichip`).

    `forward_fn` swaps the model forward wholesale (mutually exclusive
    with `attention_fn`): it must accept the `sp_forward` keyword subset
    (tables/labels/deterministic/dropout_rng/output_hidden_states) — pass
    `partial(pipeline_sp_forward, mesh=mesh)` to run the SAME teacher +
    sampled-students distillation iteration through the GPipe pipeline
    schedule (`parallel/pipeline.py::make_pp_sp_train_step`).
    """
    if forward_fn is not None and attention_fn is not None:
        raise ValueError("forward_fn and attention_fn are mutually exclusive")
    q = cfg.quant
    tables = tables if tables is not None else prec_tables(q)
    teacher_slot = q.prec_index(q.teacher_bits)
    student_slots = np.asarray(
        [q.prec_index(b) for b in q.student_bits], np.int32
    )
    accum = tcfg.gradient_accumulation_steps
    n_students = accum - 1
    n_feature_layers = cfg.model.n_layer + 1

    schedule = cosine_lr(tcfg.learning_rate, tcfg.num_iterations * accum, accum)
    opt = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(
            learning_rate=schedule,
            b1=tcfg.adam_b1,
            b2=tcfg.adam_b2,
            eps=tcfg.adam_epsilon,
            weight_decay=tcfg.weight_decay,
        ),
    )

    def _masked_opt(params):
        # optax.masked passes raw gradients through for unmasked leaves
        # (silent gradient ascent on frozen params!) — use multi_transform
        # with set_to_zero so frozen leaves receive exactly zero updates.
        labels = jax.tree.map(
            lambda m: "train" if m else "freeze", trainable_mask(params)
        )
        return optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels
        )

    def init_state(params) -> SPTrainState:
        return SPTrainState(
            params=params,
            opt_state=_masked_opt(params).init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def _freeze(params):
        # The reference sets requires_grad=False on embeddings and keeps
        # quantizer scale banks as buffers (`main_sp.py:55-141`), so no
        # gradient work is ever done for them. stop_gradient on the frozen
        # leaves reproduces that: their cotangent chains (notably the
        # (50257, 768) wte scatter-add and tied-lm-head grad) are DCE'd by
        # XLA instead of being computed and then masked to zero.
        mask = trainable_mask(params)
        return jax.tree.map(
            lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask
        )

    def _forward(params, ids, prec, rng, labels):
        params = _freeze(params)
        if forward_fn is not None:
            return forward_fn(
                params, ids, prec, cfg, tables=tables, labels=labels,
                deterministic=False, dropout_rng=rng,
                output_hidden_states=True,
            )
        extra = {}
        if getattr(tcfg, "distill_feature_grad", False):
            # Opt-in: gradient-carrying hidden states so the feature-
            # distillation term actually trains the student (the reference
            # detaches BOTH sides, models_sp.py:322,331 — see sp_forward's
            # docstring; teacher side is re-detached inside the loss).
            extra["hidden_states_grad"] = True
        return sp_forward(
            params, ids, prec, cfg, tables=tables, labels=labels,
            deterministic=False, dropout_rng=rng,
            output_hidden_states=True, attention_fn=attention_fn, **extra,
        )

    def teacher_loss_fn(params, ids, rng):
        out = _forward(params, ids, jnp.int32(teacher_slot), rng, ids)
        aux = TeacherOutputs(
            logits=jax.lax.stop_gradient(out["logits"]),
            hidden_states=out["hidden_states"],
        )
        return out["loss"] / accum, aux

    def student_loss_fn(params, ids, prec, rng, layer_idx, teacher: TeacherOutputs):
        out = _forward(params, ids, prec, rng, None)
        loss = distillation_loss(
            out["logits"], out["hidden_states"], teacher, layer_idx,
            alpha_kl=tcfg.distill_alpha_kl,
            alpha_feature=tcfg.distill_alpha_feature,
            temperature=tcfg.distill_temperature,
            accumulative=tcfg.distill_accumulative,
        )
        return loss / accum

    def train_step(state: SPTrainState, ids, rng):
        rng_t, rng_prec, rng_layer, rng_drop = jax.random.split(rng, 4)

        # --- micro-step 0: teacher (CE + cache), reference train_sp.py:353-356
        (t_loss, teacher), grads = jax.value_and_grad(
            teacher_loss_fn, has_aux=True
        )(state.params, ids, rng_t)
        # Precompute teacher probs + entropy once, outside the student
        # scan — the KL's teacher side is identical for every student.
        if tcfg.distill_alpha_kl:
            teacher = prepare_teacher(
                teacher.logits, teacher.hidden_states,
                tcfg.distill_temperature,
                cache_dtype=jnp.dtype(tcfg.distill_cache_dtype),
            )

        # --- micro-steps 1..accum-1: random student precisions
        precs = jax.random.choice(
            rng_prec, jnp.asarray(student_slots), shape=(n_students,)
        )
        layers = jax.random.randint(
            rng_layer, (n_students,), 0, n_feature_layers
        )
        drop_rngs = jax.random.split(rng_drop, n_students)

        mode = tcfg.student_mode or (
            "unroll" if tcfg.unroll_students else "scan")
        if mode == "unroll":
            # Unrolled student micro-steps: no lax.scan carry copies of the
            # full gradient tree between iterations.
            student_loss_sum = jnp.zeros(())
            for i in range(n_students):
                loss, g = jax.value_and_grad(student_loss_fn)(
                    state.params, ids, precs[i], drop_rngs[i], layers[i],
                    teacher
                )
                grads = jax.tree.map(jnp.add, grads, g)
                student_loss_sum = student_loss_sum + loss
        elif mode == "vmap":
            # ONE batched fwd+bwd for all students: the (n_students,)
            # precision/rng/layer axis rides through the forward as a
            # batched bank gather + batched matmuls, and grad(sum(losses))
            # accumulates the per-student dW INSIDE the backward weight
            # contractions (the vmap axis is a contraction dim of each dW
            # dot) — no grad-tree carries, ~1/n_students the op count.
            # Same math as the scan: sum of per-student losses/grads.
            def total_student_loss(params):
                losses = jax.vmap(
                    lambda prec, drng, li: student_loss_fn(
                        params, ids, prec, drng, li, teacher)
                )(precs, drop_rngs, layers)
                return jnp.sum(losses)

            student_loss_sum, g = jax.value_and_grad(total_student_loss)(
                state.params)
            grads = jax.tree.map(jnp.add, grads, g)
        elif mode == "scan":
            def body(carry, xs):
                g_acc, loss_acc = carry
                prec, layer_idx, drng = xs
                loss, g = jax.value_and_grad(student_loss_fn)(
                    state.params, ids, prec, drng, layer_idx, teacher
                )
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, loss_acc + loss), loss

            (grads, student_loss_sum), _ = jax.lax.scan(
                body, (grads, jnp.zeros(())), (precs, layers, drop_rngs)
            )
        else:
            raise ValueError(
                f"student_mode must be scan/unroll/vmap; got {mode!r}")

        masked_opt = _masked_opt(state.params)
        updates, opt_state = masked_opt.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)

        total_loss = t_loss + student_loss_sum
        metrics = {
            "loss": total_loss,
            "teacher_loss": t_loss * accum,
            "student_loss_mean": student_loss_sum * accum / max(n_students, 1),
            "grad_norm": optax.global_norm(grads),
            "lr": schedule(state.step),
            "precisions": precs,
        }
        return SPTrainState(params, opt_state, state.step + 1), metrics

    return init_state, train_step


def make_eval_step(cfg: SPModelConfig, tables: Optional[PrecTables] = None):
    """Jitted eval loss at an arbitrary precision slot
    (reference `evaluate`, `train_sp.py:399-428`)."""
    tables = tables if tables is not None else prec_tables(cfg.quant)

    @jax.jit
    def eval_step(params, ids, prec):
        out = sp_forward(params, ids, prec, cfg, tables=tables, labels=ids)
        return out["loss"]

    return eval_step
