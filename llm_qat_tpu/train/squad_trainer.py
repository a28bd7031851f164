"""SQuAD QA training with self-distillation.

Re-implements part5 orchestration (`train_squad.py:233-531`,
`distillation_manager_qa.py:9-262`): structurally the part1 SP loop with QA
loss, and QA distillation = KL over sequence positions on start-logits and
end-logits separately, averaged, scaled by T² (`distillation_manager_qa.py:
116-145`), plus optional random-layer hidden-state MSE (`:147-179`). Student
total loss = task CE + distillation (`train_squad.py:288-304`).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.config import SPModelConfig, TrainConfig
from ..models.qa import qa_forward, qa_loss_fn
from ..models.sp_model import PrecTables, prec_tables
from .distillation import feature_distillation_loss
from .sp_trainer import cosine_lr, trainable_mask


class QATeacherOutputs(NamedTuple):
    start_logits: jax.Array  # (B, T)
    end_logits: jax.Array
    hidden_states: jax.Array  # (L+1, B, T, d)


def qa_kl_loss(student_logits, teacher_logits, temperature: float):
    """KL over sequence positions for one head
    (`distillation_manager_qa.py:116-145`)."""
    T = temperature
    t = jax.lax.stop_gradient(teacher_logits).astype(jnp.float32) / T
    s = student_logits.astype(jnp.float32) / T
    t_logp = jax.nn.log_softmax(t, axis=-1)
    s_logp = jax.nn.log_softmax(s, axis=-1)
    kl = jnp.sum(jnp.exp(t_logp) * (t_logp - s_logp), axis=-1)  # (B,)
    return jnp.mean(kl) * (T * T)


def qa_distillation_loss(student, teacher: QATeacherOutputs, layer_idx, *,
                         alpha_kl: float, alpha_feature: float,
                         temperature: float, accumulative: bool = False):
    kl = 0.5 * (
        qa_kl_loss(student["start_logits"], teacher.start_logits, temperature)
        + qa_kl_loss(student["end_logits"], teacher.end_logits, temperature)
    )
    feat = feature_distillation_loss(
        student["hidden_states"], teacher.hidden_states, layer_idx,
        accumulative,
    )
    return alpha_kl * kl + alpha_feature * feat


class QATrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_squad_train_step(cfg: SPModelConfig, tcfg: TrainConfig,
                          tables: Optional[PrecTables] = None):
    """(init_state, train_step) for the QA multi-precision loop
    (`train_squad.py:310-386` mirrors part1's accumulation structure)."""
    q = cfg.quant
    tables = tables if tables is not None else prec_tables(q)
    teacher_slot = q.prec_index(q.teacher_bits)
    student_slots = np.asarray([q.prec_index(b) for b in q.student_bits],
                               np.int32)
    accum = tcfg.gradient_accumulation_steps
    n_students = accum - 1
    n_layers = cfg.model.n_layer + 1

    schedule = cosine_lr(tcfg.learning_rate, tcfg.num_iterations * accum, accum)
    opt = optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(schedule, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                    eps=tcfg.adam_epsilon, weight_decay=tcfg.weight_decay),
    )

    def _masked(params):
        labels = jax.tree.map(lambda m: "train" if m else "freeze",
                              trainable_mask(params))
        return optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels
        )

    def init_state(params):
        return QATrainState(params, _masked(params).init(params),
                            jnp.zeros((), jnp.int32))

    def teacher_loss(params, batch, rng):
        out = qa_forward(
            params, batch["input_ids"], jnp.int32(teacher_slot), cfg,
            tables=tables, attention_mask=batch["attention_mask"],
            start_positions=batch["start_positions"],
            end_positions=batch["end_positions"],
            deterministic=False, dropout_rng=rng, output_hidden_states=True,
        )
        aux = QATeacherOutputs(
            start_logits=jax.lax.stop_gradient(out["start_logits"]),
            end_logits=jax.lax.stop_gradient(out["end_logits"]),
            hidden_states=out["hidden_states"],
        )
        return out["loss"] / accum, aux

    def student_loss(params, batch, prec, rng, layer_idx, teacher):
        out = qa_forward(
            params, batch["input_ids"], prec, cfg, tables=tables,
            attention_mask=batch["attention_mask"],
            start_positions=batch["start_positions"],
            end_positions=batch["end_positions"],
            deterministic=False, dropout_rng=rng, output_hidden_states=True,
        )
        distill = qa_distillation_loss(
            out, teacher, layer_idx,
            alpha_kl=tcfg.distill_alpha_kl,
            alpha_feature=tcfg.distill_alpha_feature,
            temperature=tcfg.distill_temperature,
            accumulative=tcfg.distill_accumulative,
        )
        # student total = task CE + distillation (train_squad.py:288-304)
        return (out["loss"] + distill) / accum

    def train_step(state: QATrainState, batch, rng):
        rng_t, rng_p, rng_l, rng_d = jax.random.split(rng, 4)
        (t_loss, teacher), grads = jax.value_and_grad(
            teacher_loss, has_aux=True
        )(state.params, batch, rng_t)

        precs = jax.random.choice(rng_p, jnp.asarray(student_slots),
                                  shape=(n_students,))
        layers = jax.random.randint(rng_l, (n_students,), 0, n_layers)
        drngs = jax.random.split(rng_d, n_students)

        def body(carry, xs):
            g_acc, l_acc = carry
            prec, layer, drng = xs
            loss, g = jax.value_and_grad(student_loss)(
                state.params, batch, prec, drng, layer, teacher
            )
            return (jax.tree.map(jnp.add, g_acc, g), l_acc + loss), loss

        (grads, s_loss), _ = jax.lax.scan(
            body, (grads, jnp.zeros(())), (precs, layers, drngs)
        )

        updates, opt_state = _masked(state.params).update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": t_loss + s_loss,
            "teacher_loss": t_loss * accum,
            "grad_norm": optax.global_norm(grads),
        }
        return QATrainState(params, opt_state, state.step + 1), metrics

    return init_state, train_step
