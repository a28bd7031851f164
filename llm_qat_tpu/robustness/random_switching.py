"""Random Precision Inference (RPI) — precision switching as a defense.

Re-implements `part4_randomSwitching/simplified_random_switching.py`:
- `SimplifiedRandomSwitching` (`:156-238`): before each forward, with
  probability p pick a uniformly random bit-width; precision history /
  switch-rate statistics.
- `DefenseEvaluator.evaluate_fixed_precision` (`:240-304`): token-level
  perplexity/accuracy at a pinned precision.

TPU-native twist: because precision is a traced bank index, the "switch"
costs nothing — the same jitted forward serves every draw; the random draw
itself stays host-side (`random.random`, matching the reference) so attack
replays see the same nondeterminism model.
"""

from __future__ import annotations

import random
from collections import Counter
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SimplifiedRandomSwitching:
    """Host-side precision draw + jitted forward.

    `forward_fn(input_ids, prec_idx) -> {"logits", "loss"?}` is typically a
    jitted closure over (params, cfg); `bits_to_idx` maps bit-width → bank
    slot.
    """

    def __init__(self, forward_fn: Callable, bit_widths: Sequence[int],
                 bits_to_idx: Dict[int, int],
                 switch_probability: float = 0.3, seed: Optional[int] = None):
        self.forward_fn = forward_fn
        self.bit_widths = sorted(bit_widths)
        self.bits_to_idx = dict(bits_to_idx)
        self.switch_prob = switch_probability
        self._rng = random.Random(seed)

        self.current_precision = max(self.bit_widths)
        self.precision_history: List[int] = []
        self.switch_count = 0
        self.total_forwards = 0

    def select_next_precision(self) -> int:
        """(`simplified_random_switching.py:174-199`)"""
        if self._rng.random() < self.switch_prob:
            new_precision = self._rng.choice(self.bit_widths)
            if new_precision != self.current_precision:
                self.switch_count += 1
            self.current_precision = new_precision
        self.precision_history.append(self.current_precision)
        return self.current_precision

    def forward_with_switching(self, input_ids, labels=None):
        precision = self.select_next_precision()
        self.total_forwards += 1
        out = self.forward_fn(
            jnp.asarray(input_ids),
            jnp.int32(self.bits_to_idx[precision]),
        )
        return out, precision

    def forward_without_switching(self, input_ids, precision: Optional[int] = None):
        if precision is None:
            precision = self.current_precision
        return self.forward_fn(
            jnp.asarray(input_ids), jnp.int32(self.bits_to_idx[precision])
        )

    def get_statistics(self) -> Dict:
        """(`simplified_random_switching.py:217-238`)"""
        if not self.precision_history:
            return {"total_forwards": 0, "switch_count": 0,
                    "switch_rate": 0.0, "precision_distribution": {}}
        counts = Counter(self.precision_history)
        return {
            "total_forwards": self.total_forwards,
            "switch_count": self.switch_count,
            "switch_rate": self.switch_count / max(self.total_forwards - 1, 1),
            "precision_distribution": {
                b: c / len(self.precision_history) for b, c in counts.items()
            },
            "precision_counts": dict(counts),
        }


def token_level_metrics(logits, labels) -> Tuple[float, int, int]:
    """(sum_loss, n_correct, n_tokens) over labels != -100
    (`simplified_random_switching.py:283-296`)."""
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = shift_labels != -100
    n = int(mask.sum())
    if n == 0:
        return 0.0, 0, 0
    logp = shift_logits - np.log(
        np.exp(shift_logits - shift_logits.max(-1, keepdims=True)).sum(
            -1, keepdims=True
        )
    ) - shift_logits.max(-1, keepdims=True)
    nll = -np.take_along_axis(
        logp, np.where(mask, shift_labels, 0)[..., None], axis=-1
    )[..., 0]
    sum_loss = float(nll[mask].sum())
    preds = shift_logits.argmax(-1)
    correct = int((preds[mask] == shift_labels[mask]).sum())
    return sum_loss, correct, n


class DefenseEvaluator:
    """Fixed-precision and switched evaluation (`:240-304`)."""

    def __init__(self, forward_fn: Callable, bit_widths: Sequence[int],
                 bits_to_idx: Dict[int, int]):
        self.forward_fn = forward_fn
        self.bit_widths = list(bit_widths)
        self.bits_to_idx = dict(bits_to_idx)

    def evaluate_fixed_precision(self, samples: Sequence[Dict],
                                 precision: int) -> Dict:
        total_loss = total_correct = total_tokens = 0
        for s in samples:
            ids = np.atleast_2d(np.asarray(s["input_ids"]))
            labels = np.atleast_2d(np.asarray(s.get("labels", ids)))
            out = self.forward_fn(jnp.asarray(ids),
                                  jnp.int32(self.bits_to_idx[precision]))
            l, c, n = token_level_metrics(out["logits"], labels)
            total_loss += l
            total_correct += c
            total_tokens += n
        avg_loss = total_loss / max(total_tokens, 1)
        return {
            "precision": precision,
            "perplexity": float(np.exp(avg_loss)),
            "avg_loss": avg_loss,
            "accuracy": total_correct / max(total_tokens, 1),
            "total_tokens": total_tokens,
        }

    def evaluate_with_switching(self, samples: Sequence[Dict],
                                switch_probability: float,
                                seed: Optional[int] = 0) -> Dict:
        """Accuracy/PPL under random switching (the defense condition of
        `run_evaluation.py:136-169`)."""
        switcher = SimplifiedRandomSwitching(
            self.forward_fn, self.bit_widths, self.bits_to_idx,
            switch_probability, seed,
        )
        total_loss = total_correct = total_tokens = 0
        for s in samples:
            ids = np.atleast_2d(np.asarray(s["input_ids"]))
            labels = np.atleast_2d(np.asarray(s.get("labels", ids)))
            out, _ = switcher.forward_with_switching(ids)
            l, c, n = token_level_metrics(out["logits"], labels)
            total_loss += l
            total_correct += c
            total_tokens += n
        avg_loss = total_loss / max(total_tokens, 1)
        return {
            "perplexity": float(np.exp(avg_loss)),
            "accuracy": total_correct / max(total_tokens, 1),
            "statistics": switcher.get_statistics(),
        }


def defense_success_rate(orig_acc: float, adv_acc: float,
                         switched_acc: float, threshold: float = 0.15) -> Dict:
    """Recovery-ratio defense criterion (`run_evaluation.py:136-141,169`):
    success iff (switched - adv) / (orig - adv) > threshold."""
    denom = orig_acc - adv_acc
    recovery = (switched_acc - adv_acc) / denom if denom > 1e-9 else 0.0
    return {"recovery_ratio": recovery, "success": recovery > threshold}
