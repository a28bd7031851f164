"""Sliding-window perplexity evaluation.

Re-implements the reference `PerplexityEvaluator`
(`part3_eval_sp/perplexity_eval.py:8-95`) with exact window/target semantics:
windows of `max_length` advanced by `stride`; per window, loss is summed only
over the target region `[max(prev_end, begin), end)` so overlapping context
tokens are never double-counted; PPL = exp(total_loss / total_tokens).

TPU-native re-design: instead of one ragged forward per window, windows are
right-padded to `max_length`, annotated with (valid_len, target_start,
target_end), stacked, and evaluated in fixed-shape batches under one jitted
executable — identical numerics, ~batch× fewer dispatches.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def iter_windows(n_tokens: int, max_length: int, stride: int):
    """Yield (begin, end, target_start, target_end) per reference
    `perplexity_eval.py:52-75`."""
    prev_end = 0
    for begin in range(0, n_tokens, stride):
        end = min(begin + max_length, n_tokens)
        if end - begin < 2:
            break
        t_start = max(prev_end, begin)
        t_end = end
        if t_end <= t_start:
            continue
        yield begin, end, t_start, t_end
        prev_end = t_end


class PerplexityEvaluator:
    """Corpus perplexity with the reference's sliding-window accounting.

    `logits_fn(ids)` maps int32 (B, max_length) → (B, max_length, V); bind
    params/precision with a closure (e.g. `partial(sp_forward, ...)`).
    """

    def __init__(self, logits_fn: Callable, max_length: int = 256,
                 stride: int = 256, batch_size: int = 16, pad_id: int = 0):
        self.max_length = max_length
        self.stride = stride
        self.batch_size = batch_size
        self.pad_id = pad_id

        @jax.jit
        def batch_loss(ids, t_start, t_end, valid_len):
            logits = logits_fn(ids)  # (B, T, V)
            shift_logits = logits[:, :-1].astype(jnp.float32)
            shift_labels = ids[:, 1:]
            T = shift_labels.shape[1]
            pos = jnp.arange(T)[None, :]
            # target region in shifted coordinates (reference
            # perplexity_eval.py:60-67): [t_start - begin, t_end - begin - 1)
            mask = (pos >= t_start[:, None]) & (pos < (t_end - 1)[:, None])
            mask = mask & (pos < (valid_len - 1)[:, None])
            logp = jax.nn.log_softmax(shift_logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp, shift_labels[..., None], axis=-1
            )[..., 0]
            nll = jnp.where(mask, nll, 0.0)
            return jnp.sum(nll), jnp.sum(mask)

        self._batch_loss = batch_loss

    def _windows_for(self, tokens: np.ndarray):
        n = len(tokens)
        out = []
        for begin, end, t_start, t_end in iter_windows(n, self.max_length,
                                                       self.stride):
            ids = np.full((self.max_length,), self.pad_id, np.int32)
            ids[: end - begin] = tokens[begin:end]
            out.append((ids, t_start - begin, t_end - begin, end - begin))
        return out

    def calculate_perplexity(self, token_sequences: Sequence[np.ndarray]) -> float:
        """PPL over pre-tokenized documents (reference loops raw texts through
        its tokenizer first; tokenization is decoupled here)."""
        windows = []
        for toks in token_sequences:
            toks = np.asarray(toks, np.int32)
            if len(toks) < 2:
                continue
            windows.extend(self._windows_for(toks))
        if not windows:
            return float("inf")

        total_loss = 0.0
        total_tokens = 0
        B = self.batch_size
        for i in range(0, len(windows), B):
            chunk = windows[i : i + B]
            n = len(chunk)
            if n < B:  # pad the batch; padded rows have empty target masks
                chunk = chunk + [
                    (np.full((self.max_length,), self.pad_id, np.int32), 0, 0, 0)
                ] * (B - n)
            ids = jnp.asarray(np.stack([c[0] for c in chunk]))
            ts = jnp.asarray(np.asarray([c[1] for c in chunk], np.int32))
            te = jnp.asarray(np.asarray([c[2] for c in chunk], np.int32))
            vl = jnp.asarray(np.asarray([c[3] for c in chunk], np.int32))
            loss, ntok = self._batch_loss(ids, ts, te, vl)
            l, t = float(loss), int(ntok)
            if math.isfinite(l):
                total_loss += l
                total_tokens += t

        if total_tokens == 0:
            return float("inf")
        return math.exp(total_loss / total_tokens)

    def evaluate_all_datasets(self, datasets: Dict[str, Sequence[np.ndarray]]
                              ) -> Dict[str, float]:
        """{name: token_sequences} → {name: ppl} (reference
        `evaluate_all_datasets`, `perplexity_eval.py:83-95`)."""
        return {
            name: round(self.calculate_perplexity(seqs), 1)
            for name, seqs in datasets.items()
        }
