"""SQuAD answer extraction and end-to-end evaluation.

Re-implements `part5_squad/eval_squad.py`:
- `extract_answer` (`eval_squad.py:17-79`): beam over top-N start × top-N end
  logits with constraints start <= end, length <= max_answer_length, optional
  question-region exclusion; score = start_logit + end_logit; decode span.
- `evaluate_squad_model` (`eval_squad.py:115-177`): run the QA model over the
  dataset, extract per-example best answers (max score across windows), score
  with official EM/F1.

The top-N × top-N search is vectorized: scores form an (N, N) outer sum whose
invalid entries are masked to -inf — one argmax instead of the reference's
python double loop.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .squad_metrics import evaluate_squad


def extract_answer(start_logits, end_logits, input_ids, tokenizer,
                   max_answer_length: int = 30, n_best_size: int = 20,
                   question_length: Optional[int] = None) -> Dict:
    """Best valid span (reference `eval_squad.py:17-79`)."""
    start_logits = np.asarray(start_logits)
    end_logits = np.asarray(end_logits)
    seq_len = start_logits.shape[0]
    n = min(n_best_size, seq_len)

    s_idx = np.argsort(start_logits)[::-1][:n]
    e_idx = np.argsort(end_logits)[::-1][:n]

    s_pos = s_idx[:, None]  # (n, 1)
    e_pos = e_idx[None, :]  # (1, n)
    scores = start_logits[s_idx][:, None] + end_logits[e_idx][None, :]

    valid = e_pos >= s_pos
    valid &= (e_pos - s_pos + 1) <= max_answer_length
    if question_length:
        valid &= s_pos >= question_length
    scores = np.where(valid, scores, -np.inf)

    if not np.isfinite(scores).any():
        best_start = best_end = 0
        best_score = float("-inf")
    else:
        flat = int(np.argmax(scores))
        best_start = int(s_idx[flat // n])
        best_end = int(e_idx[flat % n])
        best_score = float(scores.flat[flat])

    ids = np.asarray(input_ids)[best_start : best_end + 1]
    text = tokenizer.decode(ids)
    return {"text": text.strip(), "start": best_start, "end": best_end,
            "score": best_score}


def evaluate_squad_model(qa_logits_fn: Callable, dataset, tokenizer,
                         references: Dict[str, List[str]],
                         batch_size: int = 8, max_answer_length: int = 30,
                         n_best_size: int = 20) -> Dict[str, float]:
    """End-to-end EM/F1 (reference `eval_squad.py:115-177`).

    `qa_logits_fn(input_ids, attention_mask) -> (start_logits, end_logits)`.
    Multiple windows of one example keep the highest-scoring span.
    """
    best: Dict[str, Dict] = {}
    for batch in dataset.batches(batch_size, drop_last=False):
        s_logits, e_logits = qa_logits_fn(
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
        )
        s_logits = np.asarray(s_logits)
        e_logits = np.asarray(e_logits)
        for i, ex_id in enumerate(batch["example_ids"]):
            ans = extract_answer(
                s_logits[i], e_logits[i], batch["input_ids"][i], tokenizer,
                max_answer_length, n_best_size,
                question_length=int(batch["question_lengths"][i]),
            )
            if ex_id not in best or ans["score"] > best[ex_id]["score"]:
                best[ex_id] = ans
    predictions = {ex_id: a["text"] for ex_id, a in best.items()}
    return evaluate_squad(predictions, references)
