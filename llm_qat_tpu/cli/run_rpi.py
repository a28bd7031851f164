"""RPI defense evaluation entry point (reference
`part4_randomSwitching/run_evaluation.py:270-412`).

Clean baseline at max bits → TextFooler + BERT-Attack → replay successful
adversarial texts under random switching at the requested probabilities →
JSON report with defense success rates and the optimal p.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Random-precision defense eval")
    p.add_argument("--model-path", default=None,
                   help="SP checkpoint; random init when omitted")
    p.add_argument("--output-dir", default="outputs/rpi")
    p.add_argument("--switch-probs", type=float, nargs="+",
                   default=[0.0, 0.3, 0.5, 0.7])
    p.add_argument("--num-samples", type=int, default=30)
    p.add_argument("--bit-widths", type=int, nargs="+", default=[4, 8, 32])
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data import get_gpt2_tokenizer, load_wikitext
    from ..models import init_sp_params, prec_tables, sp_forward, tiny_test_config
    from ..robustness import (
        BERTAttack, SimplifiedRandomSwitching, TextFoolerAttack,
        run_rpi_evaluation,
    )
    from ..robustness.random_switching import token_level_metrics

    if args.tiny:
        cfg = tiny_test_config(tuple(args.bit_widths))
    else:
        from ..models import GPT2Config, QuantConfig, SPModelConfig

        cfg = SPModelConfig(
            model=GPT2Config(),
            quant=QuantConfig(bit_widths=tuple(args.bit_widths)),
        )
    tables = prec_tables(cfg.quant)
    if args.model_path:
        from ..deploy import load_checkpoint

        params, _ = load_checkpoint(args.model_path)
    else:
        params = init_sp_params(jax.random.PRNGKey(0), cfg)

    tokenizer = get_gpt2_tokenizer()
    bits_to_idx = {b: cfg.quant.prec_index(b) for b in cfg.quant.bit_widths}
    max_bits = max(cfg.quant.bit_widths)

    @jax.jit
    def forward(ids, prec):
        return sp_forward(params, ids, prec, cfg, tables=tables)["logits"]

    max_pos = cfg.model.n_positions

    def _metrics_at(text, prec_idx):
        ids = np.asarray(tokenizer(text)[:max_pos], np.int32)
        if len(ids) < 3:
            return 0.0, 0.0
        ids2 = ids[None]
        logits = forward(jnp.asarray(ids2), jnp.int32(prec_idx))
        loss_sum, correct, n = token_level_metrics(np.asarray(logits), ids2)
        return loss_sum / max(n, 1), correct / max(n, 1)

    def metrics_fn(text):
        return _metrics_at(text, bits_to_idx[max_bits])

    def switched_metrics_fn(text, p, seed):
        sw = SimplifiedRandomSwitching(
            lambda ids, prec: {"logits": forward(ids, prec)},
            cfg.quant.bit_widths, bits_to_idx, p, seed,
        )
        ids = np.asarray(tokenizer(text)[:max_pos], np.int32)
        if len(ids) < 3:
            return 0.0, 0.0
        out, _ = sw.forward_with_switching(ids[None])
        loss_sum, correct, n = token_level_metrics(
            np.asarray(out["logits"]), ids[None]
        )
        return loss_sum / max(n, 1), correct / max(n, 1)

    def embed_fn(text):
        ids = np.asarray(tokenizer(text)[:max_pos], np.int32)
        if len(ids) == 0:
            return np.zeros(cfg.model.n_embd)
        return np.asarray(params["wte"])[ids].mean(0)

    texts = [t for t in load_wikitext("wikitext-2-raw-v1", "test",
                                      limit=args.num_samples * 3)
             if len(t.split()) >= 5][: args.num_samples]

    attacks = {
        "TextFooler": TextFoolerAttack(metrics_fn, embed_fn),
        "BERT-Attack": BERTAttack(metrics_fn, embed_fn),
    }
    report = run_rpi_evaluation(
        metrics_fn, switched_metrics_fn, attacks, texts,
        switch_probs=tuple(args.switch_probs),
        max_samples=args.num_samples,
    )

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "rpi_report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2)[:2000])
    return report


if __name__ == "__main__":
    main()
