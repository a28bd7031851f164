"""CPT evaluation entry point (reference `part3_eval_cpt/main_cpt_eval.py:24-61`
+ `load_cpt_model.py:12-180`).

Loads a CPT checkpoint, runs calibration forensics (which bits have
calibrated scale tables), performs **emergency re-calibration** of any
uncalibrated quantizer at the target bit (reference
`load_cpt_model.py:140-166`), then evaluates sliding-window perplexity.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def calibration_forensics(params, cfg) -> dict:
    """Which bit slots have calibrated (non-default) scale tables
    (reference `load_cpt_model.py:70-100`)."""
    from ..models.cpt_model import prec_index

    report = {}
    ws = np.asarray(params["blocks"]["c_attn"]["wq_scale"])  # (L, P, ch)
    for bits in cfg.bit_widths:
        if bits >= 32:
            continue
        p = prec_index(cfg, bits)
        report[bits] = not np.allclose(ws[:, p], 1.0)
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description="CPT model evaluation")
    p.add_argument("--model-path", required=True)
    p.add_argument("--output-dir", default="outputs/eval_cpt")
    p.add_argument("--max-length", type=int, default=1024)
    p.add_argument("--stride", type=int, default=512)
    p.add_argument("--bits", type=int, default=None,
                   help="eval bit-width (default: checkpoint target)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data import get_gpt2_tokenizer, load_wikitext
    from ..deploy import load_checkpoint
    from ..evals import PerplexityEvaluator
    from ..models.config import CPTConfig, GPT2Config
    from ..models.cpt_model import cpt_forward, prec_index
    from ..train.cpt_trainer import CPTCalibrationManager

    params, meta = load_checkpoint(args.model_path)
    c = meta["config"]
    cfg = CPTConfig(
        model=GPT2Config(**{k: c["model"][k] for k in
                            ("vocab_size", "n_positions", "n_embd",
                             "n_layer", "n_head")}),
        bit_widths=tuple(c["bit_widths"]),
        lora_rank=c["lora_rank"], lora_alpha=c["lora_alpha"],
        gradient_bits=c["gradient_bits"], target_bits=c["target_bits"],
        quantizer_kind=c["quantizer_kind"], per_channel=c["per_channel"],
    )
    bits = args.bits or meta.get("bit_width") or cfg.target_bits

    forensics = calibration_forensics(params, cfg)
    print(f"calibration status by bits: {forensics}")

    mgr = CPTCalibrationManager(cfg, calibration_batches=4)
    mgr.calibrated = {b for b, ok in forensics.items() if ok}
    if not forensics.get(bits, False):
        # emergency re-calibration (load_cpt_model.py:140-166)
        print(f"emergency re-calibration at {bits} bits")
        tokenizer = get_gpt2_tokenizer()
        texts = load_wikitext("wikitext-2-raw-v1", "validation", limit=32)
        stream = []
        for t in texts:
            stream.extend(tokenizer(t))
        stream = np.asarray(stream[: 4 * 2 * 64], np.int32)
        need = 4 * 2 * 64 - len(stream)
        if need > 0:
            stream = np.concatenate([stream, np.zeros(need, np.int32)])
        batches = [jnp.asarray(stream[i * 128:(i + 1) * 128].reshape(2, 64))
                   for i in range(4)]
        params = mgr.ensure_calibrated(params, bits, batches)

    tables = mgr.tables
    prec = jnp.int32(prec_index(cfg, bits))

    def logits_fn(ids):
        return cpt_forward(params, ids, prec, cfg, tables=tables)["logits"]

    tokenizer = get_gpt2_tokenizer()
    texts = load_wikitext("wikitext-2-raw-v1", "validation", limit=100)
    seqs = [np.asarray(tokenizer(t), np.int32) for t in texts if t.strip()]
    ml = min(args.max_length, cfg.model.n_positions)
    ev = PerplexityEvaluator(logits_fn, ml, min(args.stride, ml))
    ppl = ev.calculate_perplexity(seqs)
    print(f"WikiText-2 PPL @ {bits} bits: {ppl:.1f}")

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = {"bit_width": bits, "perplexity": {"wikitext2": round(ppl, 1)},
               "calibration_forensics": {str(k): v
                                         for k, v in forensics.items()}}
    (out_dir / "results.json").write_text(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
