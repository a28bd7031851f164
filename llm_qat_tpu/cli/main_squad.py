"""SQuAD QA training + evaluation entry point (reference
`part5_squad/main_squad.py:160-254` and `eval_squad.py:350-466`)."""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="SQuAD QA training/eval")
    p.add_argument("--output-dir", default="outputs/squad")
    p.add_argument("--squad-version", choices=["v1", "v2"], default="v1")
    p.add_argument("--num-iterations", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-seq-length", type=int, default=384)
    p.add_argument("--doc-stride", type=int, default=128)
    p.add_argument("--learning-rate", type=float, default=3e-5)
    p.add_argument("--bit-widths", type=int, nargs="+", default=[7, 32])
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data.squad import (
        OffsetByteTokenizer, SQuADDataset, load_squad_examples,
    )
    from ..deploy import load_checkpoint, save_per_bit_checkpoints
    from ..evals.squad_eval import evaluate_squad_model
    from ..models import (
        GPT2Config, QuantConfig, SPModelConfig, TrainConfig, prec_tables,
        tiny_test_config,
    )
    from ..models.qa import init_qa_params, qa_forward
    from ..train.squad_trainer import make_squad_train_step

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.tiny:
        cfg = tiny_test_config(tuple(args.bit_widths))
        max_len, stride = 64, 64
        examples = load_squad_examples(args.squad_version, "train", limit=16)
    else:
        cfg = SPModelConfig(
            model=GPT2Config(),
            quant=QuantConfig(bit_widths=tuple(args.bit_widths)),
        )
        max_len, stride = args.max_seq_length, args.doc_stride
        examples = load_squad_examples(args.squad_version, "train", limit=5000)

    # GPT-2 BPE when available, byte fallback offline
    from ..data.lm_datasets import _offline_env_defaults

    _offline_env_defaults()
    try:
        from transformers import GPT2TokenizerFast

        hf_tok = GPT2TokenizerFast.from_pretrained("gpt2")

        class Tok:
            eos_token_id = hf_tok.eos_token_id
            pad_token_id = hf_tok.eos_token_id

            def __call__(self, text):
                return hf_tok(text)["input_ids"]

            def tokenize_with_offsets(self, text):
                enc = hf_tok(text, return_offsets_mapping=True)
                return enc["input_ids"], enc["offset_mapping"]

            def decode(self, ids):
                return hf_tok.decode(ids)

        tokenizer = Tok()
    except Exception:
        tokenizer = OffsetByteTokenizer()

    ds = SQuADDataset(examples, tokenizer, max_len, stride)
    print(f"SQuAD {args.squad_version}: {len(ds)} windows")

    tables = prec_tables(cfg.quant)
    if args.checkpoint:
        params, _ = load_checkpoint(args.checkpoint)
    else:
        params = init_qa_params(jax.random.PRNGKey(args.seed), cfg)

    if not args.eval_only:
        tcfg = TrainConfig(
            batch_size=args.batch_size, learning_rate=args.learning_rate,
            num_iterations=args.num_iterations,
            gradient_accumulation_steps=4,
        )
        init_state, train_step = make_squad_train_step(cfg, tcfg, tables)
        state = init_state(params)
        step_fn = jax.jit(train_step)
        rng = jax.random.PRNGKey(args.seed + 1)
        it = 0
        while it < tcfg.num_iterations:
            for batch in ds.batches(min(tcfg.batch_size, len(ds)),
                                    shuffle=True, seed=it):
                jb = {k: jnp.asarray(v) for k, v in batch.items()
                      if k != "example_ids"}
                rng, sub = jax.random.split(rng)
                state, m = step_fn(state, jb, sub)
                if it % 50 == 0:
                    print(f"iter {it}: loss={float(m['loss']):.4f}")
                it += 1
                if it >= tcfg.num_iterations:
                    break
        params = state.params
        save_per_bit_checkpoints(out_dir, params, cfg, prefix="squad")

    # evaluation (eval_squad.py:350-466)
    references = {
        ex["id"]: list(ex["answers"].get("text", [])) for ex in examples
    }
    results = {}
    for bits in cfg.quant.bit_widths:
        prec = jnp.int32(cfg.quant.prec_index(bits))

        @jax.jit
        def qa_logits(ids, mask, prec=prec):
            out = qa_forward(params, ids, prec, cfg, tables=tables,
                             attention_mask=mask)
            return out["start_logits"], out["end_logits"]

        res = evaluate_squad_model(qa_logits, ds, tokenizer, references,
                                   batch_size=8)
        results[bits] = res
        print(f"{bits}-bit: EM={res['exact_match']:.2f} F1={res['f1']:.2f}")

    (out_dir / "squad_results.json").write_text(
        json.dumps({str(k): v for k, v in results.items()}, indent=2)
    )
    return results


if __name__ == "__main__":
    main()
