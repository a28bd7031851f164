"""SP evaluation entry point (reference `part3_eval_sp/main_sp_eval.py:120-203`).

Loads an SP checkpoint (rebuilding the config from its metadata, pinning the
checkpoint's bit-width — and like the reference, eval can force per-tensor
quantization, `main_sp_eval.py:60`), verifies calibration status, runs
sliding-window perplexity + zero-shot tasks, and writes a results JSON with
model-size/compression metrics.
"""

from __future__ import annotations

import argparse
import json
from functools import partial
from pathlib import Path

import numpy as np


def load_switchable_model(ckpt_path, per_tensor_eval: bool = False):
    """Rebuild (params, cfg, bit_width) from a checkpoint
    (reference `load_switchable_model`, `main_sp_eval.py:22-78`).

    NOTE on per-tensor eval: the reference rebuilds quantizers per-tensor and
    re-calibrates at load; our banks store per-channel scales, and a
    per-tensor eval reduces them (max over channels) — same effect as the
    reference's recalibration from the same stats.
    """
    import jax.numpy as jnp

    from ..deploy import load_checkpoint
    from ..models import GPT2Config, QuantConfig, SPModelConfig

    params, meta = load_checkpoint(ckpt_path)
    mc = meta["config"]["model"]
    qc = meta["config"]["quant"]
    # n_positions inferred from the saved wpe (main_sp_eval.py:40-48)
    n_positions = int(np.asarray(params["wpe"]).shape[0])
    cfg = SPModelConfig(
        model=GPT2Config(
            vocab_size=mc["vocab_size"], n_positions=n_positions,
            n_embd=mc["n_embd"], n_layer=mc["n_layer"], n_head=mc["n_head"],
        ),
        quant=QuantConfig(
            bit_widths=tuple(qc["bit_widths"]),
            lora_rank_per_bit={int(k): v
                               for k, v in qc["lora_rank_per_bit"].items()},
            lora_alpha_per_bit={int(k): v
                                for k, v in qc["lora_alpha_per_bit"].items()},
            per_channel=qc["per_channel"] and not per_tensor_eval,
        ),
    )
    if per_tensor_eval and qc["per_channel"]:
        params = _reduce_to_per_tensor(params, cfg.quant)
    return params, cfg, meta.get("bit_width")


def _reduce_to_per_tensor(params, q):
    """Collapse per-channel scale banks to per-tensor (reference forces
    per_channel=False at eval load, `main_sp_eval.py:60`, `deploy.py:210`).

    The reduction happens in the quantizer's STAT space, per precision slot,
    because the finalized (scale, zp) params mean different things per kind
    (`quant/calibration.py::finalize`):

    - log kind (default ≥5 bits): zp holds log_min, scale holds log_range.
      Correct per-tensor params are log_min_t = min_c(log_min_c) and
      log_range_t = max_c(log_min_c + range_c) − log_min_t. A naive
      max-on-both reduction mis-ranges activations (e.g. channels
      (log_min, range) = (−8, 4), (−2, 1): naive gives (−2, 4); correct is
      (−8, 7)).
    - minmax symmetric: scale_c = abs_max_c / qmax is monotone in the stat,
      so max over channels IS the stat-space reduction; zp stays 0.
    - minmax asymmetric: invert scale/zp back to (rmin_c, rmax_c) (exact up
      to the reference's zp rounding), reduce, re-finalize.
    """
    import jax.numpy as jnp

    def reduce_slot(s, z, bits):
        kind = q.kind_name(bits)
        if bits >= 32 or kind == "none":
            # passthrough precision: params unused; keep a max for shape
            return (jnp.max(s, axis=-1, keepdims=True),
                    jnp.max(z, axis=-1, keepdims=True))
        if kind == "log":
            log_min = jnp.min(z, axis=-1, keepdims=True)
            log_max = jnp.max(z + s, axis=-1, keepdims=True)
            return log_max - log_min, log_min
        if q.symmetric:
            s_t = jnp.max(s, axis=-1, keepdims=True)
            return s_t, jnp.zeros_like(s_t)
        qmax = 2.0 ** bits - 1.0
        rmin_c = -z * s
        rmax_c = rmin_c + s * qmax
        rmin = jnp.min(rmin_c, axis=-1, keepdims=True)
        rmax = jnp.max(rmax_c, axis=-1, keepdims=True)
        scale = jnp.maximum(rmax - rmin, q.eps) / qmax
        return scale, jnp.round(-rmin / scale)

    def reduce_bank(scale, zp):
        # banks are (..., P, C): precision slot on -2, channels on -1
        outs = [reduce_slot(scale[..., p, :], zp[..., p, :], b)
                for p, b in enumerate(q.bit_widths)]
        return (jnp.stack([o[0] for o in outs], axis=-2),
                jnp.stack([o[1] for o in outs], axis=-2))

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        for sk, zk in (("wq_scale", "wq_zp"), ("iq_scale", "iq_zp")):
            if sk in out:
                out[sk], out[zk] = reduce_bank(out[sk], out[zk])
        return out

    return walk(params)


def verify_calibration_status(params) -> dict:
    """Count calibrated input-quantizer slots (scale != 1 heuristic; the
    reference counts `calibrated` flags, `main_sp_eval.py:80-107`)."""
    import jax

    total = calibrated = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys[-1] == "iq_scale":
            arr = np.asarray(leaf)
            for p_idx in range(arr.shape[-2] if arr.ndim >= 2 else 1):
                total += 1
                sl = arr[..., p_idx, :] if arr.ndim >= 2 else arr
                if not np.allclose(sl, 1.0):
                    calibrated += 1
    return {"total": total, "calibrated": calibrated}


def main(argv=None):
    p = argparse.ArgumentParser(description="SP model evaluation")
    p.add_argument("--model-path", required=True)
    p.add_argument("--output-dir", default="outputs/eval_sp")
    p.add_argument("--max-length", type=int, default=256)
    p.add_argument("--stride", type=int, default=256)
    p.add_argument("--max-samples", type=int, default=500)
    p.add_argument("--per-tensor", action="store_true",
                   help="force per-tensor quantization (reference eval mode)")
    p.add_argument("--datasets", nargs="+", default=["wikitext2"])
    p.add_argument("--tasks", nargs="+", default=None,
                   help="zero-shot tasks (default: all six)")
    p.add_argument("--skip-zero-shot", action="store_true")
    p.add_argument("--synthetic-tasks", action="store_true",
                   help="use synthetic zero-shot examples (offline testing)")
    p.add_argument("--few-shot", action="store_true",
                   help="also run MMLU few-shot (needs hub access)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data import get_gpt2_tokenizer, load_wikitext
    from ..evals import (
        PerplexityEvaluator, ResultTableGenerator, STANDARD_CONFIGS,
        ZeroShotEvaluator, count_parameters_m, model_size_gb,
    )
    from ..models import prec_tables, sp_forward

    params, cfg, bit_width = load_switchable_model(
        args.model_path, args.per_tensor
    )
    tables = prec_tables(cfg.quant)
    prec = jnp.int32(cfg.quant.prec_index(bit_width or 32))
    print(f"loaded {args.model_path}: bit={bit_width}, "
          f"calibration={verify_calibration_status(params)}")

    def logits_fn(ids):
        return sp_forward(params, ids, prec, cfg, tables=tables)["logits"]

    tokenizer = get_gpt2_tokenizer()
    ppl_eval = PerplexityEvaluator(logits_fn, args.max_length, args.stride)

    dataset_map = {
        "wikitext2": ("wikitext-2-raw-v1", "test"),
        "wikitext103": ("wikitext-103-raw-v1", "test"),
    }
    results = {"bit_width": bit_width, "perplexity": {}}
    for name in args.datasets:
        version, split = dataset_map.get(name, ("wikitext-2-raw-v1", "test"))
        texts = load_wikitext(version, split, limit=200)
        seqs = [np.asarray(tokenizer(t), np.int32) for t in texts if t.strip()]
        ppl = ppl_eval.calculate_perplexity(seqs)
        results["perplexity"][name] = round(ppl, 1)
        print(f"{name} PPL: {ppl:.1f}")

    # -- zero-shot suite (reference `main_sp_eval.py:164-187` runs it right
    # after perplexity and writes both into the same results JSON) ---------
    if not args.skip_zero_shot:
        from ..evals.task_loading import load_all_tasks, synthetic_tasks

        if args.synthetic_tasks:
            tasks = synthetic_tasks()
            if args.tasks:
                tasks = {k: v for k, v in tasks.items() if k in args.tasks}
        else:
            tasks = load_all_tasks(args.tasks, args.max_samples)
        avail = {k: v for k, v in tasks.items() if v}
        missing = sorted(set(tasks) - set(avail))
        if missing:
            print(f"zero-shot: no data for {missing} (offline hub?) — "
                  "skipped those tasks")
        if avail:
            zs_eval = ZeroShotEvaluator(
                logits_fn, tokenizer, max_length=args.max_length,
                max_samples=args.max_samples)
            results["zero_shot"] = zs_eval.evaluate_all_tasks(avail)
            for t, acc in results["zero_shot"].items():
                print(f"zero-shot {t}: {acc:.1f}")

    if args.few_shot:
        from ..evals import FewShotEvaluator, load_mmlu

        mmlu = load_mmlu()
        if mmlu is None:
            print("few-shot: MMLU unavailable (offline hub?) — skipped")
        else:
            fs_eval = FewShotEvaluator(logits_fn, tokenizer,
                                       max_length=args.max_length)
            results["few_shot"] = fs_eval.evaluate_all(mmlu_subjects=mmlu)
            print(f"few-shot: {results['few_shot']}")

    # -- model-size / compression over the 13 standard W-A-KV configs
    # (reference `sp_metrics.py:64-101` sweep) ----------------------------
    from ..evals import compression_ratio, get_config_string

    params_m = count_parameters_m(params)
    w = bit_width or 32
    cfg_bits = {"W": w, "A": w, "KV": w}
    results["model_size_gb"] = model_size_gb(
        params_m, cfg.model.n_layer, cfg.model.n_head, cfg.model.head_dim,
        cfg_bits,
    )
    results["compression_ratio"] = 32.0 / w
    results["model_size_sweep"] = {
        name: {
            "bits": get_config_string(c),
            "model_size_gb": round(model_size_gb(
                params_m, cfg.model.n_layer, cfg.model.n_head,
                cfg.model.head_dim, c), 4),
            "compression_ratio": round(
                compression_ratio(c, STANDARD_CONFIGS["FP32"]), 2),
        }
        for name, c in STANDARD_CONFIGS.items()
    }

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # -- result tables (reference `generate_tables.py`; files land next to
    # the results JSON) ----------------------------------------------------
    tbl_input = {
        f"SP-{w}bit": {
            "bits": w,
            "model_size_gb": results["model_size_gb"],
            "zero_shot": results.get("zero_shot"),
            "perplexity": {k.replace("wikitext2", "WikiText2")
                           .replace("wikitext103", "WikiText103"): v
                           for k, v in results["perplexity"].items()},
            "few_shot": results.get("few_shot"),
        }
    }
    gen = ResultTableGenerator(tbl_input, output_dir=str(out_dir))
    print(gen.generate_table_2_perplexity())
    if results.get("zero_shot"):
        print(gen.generate_table_1_zero_shot())
        gen.export_to_latex()
    if results.get("few_shot"):
        print(gen.generate_table_7_few_shot())

    out_path = out_dir / "results.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(f"results → {out_path}")
    return results


if __name__ == "__main__":
    main()
