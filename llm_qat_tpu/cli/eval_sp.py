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
        params = _reduce_to_per_tensor(params)
    return params, cfg, meta.get("bit_width")


def _reduce_to_per_tensor(params):
    """Collapse per-channel scale banks to per-tensor (reference forces
    per_channel=False at eval load, `main_sp_eval.py:60`, `deploy.py:210`)."""
    import jax.numpy as jnp

    def f(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        name = keys[-1]
        if name in ("wq_scale", "iq_scale"):
            return jnp.max(leaf, axis=-1, keepdims=True)
        if name in ("wq_zp", "iq_zp"):
            return jnp.max(leaf, axis=-1, keepdims=True)
        return leaf

    import jax

    return jax.tree_util.tree_map_with_path(f, params)


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

    params_m = count_parameters_m(params)
    w = bit_width or 32
    cfg_bits = {"W": w, "A": w, "KV": w}
    results["model_size_gb"] = model_size_gb(
        params_m, cfg.model.n_layer, cfg.model.n_head, cfg.model.head_dim,
        cfg_bits,
    )
    results["compression_ratio"] = 32.0 / w

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / "results.json"
    out_path.write_text(json.dumps(results, indent=2))
    print(f"results → {out_path}")
    return results


if __name__ == "__main__":
    main()
