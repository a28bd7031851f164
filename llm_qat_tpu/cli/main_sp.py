"""SP training entry point (reference `part1_switchable_precision/main_sp.py:143-232`).

Flow: build SP GPT-2 → load pretrained HF weights (when reachable; offline
runs keep random init) → dataloaders → calibrate → multi-precision distill
training → per-bit checkpoints + training-stats JSON.

Unlike the reference (which *requires* CUDA, `main_sp.py:150-151`), this runs
on whatever JAX backend is available — TPU in production, CPU in tests.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def build_arg_parser():
    p = argparse.ArgumentParser(description="Switchable-precision QAT training")
    p.add_argument("--output-dir", default="outputs/sp")
    p.add_argument("--bit-widths", type=int, nargs="+", default=[7, 32])
    p.add_argument("--num-iterations", type=int, default=550)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-seq-length", type=int, default=256)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--grad-accum", type=int, default=8)
    p.add_argument("--eval-interval", type=int, default=50)
    p.add_argument("--lora-rank", type=int, default=64)
    p.add_argument("--lora-alpha", type=int, default=64)
    p.add_argument("--pretrained", default="gpt2",
                   help="HF model name, or 'none' for random init")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + synthetic data (smoke runs)")
    p.add_argument("--checkpoint", default=None,
                   help="resume checkpoint (unlike the reference's dead flag, "
                        "main_sp.py:146-148, this one is honored)")
    p.add_argument("--save-every", type=int, default=0,
                   help="async elastic checkpoint every N iterations "
                        "(params + optimizer state; 0 disables)")
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from the newest elastic checkpoint in "
                        "OUTPUT_DIR/elastic (preemption-restart flow)")
    return p


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..data import create_dataloaders, get_gpt2_tokenizer, synthetic_corpus
    from ..deploy import load_checkpoint, save_per_bit_checkpoints
    from ..models import (
        GPT2Config, QuantConfig, SPModelConfig, TrainConfig, init_sp_params,
        prec_tables, tiny_test_config,
    )
    from ..models.hf_import import load_hf_gpt2
    from ..train import CalibrationManager
    from ..train.sp_trainer import make_eval_step, make_sp_train_step
    from ..utils.stats import StatsTracker

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.tiny:
        cfg = tiny_test_config(tuple(args.bit_widths))
    else:
        cfg = SPModelConfig(
            model=GPT2Config(),
            quant=QuantConfig(
                bit_widths=tuple(args.bit_widths),
                lora_rank_per_bit={b: args.lora_rank for b in range(2, 17)}
                | {32: 0},
                lora_alpha_per_bit={b: args.lora_alpha for b in range(2, 17)}
                | {32: 0},
            ),
            compute_dtype="bfloat16" if jax.default_backend() == "tpu"
            else "float32",
            # unrolled layer scan: static per-layer slices fuse where the
            # rolled scan's dynamic-slice/DUS plumbing cannot (~25 ms/step
            # on v5e, scripts/train_bench.py r4) at ~2x compile time.
            scan_unroll=GPT2Config().n_layer,
        )
    tcfg = TrainConfig(
        batch_size=args.batch_size, max_seq_length=args.max_seq_length,
        learning_rate=args.learning_rate, num_iterations=args.num_iterations,
        gradient_accumulation_steps=args.grad_accum,
        eval_interval=args.eval_interval,
    )
    tables = prec_tables(cfg.quant)

    params = init_sp_params(jax.random.PRNGKey(args.seed), cfg)
    if args.checkpoint:
        params, meta = load_checkpoint(args.checkpoint)
        print(f"resumed from {args.checkpoint} (bit={meta.get('bit_width')})")
    elif args.pretrained != "none" and not args.tiny:
        try:
            params = load_hf_gpt2(params, cfg, args.pretrained)
            print(f"loaded pretrained weights: {args.pretrained}")
        except Exception as e:
            print(f"WARNING: pretrained load failed ({e}); using random init")

    tokenizer = get_gpt2_tokenizer()
    if args.tiny:
        train_ds, val_ds = create_dataloaders(
            tokenizer, synthetic_corpus(64, 0), synthetic_corpus(16, 1),
            max_length=args.max_seq_length,
        )
    else:
        train_ds, val_ds = create_dataloaders(
            tokenizer, max_length=args.max_seq_length,
        )
    print(f"train windows: {len(train_ds)}, val windows: {len(val_ds)}")

    calib_batches = [
        jnp.asarray(ids)
        for ids, _ in train_ds.batches(min(args.batch_size, 8))
    ][: tcfg.calibration_batches]
    mgr = CalibrationManager(cfg, tcfg.calibration_batches)
    t0 = time.time()
    params = mgr.calibrate_all_precisions(params, calib_batches)
    print(f"calibrated {cfg.quant.student_bits} in {time.time()-t0:.1f}s")

    init_state, train_step = make_sp_train_step(cfg, tcfg, tables)
    eval_step = make_eval_step(cfg, tables)
    state = init_state(params)
    step_fn = jax.jit(train_step)
    stats = StatsTracker(cfg.quant.bit_widths)

    ckpt_mgr, start_iter = None, 0
    if args.save_every > 0 or args.auto_resume:
        from ..deploy.elastic import AsyncCheckpointManager

        ckpt_mgr = AsyncCheckpointManager(out_dir / "elastic")
        if args.auto_resume:
            restored = ckpt_mgr.restore_latest(state)
            if restored is not None:
                saved_it, state, _ = restored
                start_iter = saved_it + 1  # that iteration completed
                print(f"auto-resumed from elastic step {saved_it}")

    # Determinism under --auto-resume: both the per-step rng and the data
    # order are pure functions of the iteration index (rng = fold_in(base,
    # it); shuffle seeded by epoch = it // batches_per_epoch, skipping to
    # it % batches_per_epoch), so a resumed run replays the exact precision
    # sampling and batch sequence of an uninterrupted one.
    base_rng = jax.random.PRNGKey(args.seed + 1)
    per_epoch = max(1, len(train_ds) // tcfg.batch_size)
    batch_iter, cur_epoch = None, -1
    for it in range(start_iter, tcfg.num_iterations):
        epoch, pos = divmod(it, per_epoch)
        if epoch != cur_epoch:
            batch_iter = train_ds.batches(tcfg.batch_size, shuffle=True,
                                          seed=epoch)
            cur_epoch = epoch
            for _ in range(pos):  # resume mid-epoch: skip consumed batches
                next(batch_iter)
        ids, _ = next(batch_iter)
        sub = jax.random.fold_in(base_rng, it)
        state, metrics = step_fn(state, jnp.asarray(ids), sub)
        stats.record_iteration(float(metrics["loss"]), float(metrics["lr"]))
        for prec in np.asarray(metrics["precisions"]):
            stats.record_precision_usage(cfg.quant.bit_widths[int(prec)])

        if it % 10 == 0:
            print(f"iter {it}: loss={float(metrics['loss']):.4f} "
                  f"teacher={float(metrics['teacher_loss']):.4f} "
                  f"lr={float(metrics['lr']):.2e}")
        if it > 0 and it % tcfg.eval_interval == 0:
            evals = {}
            for bits in cfg.quant.bit_widths:
                vb = next(val_ds.batches(min(tcfg.batch_size, 8)))
                evals[bits] = float(eval_step(
                    state.params, jnp.asarray(vb[0]),
                    jnp.int32(cfg.quant.prec_index(bits))
                ))
            stats.record_eval(it, {"val_loss": {str(k): v
                                                for k, v in evals.items()}})
            print(f"  eval@{it}: " + " ".join(
                f"{b}bit={v:.3f}" for b, v in evals.items()))
        if ckpt_mgr is not None and args.save_every > 0 \
                and it % args.save_every == 0:
            ckpt_mgr.save(it, state)

    if ckpt_mgr is not None:
        ckpt_mgr.wait()
    paths = save_per_bit_checkpoints(out_dir, state.params, cfg)
    stats_path = stats.save(str(out_dir / f"training_stats_{int(time.time())}.json"),
                            cfg, tcfg)
    print(f"checkpoints: {paths}")
    print(f"stats: {stats_path}")
    return state, stats


if __name__ == "__main__":
    main()
