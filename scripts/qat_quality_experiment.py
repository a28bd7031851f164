"""QAT quality evidence: calibration + LoRA distillation recover low-bit PPL.

Fully-offline controlled experiment (VERDICT r2 missing #4): a byte-level
tiny GPT-2 is first trained at FP32 on the synthetic corpus ("pretraining"
proxy), then evaluated at {4, 8} bits under three regimes:

  (a) miscalibrated PTQ — quantizer stats collected on RANDOM tokens
      (wrong activation distribution; the closest runnable analogue of
      "uncalibrated": the reference refuses to run truly uncalibrated,
      `part1_switchable_precision/quantization.py:218-219`)
  (b) calibrated PTQ — stats on the real corpus; LoRA B is zero-init so the
      LoRA branch contributes nothing (pure post-training quantization)
  (c) calibrated + QAT — the SP recipe: multi-precision distillation
      training of the LoRA/LN banks with the 32-bit teacher
      (reference `train_sp.py:341-397`)

The reference's headline claim is exactly this recovery (BASELINE.md:
INT4 PPL 54.5 vs FP32 36.1 after SP training). Writes JSON next to the
script output dir and prints a markdown table for docs/RESULTS_R3.md.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(out_path="outputs/qat_quality.json", base_iters=400, qat_iters=300):
    import jax
    import jax.numpy as jnp
    import optax

    from llm_qat_tpu.data import (
        create_dataloaders, get_gpt2_tokenizer, synthetic_corpus,
    )
    from llm_qat_tpu.evals import PerplexityEvaluator
    from llm_qat_tpu.models import (
        GPT2Config, QuantConfig, SPModelConfig, TrainConfig, init_sp_params,
        prec_tables, sp_forward,
    )
    from llm_qat_tpu.models.sp_model import init_sp_params
    from llm_qat_tpu.train import CalibrationManager
    from llm_qat_tpu.train.sp_trainer import make_sp_train_step

    tokenizer = get_gpt2_tokenizer()
    cfg = SPModelConfig(
        model=GPT2Config(vocab_size=max(tokenizer.vocab_size, 260),
                         n_positions=128, n_embd=128, n_layer=4, n_head=4),
        quant=QuantConfig(
            bit_widths=(4, 8, 32),
            lora_rank_per_bit={b: 16 for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 32 for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="float32",
    )
    tables = prec_tables(cfg.quant)
    SEQ, BATCH = 64, 8

    train_ds, val_ds = create_dataloaders(
        tokenizer, synthetic_corpus(96, 0), synthetic_corpus(24, 1),
        max_length=SEQ,
    )
    print(f"train windows: {len(train_ds)}, val: {len(val_ds)}", flush=True)

    def batches_forever(seed0):
        it, seed = None, seed0
        while True:
            if it is None:
                it = train_ds.batches(BATCH, shuffle=True, seed=seed)
                seed += 1
            try:
                yield next(it)
            except StopIteration:
                it = None

    # ---- phase 1: FP32 "pretraining" (all params trainable) --------------
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def base_step(params, opt_state, ids):
        def loss_fn(p):
            return sp_forward(p, ids, jnp.int32(cfg.quant.prec_index(32)),
                              cfg, tables=tables, labels=ids)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    gen = batches_forever(0)
    t0 = time.time()
    for it in range(base_iters):
        ids, _ = next(gen)
        params, opt_state, loss = base_step(params, opt_state,
                                            jnp.asarray(ids))
        if it % 50 == 0:
            print(f"base iter {it}: loss={float(loss):.4f}", flush=True)
    print(f"base training {time.time()-t0:.0f}s, "
          f"final loss {float(loss):.4f}", flush=True)

    # ---- evaluation helper ----------------------------------------------
    held_out = [np.asarray(tokenizer(t), np.int32)
                for t in synthetic_corpus(24, 2)]

    def ppl(params, bits):
        def logits_fn(ids):
            return sp_forward(params, ids,
                              jnp.int32(cfg.quant.prec_index(bits)), cfg,
                              tables=tables)["logits"]

        ev = PerplexityEvaluator(logits_fn, max_length=SEQ, stride=SEQ)
        return ev.calculate_perplexity(held_out)

    calib_real = [jnp.asarray(ids)
                  for ids, _ in train_ds.batches(BATCH)][:4]
    rng = np.random.default_rng(9)
    calib_rand = [jnp.asarray(rng.integers(
        0, cfg.model.vocab_size, (BATCH, SEQ))) for _ in range(4)]

    results = {"fp32": round(ppl(params, 32), 2)}
    print(f"FP32 PPL: {results['fp32']}", flush=True)

    # (a) miscalibrated PTQ
    mgr = CalibrationManager(cfg, 4)
    p_mis = mgr.calibrate_all_precisions(params, calib_rand)
    results["miscalibrated_ptq"] = {
        b: round(ppl(p_mis, b), 2) for b in (4, 8)}
    print(f"(a) miscalibrated PTQ: {results['miscalibrated_ptq']}",
          flush=True)

    # (b) calibrated PTQ
    p_cal = mgr.calibrate_all_precisions(params, calib_real)
    results["calibrated_ptq"] = {b: round(ppl(p_cal, b), 2) for b in (4, 8)}
    print(f"(b) calibrated PTQ: {results['calibrated_ptq']}", flush=True)

    # (c) calibrated + SP QAT (LoRA/LN banks trained with distillation)
    tcfg = TrainConfig(batch_size=BATCH, max_seq_length=SEQ,
                       learning_rate=5e-4, num_iterations=qat_iters,
                       gradient_accumulation_steps=4, eval_interval=10_000)
    init_state, train_step = make_sp_train_step(cfg, tcfg, tables)
    state = init_state(p_cal)
    step_fn = jax.jit(train_step)
    key = jax.random.PRNGKey(7)
    t0 = time.time()
    for it in range(qat_iters):
        ids, _ = next(gen)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, jnp.asarray(ids), sub)
        if it % 50 == 0:
            print(f"qat iter {it}: loss={float(metrics['loss']):.4f}",
                  flush=True)
    print(f"qat training {time.time()-t0:.0f}s", flush=True)
    results["calibrated_qat"] = {
        b: round(ppl(state.params, b), 2) for b in (4, 8)}
    results["qat_fp32"] = round(ppl(state.params, 32), 2)
    print(f"(c) calibrated+QAT: {results['calibrated_qat']} "
          f"(teacher after QAT: {results['qat_fp32']})", flush=True)

    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))

    print("\n| regime | INT4 PPL | INT8 PPL | FP32 PPL |")
    print("|---|---|---|---|")
    print(f"| (a) miscalibrated PTQ | {results['miscalibrated_ptq'][4]} | "
          f"{results['miscalibrated_ptq'][8]} | {results['fp32']} |")
    print(f"| (b) calibrated PTQ | {results['calibrated_ptq'][4]} | "
          f"{results['calibrated_ptq'][8]} | {results['fp32']} |")
    print(f"| (c) calibrated + QAT | {results['calibrated_qat'][4]} | "
          f"{results['calibrated_qat'][8]} | {results['qat_fp32']} |")
    return results


if __name__ == "__main__":
    main(*sys.argv[1:])
