"""Offline quality-parity battery: reproduce the reference's RELATIVE phenomena.

Real GPT-2 + WikiText runs are blocked (zero-egress: no HF hub), so this
battery reproduces the reference report's four *directional* findings on the
fully-offline tiny-GPT harness (same recipe as scripts/qat_quality_experiment
.py: byte-level 4-layer d=128 GPT-2 pretrained FP32 on the synthetic corpus,
then quantization experiments on top):

  (a) minmax-vs-log crossover — minmax wins at <=4 bits, log wins at >=5
      (`Report...md:32-39`: INT4 53.2 vs 56.5; INT5 40.5 vs 35.1)
  (b) all-layers vs random-layer feature distillation — all-layers better
      PPL (`Report...md:80-87`: 56.5 vs 67.6 at INT4)
  (c) CPT-vs-SP trainable-parameter footprint (shape-only count at full
      GPT-2 124M dims: CPT ~1.9%% trainable vs SP ~51%%,
      `Report...md:135-139`) and near-equal INT5 quality (`:143-148`)
  (d) RPI defense — random switching recovers accuracy on adversarial
      texts, best at mid p (`Report...md:178-183`; recovery criterion
      `run_evaluation.py:136-141`)

Each phase prints a markdown table and the verdict REPRODUCED / DIVERGED;
results land in outputs/parity_battery.json and docs/RESULTS_R4.md cites
them. Run: python scripts/parity_battery.py [phase ...] (default: all).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

OUT = Path("outputs/parity_battery.json")
SEQ, BATCH = 64, 8


def _mk_cfg(bit_widths, kinds=None, rank=16, d=128, n_layer=4,
            n_head=4, vocab=260):
    from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig

    return SPModelConfig(
        model=GPT2Config(vocab_size=vocab, n_positions=128, n_embd=d,
                         n_layer=n_layer, n_head=n_head),
        quant=QuantConfig(
            bit_widths=tuple(bit_widths),
            quantizer_per_bit=kinds or {},
            lora_rank_per_bit={b: rank for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 2 * rank for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="float32",
    )


def transfer_base(src_params, src_cfg, dst_cfg, key):
    """Move trained base weights into a tree with a different QuantConfig.

    Mirrors the reference's pretrained-load semantics
    (`main_sp.py:55-141` / `models_sp.py:338-388`): base linears and
    embeddings copied, the (trained) 32-bit LayerNorm affine broadcast into
    EVERY precision bank, quantizer banks and LoRA re-initialized fresh.
    """
    import jax
    import jax.numpy as jnp

    from llm_qat_tpu.models import init_sp_params

    dst = init_sp_params(key, dst_cfg)
    s32 = src_cfg.quant.prec_index(32)

    def ln_bc(s, d):  # (..., P_src, dim) -> broadcast 32-slot to P_dst
        sel = jnp.take(s, s32, axis=-2)[..., None, :]
        return jnp.broadcast_to(sel, d.shape)

    out = dict(dst)
    out["wte"] = src_params["wte"]
    out["wpe"] = src_params["wpe"]
    out["ln_f"] = {k: ln_bc(src_params["ln_f"][k], dst["ln_f"][k])
                   for k in ("g", "b")}
    nb = {}
    for name in ("ln1", "ln2"):
        nb[name] = {k: ln_bc(src_params["blocks"][name][k],
                             dst["blocks"][name][k]) for k in ("g", "b")}
    for name in ("c_attn", "attn_proj", "c_fc", "mlp_proj"):
        lin = dict(dst["blocks"][name])
        lin["w"] = src_params["blocks"][name]["w"]
        lin["b"] = src_params["blocks"][name]["b"]
        nb[name] = lin
    out["blocks"] = nb
    return out


class Harness:
    """Shared tiny-GPT pretraining + eval plumbing."""

    def __init__(self, base_iters=400, d=128, n_layer=4,
                 corpus="bytes", base_lr=3e-4):
        """corpus="bytes": the r4 byte-level i.i.d.-words harness.
        corpus="markov": word-level order-2 Markov task with 16k contexts
        (capacity-bound — `synthetic_markov_corpus`), for the r5 scale
        sweep (VERDICT r4 #5: phases (b)/(d) at sizes that discriminate).
        """
        import functools

        import jax
        import jax.numpy as jnp
        import optax

        from llm_qat_tpu.data import (
            WordTokenizer, create_dataloaders, get_gpt2_tokenizer,
            synthetic_corpus, synthetic_markov_corpus,
        )
        from llm_qat_tpu.models import init_sp_params, prec_tables, sp_forward

        self.jax, self.jnp = jax, jnp
        self.corpus = corpus
        if corpus == "markov":
            mk = functools.partial(synthetic_markov_corpus, vocab_size=128,
                                   table_seed=0)
            self.tokenizer = WordTokenizer(vocab_size=128)
            train_txt, val_txt = mk(1024, 0), mk(64, 1)
            held_txt, attack_txt = mk(64, 2), mk(40, 3)
            self.attack_vocab = [f"w{i}" for i in range(128)]
        else:
            self.tokenizer = get_gpt2_tokenizer()
            train_txt, val_txt = synthetic_corpus(96, 0), synthetic_corpus(24, 1)
            held_txt, attack_txt = synthetic_corpus(24, 2), synthetic_corpus(40, 3)
            from llm_qat_tpu.data.lm_datasets import synthetic_corpus as _sc

            self.attack_vocab = sorted({w.strip(".").lower()
                                        for t in _sc(4, 0) for w in t.split()
                                        if len(w) > 3})
        self.mk_cfg = functools.partial(
            _mk_cfg, d=d, n_layer=n_layer, n_head=max(4, d // 64),
            vocab=self.tokenizer.vocab_size)
        self.cfg0 = self.mk_cfg((4, 32))
        self.tables0 = prec_tables(self.cfg0.quant)
        self.train_ds, self.val_ds = create_dataloaders(
            self.tokenizer, train_txt, val_txt, max_length=SEQ)
        self.held_out = [np.asarray(self.tokenizer(t), np.int32)
                         for t in held_txt]
        self.attack_texts = [t for t in attack_txt
                             if len(t.split()) >= 5]

        params = init_sp_params(jax.random.PRNGKey(0), self.cfg0)
        opt = optax.adamw(base_lr)
        opt_state = opt.init(params)
        p32 = jnp.int32(self.cfg0.quant.prec_index(32))

        @jax.jit
        def base_step(params, opt_state, ids):
            def loss_fn(p):
                return sp_forward(p, ids, p32, self.cfg0,
                                  tables=self.tables0, labels=ids)["loss"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        gen = self.batches_forever(0)
        t0 = time.time()
        for it in range(base_iters):
            ids, _ = next(gen)
            params, opt_state, loss = base_step(params, opt_state,
                                                jnp.asarray(ids))
        print(f"[shared] base FP32 training {base_iters} iters "
              f"({time.time()-t0:.0f}s), final loss {float(loss):.4f}",
              flush=True)
        self.base_params = params
        self.calib = [jnp.asarray(ids)
                      for ids, _ in self.train_ds.batches(BATCH)][:4]

    def batches_forever(self, seed0):
        if self.corpus == "markov":
            # INFINITE-DATA regime: fresh docs from the same transition
            # tables every cycle, so doc memorization is impossible and
            # train loss == generalization — only the table (capacity)
            # is learnable. (The fixed-corpus variant measured d128
            # overfitting to held-out PPL ~2900 while train loss hit
            # 0.75 — the harness was testing memorization, not capacity.)
            from llm_qat_tpu.data import synthetic_markov_corpus

            seed = seed0
            while True:
                docs = synthetic_markov_corpus(256, seed=7_000 + seed,
                                               vocab_size=128, table_seed=0)
                ids = np.stack([
                    np.pad(np.asarray(self.tokenizer(t), np.int32)[:SEQ],
                           (0, max(0, SEQ - len(self.tokenizer(t)[:SEQ]))))
                    for t in docs if len(t.split()) >= SEQ])
                perm = np.random.default_rng(seed).permutation(len(ids))
                ids = ids[perm]
                for i in range(0, len(ids) - BATCH + 1, BATCH):
                    yield ids[i:i + BATCH], None
                seed += 1
            return
        it, seed = None, seed0
        while True:
            if it is None:
                it = self.train_ds.batches(BATCH, shuffle=True, seed=seed)
                seed += 1
            try:
                yield next(it)
            except StopIteration:
                it = None

    def ppl(self, params, cfg, bits, tables=None):
        from llm_qat_tpu.evals import PerplexityEvaluator
        from llm_qat_tpu.models import prec_tables, sp_forward

        tables = tables if tables is not None else prec_tables(cfg.quant)
        jnp = self.jnp

        def logits_fn(ids):
            return sp_forward(params, ids,
                              jnp.int32(cfg.quant.prec_index(bits)), cfg,
                              tables=tables)["logits"]

        ev = PerplexityEvaluator(logits_fn, max_length=SEQ, stride=SEQ)
        return ev.calculate_perplexity(self.held_out)

    def sp_qat(self, params, cfg, iters=300, accumulative=False, lr=5e-4,
               alpha_feature=1e-7, feature_grad=False):
        import jax

        from llm_qat_tpu.models import prec_tables
        from llm_qat_tpu.models.config import TrainConfig
        from llm_qat_tpu.train import CalibrationManager
        from llm_qat_tpu.train.sp_trainer import make_sp_train_step

        tables = prec_tables(cfg.quant)
        mgr = CalibrationManager(cfg, 4)
        params = mgr.calibrate_all_precisions(params, self.calib)
        tcfg = TrainConfig(batch_size=BATCH, max_seq_length=SEQ,
                           learning_rate=lr, num_iterations=iters,
                           gradient_accumulation_steps=4,
                           distill_accumulative=accumulative,
                           distill_alpha_feature=alpha_feature,
                           distill_feature_grad=feature_grad,
                           eval_interval=10_000)
        init_state, train_step = make_sp_train_step(cfg, tcfg, tables)
        state = init_state(params)
        step_fn = jax.jit(train_step)
        key = jax.random.PRNGKey(7)
        gen = self.batches_forever(100)
        for it in range(iters):
            ids, _ = next(gen)
            key, sub = jax.random.split(key)
            state, _ = step_fn(state, self.jnp.asarray(ids), sub)
        return state.params


def phase_a(h: Harness, results):
    """Minmax-vs-log crossover at bits 3..6 (PTQ + short QAT)."""
    import jax

    bits_list = (3, 4, 5, 6)
    table = {}
    for kind in ("minmax", "log"):
        cfg = h.mk_cfg(bits_list + (32,),
                       kinds={b: kind for b in range(2, 17)})
        p = transfer_base(h.base_params, h.cfg0, cfg, jax.random.PRNGKey(1))
        p = h.sp_qat(p, cfg, iters=250)
        table[kind] = {b: round(h.ppl(p, cfg, b), 2) for b in bits_list}
        print(f"[a] {kind}: {table[kind]}", flush=True)
    # reference direction: minmax <= log at 4 bits, log <= minmax at 5+
    low_ok = table["minmax"][4] <= table["log"][4]
    high_ok = table["log"][5] <= table["minmax"][5]
    results["a_quantizer_crossover"] = {
        "ppl": table, "minmax_wins_at_4": bool(low_ok),
        "log_wins_at_5": bool(high_ok),
        "reproduced": bool(low_ok and high_ok),
    }
    print("| bits | minmax PPL | log PPL |")
    print("|---|---|---|")
    for b in bits_list:
        print(f"| {b} | {table['minmax'][b]} | {table['log'][b]} |")
    print(f"[a] minmax wins @4: {low_ok}, log wins @5: {high_ok} -> "
          f"{'REPRODUCED' if low_ok and high_ok else 'DIVERGED'}", flush=True)


def phase_b(h: Harness, results):
    """Random-layer vs all-layers feature distillation at INT4.

    Two sub-experiments:
    1. FAITHFUL semantics: the reference detaches hidden states for BOTH
       teacher and student (`models_sp.py:322,331`), so the feature term
       carries no gradient — the ablation is provably a no-op (identical
       trained params). We assert that identity: the reference's published
       56.5-vs-67.6 difference (`Report…md:80-87`) cannot be produced by
       its released code.
    2. GRADIENT-CARRYING (`distill_feature_grad=True`): what the report's
       numbers imply the code did — the ablation the scale sweep tests.
    """
    import jax

    cfg = h.mk_cfg((4, 32))
    out = {}
    # alpha_feature amplified (reference 1e-7 at GPT-2 scale; at tiny
    # scale that weight makes the feature term invisible, so the ablation
    # would compare noise): the MECHANISM difference is what's under test
    for label, acc in (("random_layer", False), ("all_layers", True)):
        p = transfer_base(h.base_params, h.cfg0, cfg, jax.random.PRNGKey(2))
        p = h.sp_qat(p, cfg, iters=250, accumulative=acc,
                     alpha_feature=1.0, feature_grad=True)
        out[label] = round(h.ppl(p, cfg, 4), 2)
        print(f"[b] {label} (feature_grad): INT4 PPL {out[label]}",
              flush=True)
    # faithful-detach identity check (one short run per mode)
    faithful = {}
    for label, acc in (("random_layer", False), ("all_layers", True)):
        p = transfer_base(h.base_params, h.cfg0, cfg, jax.random.PRNGKey(2))
        p = h.sp_qat(p, cfg, iters=60, accumulative=acc, alpha_feature=1.0)
        faithful[label] = round(h.ppl(p, cfg, 4), 4)
    detach_identity = faithful["random_layer"] == faithful["all_layers"]
    print(f"[b] faithful-detach identity (60 iters): {faithful} -> "
          f"{'IDENTICAL' if detach_identity else 'differ'}", flush=True)
    # reference direction: all-layers better PPL (56.5 vs 67.6)
    ok = out["all_layers"] <= out["random_layer"]
    results["b_distill_ablation"] = {
        **out, "faithful_detach": faithful,
        "faithful_detach_identical": bool(detach_identity),
        "reproduced": bool(ok)}
    print(f"| feature loss (grad-carrying) | INT4 PPL |\n|---|---|\n"
          f"| random layer | {out['random_layer']} |\n"
          f"| all layers | {out['all_layers']} |")
    print(f"[b] all-layers better: {ok} -> "
          f"{'REPRODUCED' if ok else 'DIVERGED'}", flush=True)


def phase_c(h: Harness, results):
    """CPT-vs-SP trainable footprint (shape-only, full 124M dims) + INT5
    quality comparison on the tiny harness."""
    import jax

    from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig
    from llm_qat_tpu.models.cpt_model import cpt_tables, init_cpt_params
    from llm_qat_tpu.models.config import CPTConfig
    from llm_qat_tpu.train.cpt_trainer import (
        CPTCalibrationManager, cpt_trainable_mask, make_cpt_train_step,
    )
    from llm_qat_tpu.train.sp_trainer import trainable_mask

    # --- footprint at full GPT-2 dims (reference configs; eval_shape only)
    sp_cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(bit_widths=(7, 32)))  # config_sp.py:33, rank 64
    cpt_cfg = CPTConfig(model=GPT2Config())     # rank 16 shared, 2..18+32

    from llm_qat_tpu.models import init_sp_params

    sp_shapes = jax.eval_shape(
        lambda k: init_sp_params(k, sp_cfg), jax.random.PRNGKey(0))
    cpt_shapes = jax.eval_shape(
        lambda k: init_cpt_params(k, cpt_cfg), jax.random.PRNGKey(0))

    def count(tree, mask=None):
        leaves = jax.tree.leaves(tree)
        if mask is None:
            return sum(int(np.prod(l.shape)) for l in leaves)
        ms = jax.tree.leaves(mask)
        return sum(int(np.prod(l.shape)) for l, m in zip(leaves, ms) if m)

    sp_total = count(sp_shapes)
    sp_train = count(sp_shapes, trainable_mask(sp_shapes))
    cpt_total = count(cpt_shapes)
    cpt_train = count(cpt_shapes, cpt_trainable_mask(cpt_shapes))
    foot = {
        "sp_total_M": round(sp_total / 1e6, 1),
        "sp_trainable_M": round(sp_train / 1e6, 1),
        "sp_trainable_pct": round(100 * sp_train / sp_total, 1),
        "cpt_total_M": round(cpt_total / 1e6, 1),
        "cpt_trainable_M": round(cpt_train / 1e6, 1),
        "cpt_trainable_pct": round(100 * cpt_train / cpt_total, 1),
    }
    print(f"[c] footprint: {foot}", flush=True)
    # reference: CPT trainable fraction FAR below SP's (1.9% vs 51.4%)
    foot_ok = (foot["cpt_trainable_pct"] < 10
               and foot["sp_trainable_pct"] > 25)

    # --- INT5 quality, tiny harness: SP QAT vs CPT cyclic training
    sp5_cfg = _mk_cfg((5, 32))
    p_sp = transfer_base(h.base_params, h.cfg0, sp5_cfg,
                         jax.random.PRNGKey(3))
    p_sp = h.sp_qat(p_sp, sp5_cfg, iters=250)
    sp_ppl = round(h.ppl(p_sp, sp5_cfg, 5), 2)

    tiny_cpt = CPTConfig(
        model=h.cfg0.model, bit_widths=tuple(range(3, 9)) + (32,),
        lora_rank=16, lora_alpha=32, target_bits=5, per_channel=False,
        total_epochs=10, total_cycles=2)
    import jax.numpy as jnp

    p_cpt = init_cpt_params(jax.random.PRNGKey(4), tiny_cpt)
    # copy the shared pretrained trunk
    src = h.base_params
    blocks = dict(p_cpt["blocks"])
    for name in ("c_attn", "attn_proj", "c_fc", "mlp_proj"):
        lin = dict(blocks[name])
        lin["w"] = src["blocks"][name]["w"]
        lin["b"] = src["blocks"][name]["b"]
        blocks[name] = lin
    s32 = h.cfg0.quant.prec_index(32)
    for name in ("ln1", "ln2"):
        blocks[name] = {k: src["blocks"][name][k][:, s32]
                        for k in ("g", "b")}
    p_cpt = dict(p_cpt, blocks=blocks, wte=src["wte"], wpe=src["wpe"],
                 ln_f={k: src["ln_f"][k][s32] for k in ("g", "b")})

    from llm_qat_tpu.train.cpt_trainer import CyclicPrecisionScheduler

    mgr = CPTCalibrationManager(tiny_cpt, 4)
    p_cpt = mgr.calibrate_gradient_quantizers(p_cpt, h.calib[0])
    sched = CyclicPrecisionScheduler(
        bit_widths=tiny_cpt.bit_widths[:-1], total_epochs=10, total_cycles=2,
        schedule_type="cosine")
    init_state, train_step = make_cpt_train_step(tiny_cpt, 5e-4, 250)
    step_fn = jax.jit(train_step)
    gen = h.batches_forever(200)
    state = None
    it_total = 0
    for epoch in range(10):
        bits = sched.get_precision_for_epoch(epoch)
        p_now = state["params"] if state else p_cpt
        p_now = mgr.ensure_calibrated(p_now, bits, h.calib)
        if state is None:
            state = init_state(p_now)
        else:
            state = dict(state, params=p_now)
        prec = jnp.int32(tiny_cpt.bit_widths.index(bits))
        for _ in range(25):
            ids, _ = next(gen)
            state, _ = step_fn(state, jnp.asarray(ids), prec)
            it_total += 1
    p_final = mgr.ensure_calibrated(state["params"], 5, h.calib)

    from llm_qat_tpu.evals import PerplexityEvaluator
    from llm_qat_tpu.models.cpt_model import cpt_forward

    tb = cpt_tables(tiny_cpt)
    i5 = jnp.int32(tiny_cpt.bit_widths.index(5))

    def logits_fn(ids):
        return cpt_forward(p_final, ids, i5, tiny_cpt, tables=tb)["logits"]

    cpt_ppl = round(PerplexityEvaluator(
        logits_fn, max_length=SEQ, stride=SEQ
    ).calculate_perplexity(h.held_out), 2)

    # reference: near-equal INT5 quality (49.3 vs 49.1 zero-shot)
    qual_ok = abs(np.log(cpt_ppl) - np.log(sp_ppl)) < np.log(1.5)
    results["c_cpt_vs_sp"] = {
        **foot, "sp_int5_ppl": sp_ppl, "cpt_int5_ppl": cpt_ppl,
        "footprint_reproduced": bool(foot_ok),
        "quality_comparable": bool(qual_ok),
        "reproduced": bool(foot_ok and qual_ok),
    }
    print(f"| | total M | trainable M | trainable % | INT5 PPL |\n"
          f"|---|---|---|---|---|\n"
          f"| SP | {foot['sp_total_M']} | {foot['sp_trainable_M']} | "
          f"{foot['sp_trainable_pct']} | {sp_ppl} |\n"
          f"| CPT | {foot['cpt_total_M']} | {foot['cpt_trainable_M']} | "
          f"{foot['cpt_trainable_pct']} | {cpt_ppl} |")
    print(f"[c] footprint ok: {foot_ok}, quality comparable: {qual_ok} -> "
          f"{'REPRODUCED' if foot_ok and qual_ok else 'DIVERGED'}",
          flush=True)


def phase_d(h: Harness, results):
    """RPI defense on the QAT-trained tiny model at p in {0, .3, .5, .7}."""
    import jax
    import jax.numpy as jnp

    from llm_qat_tpu.models import prec_tables, sp_forward
    from llm_qat_tpu.robustness import (
        SimplifiedRandomSwitching, TextFoolerAttack, run_rpi_evaluation,
    )
    from llm_qat_tpu.robustness.random_switching import token_level_metrics

    cfg = h.mk_cfg((3, 4, 32))
    params = transfer_base(h.base_params, h.cfg0, cfg, jax.random.PRNGKey(5))
    params = h.sp_qat(params, cfg, iters=200)
    tables = prec_tables(cfg.quant)
    bits_to_idx = {b: cfg.quant.prec_index(b) for b in cfg.quant.bit_widths}
    max_pos = cfg.model.n_positions

    @jax.jit
    def forward(ids, prec):
        return sp_forward(params, ids, prec, cfg, tables=tables)["logits"]

    def _metrics_at(text, prec_idx):
        ids = np.asarray(h.tokenizer(text)[:max_pos], np.int32)
        if len(ids) < 3:
            return 0.0, 0.0
        logits = forward(jnp.asarray(ids[None]), jnp.int32(prec_idx))
        loss_sum, correct, n = token_level_metrics(np.asarray(logits),
                                                   ids[None])
        return loss_sum / max(n, 1), correct / max(n, 1)

    def metrics_fn(text):
        return _metrics_at(text, bits_to_idx[32])

    def switched_metrics_fn(text, p, seed):
        sw = SimplifiedRandomSwitching(
            lambda ids, prec: {"logits": forward(ids, prec)},
            cfg.quant.bit_widths, bits_to_idx, p, seed)
        ids = np.asarray(h.tokenizer(text)[:max_pos], np.int32)
        if len(ids) < 3:
            return 0.0, 0.0
        out, _ = sw.forward_with_switching(ids[None])
        loss_sum, correct, n = token_level_metrics(np.asarray(out["logits"]),
                                                   ids[None])
        return loss_sum / max(n, 1), correct / max(n, 1)

    def embed_fn(text):
        ids = np.asarray(h.tokenizer(text)[:max_pos], np.int32)
        if len(ids) == 0:
            return np.zeros(cfg.model.n_embd)
        return np.asarray(params["wte"])[ids].mean(0)

    # in-vocabulary substitution candidates: the tiny byte-level model has
    # only ever seen the 22-word synthetic vocabulary, so WordNet-style
    # out-of-vocabulary synonyms produce degenerate high-loss text at EVERY
    # precision (nothing for the defense to recover); restricting the
    # candidate set to corpus words keeps the attack in-distribution, the
    # regime the reference's real-English attacks operate in. The
    # embedding-cosine gate still filters candidates per TextFooler.
    vocab = h.attack_vocab

    class CorpusSynonyms:
        def get_synonyms(self, word, max_candidates=10):
            w = word.lower().strip(".")
            if w not in vocab:
                return []
            return [v for v in vocab if v != w][:max_candidates]

    # max_perturb_ratio 0.15: the defense mechanism needs MARGINALLY
    # adversarial texts (perturbations that overfit the 32-bit boundary);
    # unconstrained greedy substitution produces robustly-bad text no
    # precision recovers
    attacks = {"TextFooler": TextFoolerAttack(metrics_fn, embed_fn,
                                              synonyms=CorpusSynonyms(),
                                              sim_threshold=0.0,
                                              max_perturb_ratio=0.15)}
    report = run_rpi_evaluation(
        metrics_fn, switched_metrics_fn, attacks, h.attack_texts,
        switch_probs=(0.0, 0.3, 0.5, 0.7), max_samples=12)
    d = report["defense"].get("TextFooler", {})
    # mechanism diagnostic: adversarial-text accuracy at each FIXED
    # precision — recovery requires the attack to transfer WORSE to the
    # low-bit students than to the 32-bit target
    adv_texts = [t for t in h.attack_texts[:12]]
    fixed = {}
    for bname in cfg.quant.bit_widths:
        accs = [
            _metrics_at(t, bits_to_idx[bname])[1] for t in adv_texts]
        fixed[str(bname)] = round(float(np.mean(accs)), 4)
    print(f"[d] clean accuracy by fixed precision: {fixed}", flush=True)
    byp = d.get("by_probability", {})
    # reference direction: switching at mid p recovers accuracy vs p=0
    rec0 = byp.get("0.0", {}).get("recovery_ratio", 0.0)
    best = max((v.get("recovery_ratio", 0.0) for k, v in byp.items()
                if k != "0.0"), default=0.0)
    ok = best > max(rec0, 0.0)
    results["d_rpi_defense"] = {
        "attack_success_rate":
            report["attacks"].get("TextFooler", {}).get("attack_success_rate"),
        "by_probability": byp, "optimal_p": d.get("optimal_p"),
        "clean_acc_by_fixed_precision": fixed,
        "orig_accuracy": d.get("orig_accuracy"),
        "adv_accuracy": d.get("adv_accuracy"),
        "reproduced": bool(ok),
    }
    print("| p | switched acc | recovery ratio |")
    print("|---|---|---|")
    for k in ("0.0", "0.3", "0.5", "0.7"):
        v = byp.get(k, {})
        print(f"| {k} | {v.get('switched_accuracy', float('nan')):.3f} | "
              f"{v.get('recovery_ratio', float('nan')):.3f} |")
    print(f"[d] defense recovers at p>0: {ok} -> "
          f"{'REPRODUCED' if ok else 'DIVERGED'}", flush=True)


PHASES = {"a": phase_a, "b": phase_b, "c": phase_c, "d": phase_d}


def main(argv):
    which = [p for p in argv if p in PHASES] or list(PHASES)
    results = {}
    if OUT.exists():
        results = json.loads(OUT.read_text())
    h = Harness()
    for name in which:
        print(f"\n=== phase ({name}) ===", flush=True)
        PHASES[name](h, results)
        OUT.parent.mkdir(parents=True, exist_ok=True)
        OUT.write_text(json.dumps(results, indent=2))
    print(f"\nwrote {OUT}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
