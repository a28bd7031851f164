"""PPL cost of the quantized-KV axis (VERDICT r3 #3/#5: "a KV4 PPL point").

Trains the offline tiny GPT (d=256 so the compiled KV4 kernel's d%256
constraint holds) FP32 + SP QAT exactly like scripts/parity_battery.py,
then measures held-out perplexity TEACHER-FORCED THROUGH THE MEGAKERNEL
DECODE PATH at W8A8 with KV16 / KV8 / KV4 (and W4A8 KV4): a lax.scan over
positions feeds ground-truth tokens and collects the kernel's logits, so
the measured PPL includes exactly the serving-time attention quantization
the decode matrix benchmarks — the quality axis of the reference's W-A-KV
configurations (`part3_eval_sp/bit_configurations.py:4`).

Run: python scripts/kv_quality.py   (TPU; ~10 min)
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SEQ, BATCH = 64, 8
OUT = Path("outputs/kv_quality.json")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from llm_qat_tpu.data import (
        create_dataloaders, get_gpt2_tokenizer, synthetic_corpus,
    )
    from llm_qat_tpu.models import (
        GPT2Config, QuantConfig, SPModelConfig, TrainConfig, init_sp_params,
        prec_tables, sp_forward,
    )
    from llm_qat_tpu.models.inference import quantize_for_inference
    from llm_qat_tpu.ops.mega_decode import (
        mega_decode_step, mega_decode_step_kv8, pack_mega_weights,
    )
    from llm_qat_tpu.train import CalibrationManager
    from llm_qat_tpu.train.sp_trainer import make_sp_train_step

    tokenizer = get_gpt2_tokenizer()
    cfg = SPModelConfig(
        model=GPT2Config(vocab_size=260, n_positions=128, n_embd=256,
                         n_layer=4, n_head=4),
        quant=QuantConfig(
            bit_widths=(4, 8, 32), quantizer_per_bit={8: "minmax"},
            per_channel=False,
            lora_rank_per_bit={b: 16 for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 32 for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="float32",
    )
    m = cfg.model
    tables = prec_tables(cfg.quant)
    train_ds, _ = create_dataloaders(
        tokenizer, synthetic_corpus(96, 0), synthetic_corpus(24, 1),
        max_length=SEQ)
    held = [np.asarray(tokenizer(t), np.int32)[:SEQ]
            for t in synthetic_corpus(24, 2)]
    held = np.stack([np.pad(h, (0, SEQ - len(h)), constant_values=0)
                     for h in held if len(h) >= SEQ // 2])

    # FP32 pretrain + SP QAT (as parity_battery)
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    opt = optax.adamw(3e-4)
    opt_state = opt.init(params)
    p32 = jnp.int32(cfg.quant.prec_index(32))

    @jax.jit
    def base_step(params, opt_state, ids):
        def loss_fn(p):
            return sp_forward(p, ids, p32, cfg, tables=tables,
                              labels=ids)["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def batches():
        seed = 0
        while True:
            for ids, _ in train_ds.batches(BATCH, shuffle=True, seed=seed):
                yield ids
            seed += 1

    gen = batches()
    t0 = time.time()
    for it in range(400):
        params, opt_state, loss = base_step(params, opt_state,
                                            jnp.asarray(next(gen)))
    print(f"pretrain 400 iters {time.time()-t0:.0f}s "
          f"loss {float(loss):.3f}", flush=True)

    calib = [jnp.asarray(next(gen)) for _ in range(4)]
    mgr = CalibrationManager(cfg, 4)
    params = mgr.calibrate_all_precisions(params, calib)
    tcfg = TrainConfig(batch_size=BATCH, max_seq_length=SEQ,
                       learning_rate=5e-4, num_iterations=250,
                       gradient_accumulation_steps=4, eval_interval=10_000)
    init_state, train_step = make_sp_train_step(cfg, tcfg, tables)
    state = init_state(params)
    step_fn = jax.jit(train_step)
    key = jax.random.PRNGKey(7)
    t0 = time.time()
    for it in range(250):
        key, sub = jax.random.split(key)
        state, _ = step_fn(state, jnp.asarray(next(gen)), sub)
    params = state.params
    print(f"qat 250 iters {time.time()-t0:.0f}s", flush=True)

    # baseline PPL through sp_forward (full-precision KV)
    def fq_ppl(bits):
        @jax.jit
        def lf(ids):
            return sp_forward(params, ids,
                              jnp.int32(cfg.quant.prec_index(bits)), cfg,
                              tables=tables)["logits"]

        return ppl_from_logits(lf(jnp.asarray(held)), held)

    def ppl_from_logits(logits, ids):
        logits = np.asarray(logits, np.float32)[:, :-1]
        tgt = ids[:, 1:]
        lse = np.log(np.sum(np.exp(
            logits - logits.max(-1, keepdims=True)), -1)) \
            + logits.max(-1)
        nll = lse - np.take_along_axis(
            logits, tgt[..., None], axis=-1)[..., 0]
        return float(np.exp(nll.mean()))

    # teacher-forced PPL through the megakernel at each KV width;
    # head_bits quantizes the LM head (r5 decode diet: the int4 head's
    # quality cost is measured here, not assumed)
    def mega_ppl(bits, wf, kvb, head_bits=None):
        from llm_qat_tpu.models.inference import _lm_head

        ip = quantize_for_inference(params, cfg, bits, jnp.float32,
                                    weight_format=wf, lm_head_int8=False,
                                    lm_head_bits=head_bits)
        ip.pop("_static")
        mw = pack_mega_weights(ip, cfg)
        B, T = held.shape
        Tc = -(-T // 64) * 64
        dc = m.n_embd if kvb != 4 else m.n_embd // 2

        @jax.jit
        def run(ids):
            def body(carry, i):
                caches = carry
                h = (ip["wte"][ids[:, i]]
                     + ip["wpe"][i][None]).astype(jnp.float32)
                if kvb == 16:
                    kc, vc = caches
                    h_out, kc, vc = mega_decode_step(
                        h, mw, kc, vc, i, n_head=m.n_head,
                        head_dim=m.head_dim, has_lora=True,
                        act_dtype=jnp.float32)
                    caches = (kc, vc)
                else:
                    kc, vc, ks, vs = caches
                    h_out, kc, vc, ks, vs = mega_decode_step_kv8(
                        h, mw, kc, vc, ks, vs, i, n_head=m.n_head,
                        head_dim=m.head_dim, has_lora=True,
                        act_dtype=jnp.float32, kv_bits=kvb)
                    caches = (kc, vc, ks, vs)
                g = ip["ln_f"]["g"]
                b_ = ip["ln_f"]["b"]
                mean = jnp.mean(h_out, -1, keepdims=True)
                var = jnp.mean(jnp.square(h_out - mean), -1, keepdims=True)
                hn = g * (h_out - mean) * jax.lax.rsqrt(
                    var + m.layer_norm_epsilon) + b_
                if head_bits is not None:
                    logits = _lm_head(ip, hn[:, None, :])[:, 0]
                else:
                    logits = jnp.dot(hn, ip["wte"].T.astype(hn.dtype),
                                     preferred_element_type=jnp.float32)
                return caches, logits

            if kvb == 16:
                caches = (jnp.zeros((m.n_layer, B, Tc, m.n_embd),
                                    jnp.float32),
                          jnp.zeros((m.n_layer, B, Tc, m.n_embd),
                                    jnp.float32))
            else:
                caches = (jnp.zeros((m.n_layer, B, Tc, dc), jnp.int8),
                          jnp.zeros((m.n_layer, B, Tc, dc), jnp.int8),
                          jnp.ones((m.n_layer, Tc, 128), jnp.float32),
                          jnp.ones((m.n_layer, Tc, 128), jnp.float32))
            _, logits = jax.lax.scan(body, caches, jnp.arange(T))
            return jnp.transpose(logits, (1, 0, 2))  # (B, T, V)

        return ppl_from_logits(run(jnp.asarray(held)), held)

    results = {
        "fq_fp32": round(fq_ppl(32), 3),
        "fq_int8": round(fq_ppl(8), 3),
        "fq_int4": round(fq_ppl(4), 3),
        "W8A8KV16": round(mega_ppl(8, "int8_xla", 16), 3),
        "W8A8KV8": round(mega_ppl(8, "int8_xla", 8), 3),
        "W8A8KV4": round(mega_ppl(8, "int8_xla", 4), 3),
        "W4A8KV8": round(mega_ppl(4, "int4_xla", 8), 3),
        "W4A8KV4": round(mega_ppl(4, "int4_xla", 4), 3),
        # r5 decode-diet head quantization: PPL cost of the int8/int4
        # vocab projection on the headline config
        "W4A8KV4_head8": round(mega_ppl(4, "int4_xla", 4, head_bits=8), 3),
        "W4A8KV4_head4": round(mega_ppl(4, "int4_xla", 4, head_bits=4), 3),
    }
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(results, indent=2))
    print("| config | PPL |\n|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v} |")
    return results


if __name__ == "__main__":
    main()
