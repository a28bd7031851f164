"""True on-device SP train-step timing: N steps chained inside ONE jit.

Round-4 finding (scripts/flat_fq_check.py + tunnel probes): a device->host
scalar fetch through the axon tunnel costs ~25-30 ms, so any per-call timing
(including round-3's 182.6 ms train-step figure) carries that additive
artifact. Here the train step runs `inner` times under `lax.scan` inside one
jitted call (state-chained, so XLA cannot CSE the iterations), with a single
scalar fetch at the end; per-step time = (t_total - t_fetch_baseline) / inner.

Usage: python scripts/train_bench.py [inner=8] [reps=5]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import (
    GPT2Config, QuantConfig, SPModelConfig, TrainConfig, init_sp_params,
)
from llm_qat_tpu.train import CalibrationManager
from llm_qat_tpu.train.sp_trainer import make_sp_train_step

B, T = 8, 256
INNER = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def build(rank=64, attention_impl="auto", **cfg_kw):
    cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(
            bit_widths=(4, 8, 32),
            lora_rank_per_bit={b: rank for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 2 * rank for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="bfloat16",
        attention_impl=attention_impl,
        **cfg_kw,
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, T)))
    params = CalibrationManager(cfg, 1).calibrate_all_precisions(
        params, [batch[:2, :64]])
    return cfg, params, batch


def fetch_baseline():
    f = jax.jit(lambda x: x.sum())
    x = jnp.ones((8, 8))
    float(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_step(label, cfg, params, batch, fetch_ms, **tcfg_kw):
    tcfg = TrainConfig(batch_size=B, max_seq_length=T,
                       gradient_accumulation_steps=4, num_iterations=100,
                       eval_interval=10_000, **tcfg_kw)
    init_state, train_step = make_sp_train_step(cfg, tcfg)

    def run(state, batch, rng):
        def body(carry, i):
            state = carry
            state, m = train_step(state, batch,
                                  jax.random.fold_in(rng, i))
            return state, m["loss"]
        state, losses = jax.lax.scan(body, state, jnp.arange(INNER))
        return state, losses[-1]

    run_j = jax.jit(run, donate_argnums=(0,))
    state = init_state(jax.tree.map(jnp.array, params))
    t0 = time.perf_counter()
    state, loss = run_j(state, batch, jax.random.PRNGKey(1))
    float(loss)  # sync
    print(f"  [{label}] compile+first: {time.perf_counter()-t0:.0f}s",
          flush=True)
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        state, loss = run_j(state, batch, jax.random.PRNGKey(2 + i))
        lv = float(loss)
        ts.append(time.perf_counter() - t0)
    per = (np.median(ts) * 1e3 - fetch_ms) / INNER
    print(f"{label}: {per:.1f} ms/step on-device "
          f"(raw median {np.median(ts)*1e3:.1f} ms / {INNER} steps, "
          f"fetch {fetch_ms:.1f} ms, loss {lv:.3f})", flush=True)
    return per


VARIANTS = {
    "cond": dict(linear_impl="cond"),
    "flat": dict(linear_impl="flat"),
    "fused": dict(linear_impl="fused"),
    "cond-u12": dict(linear_impl="cond", scan_unroll=12),
    "flat-u2": dict(linear_impl="flat", scan_unroll=2),
    "flat-u4": dict(linear_impl="flat", scan_unroll=4),
    "flat-u12": dict(linear_impl="flat", scan_unroll=12),
    "fused-u12": dict(linear_impl="fused", scan_unroll=12),
    "fused-u12-dense": dict(linear_impl="fused", scan_unroll=12,
                            attention_impl="dense"),
    "cond-dense": dict(linear_impl="cond", attention_impl="dense"),
    "flat-u12-scan": dict(linear_impl="flat", scan_unroll=12,
                          tcfg_unroll_students=False),
    "flat-u12-scan-f32cache": dict(linear_impl="flat", scan_unroll=12,
                                   tcfg_unroll_students=False,
                                   tcfg_distill_cache_dtype="float32"),
    "flat-u12-scan-bf16cache": dict(linear_impl="flat", scan_unroll=12,
                                    tcfg_unroll_students=False,
                                    tcfg_distill_cache_dtype="bfloat16"),
    "flat-u12-dense": dict(linear_impl="flat", scan_unroll=12,
                           attention_impl="dense"),
    "flat-u12-scan-dense": dict(linear_impl="flat", scan_unroll=12,
                                attention_impl="dense",
                                tcfg_unroll_students=False),
    # r5: students batched into ONE vmapped fwd+bwd (grad accumulation
    # inside the backward contractions)
    "flat-u12-vmap-dense": dict(linear_impl="flat", scan_unroll=12,
                                attention_impl="dense",
                                tcfg_student_mode="vmap"),
    "flat-u12-vmap-dense-bf16c": dict(linear_impl="flat", scan_unroll=12,
                                      attention_impl="dense",
                                      tcfg_student_mode="vmap",
                                      tcfg_distill_cache_dtype="bfloat16"),
    "flat-u4-vmap-dense": dict(linear_impl="flat", scan_unroll=4,
                               attention_impl="dense",
                               tcfg_student_mode="vmap"),
    "flat-vmap-dense": dict(linear_impl="flat",
                            attention_impl="dense",
                            tcfg_student_mode="vmap"),
    # r5 unroll-granularity sweep (scan-level grad stacking vs per-layer
    # static-slice DUS chains trade off at intermediate unrolls)
    "flat-u1-scan-dense": dict(linear_impl="flat", scan_unroll=1,
                               attention_impl="dense"),
    "flat-u2-scan-dense": dict(linear_impl="flat", scan_unroll=2,
                               attention_impl="dense"),
    "flat-u3-scan-dense": dict(linear_impl="flat", scan_unroll=3,
                               attention_impl="dense"),
    "flat-u6-scan-dense": dict(linear_impl="flat", scan_unroll=6,
                               attention_impl="dense"),
}

if __name__ == "__main__":
    fetch_ms = fetch_baseline() * 1e3
    print(f"tunnel fetch baseline: {fetch_ms:.1f} ms", flush=True)
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else ["cond", "fused"]
    for name in names:
        ln_impl = "cvjp"
        if name.endswith("@lnauto"):
            name, ln_impl = name[:-len("@lnauto")], "autodiff"
        from llm_qat_tpu.models import sp_model as _spm

        _spm.LN_IMPL = ln_impl
        kw = dict(VARIANTS[name])
        attn = kw.pop("attention_impl", "auto")
        tkw = {k[5:]: v for k, v in kw.items() if k.startswith("tcfg_")}
        kw = {k: v for k, v in kw.items() if not k.startswith("tcfg_")}
        cfg, params, batch = build(attention_impl=attn, **kw)
        bench_step(f"step[{name}:ln={ln_impl}]", cfg, params, batch,
                   fetch_ms, **tkw)
