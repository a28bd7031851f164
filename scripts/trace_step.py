"""Capture a jax.profiler trace of the SP train step and print top ops.

Parses the xspace with jax.profiler.ProfileData (no TensorBoard needed) and
aggregates device-plane event durations by op name, so the train-step cost
decomposition is grounded in the actual XLA schedule instead of ablation
guesswork (scripts/train_bench.py showed ablations are confounded).

Usage: python scripts/trace_step.py [mode]   mode in {step, fwd}
"""
import glob
import gzip
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import (
    GPT2Config, QuantConfig, SPModelConfig, TrainConfig, init_sp_params,
    prec_tables, sp_forward,
)
from llm_qat_tpu.train import CalibrationManager
from llm_qat_tpu.train.sp_trainer import make_sp_train_step

B, T = 8, 256
MODE = sys.argv[1] if len(sys.argv) > 1 else "step"


def build(attention_impl="auto"):
    cfg = SPModelConfig(
        model=GPT2Config(),
        quant=QuantConfig(
            bit_widths=(4, 8, 32),
            lora_rank_per_bit={b: 64 for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 128 for b in range(2, 17)} | {32: 0},
        ),
        compute_dtype="bfloat16",
        attention_impl=attention_impl,
    )
    params = init_sp_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, cfg.model.vocab_size, (B, T)))
    params = CalibrationManager(cfg, 1).calibrate_all_precisions(
        params, [batch[:2, :64]])
    return cfg, params, batch


def capture(fn):
    fn()  # compile
    logdir = "/tmp/jax-trace-step"
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    fn()
    jax.profiler.stop_trace()
    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    return files[0]


def opcode(name: str) -> str:
    """'%fusion.123 = f32[...] fusion(...), kind=kLoop ...' -> 'fusion.123'."""
    tok = name.split(" = ")[0].strip().lstrip("%")
    return tok


def summarize(path, top=40):
    with open(path, "rb") as f:
        data = f.read()
    pd = jax.profiler.ProfileData.from_serialized_xspace(data)
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"=== plane: {plane.name}")
        print("  lines:", [l.name for l in plane.lines])
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            events = list(line.events)
            # Ops nested inside a while appear alongside the while event
            # itself; drop enclosing control-flow events to avoid double
            # counting, then aggregate by SSA base name.
            agg = defaultdict(lambda: [0.0, 0])
            total = 0.0
            for ev in events:
                base = opcode(ev.name)
                if base.split(".")[0] in ("while", "conditional", "call"):
                    continue
                dur = ev.duration_ns / 1e6
                # collapse per-instance numbering but keep distinct op kinds
                kind = re.sub(r"\.\d+$", "", base)
                agg[kind][0] += dur
                agg[kind][1] += 1
                total += dur
            print(f"  leaf op time: {total:.2f} ms over {len(events)} events")
            for name, (dur, cnt) in sorted(
                    agg.items(), key=lambda kv: -kv[1][0])[:top]:
                print(f"  {dur:9.3f} ms  x{cnt:<6d} {name}")


if __name__ == "__main__":
    cfg, params, batch = build()
    if MODE == "step":
        tcfg = TrainConfig(batch_size=B, max_seq_length=T,
                           gradient_accumulation_steps=4, num_iterations=100,
                           eval_interval=10_000)
        init_state, train_step = make_sp_train_step(cfg, tcfg)
        state = init_state(params)
        step = jax.jit(train_step)

        def fn():
            s2, m = step(state, batch, jax.random.PRNGKey(1))
            float(m["loss"])
    else:
        tables = prec_tables(cfg.quant)

        @jax.jit
        def fwd(p, ids):
            return sp_forward(p, ids, jnp.int32(0), cfg, tables=tables,
                              labels=ids, output_hidden_states=True)["loss"]

        def fn():
            float(fwd(params, batch))

    path = capture(fn)
    print("xplane:", path)
    summarize(path)
