"""On-chip continuous-batching throughput (VERDICT r3 #6).

Measures mixed-request serving throughput of `ContinuousBatchingEngine`
in three configurations on the real chip:

  packed  — round-3 path (per-slot-position packed-KV XLA/Pallas mix)
  mega8   — round-4 megakernel CB path (kv_bits=8)
  mega4   — megakernel CB, int4 weights + kv_bits=4

Workload: 24 requests, prompt lengths cycling (16, 64, 128), 128 new
tokens each, 2 more requests than slots in flight (slot recycling), greedy.
Decode driven with step_chunk(k=64) to amortize the ~31 ms axon dispatch
latency. Reported tok/s counts GENERATED tokens / wall time from first
prefill to last finish (prefills included — this is end-to-end serving
throughput, unlike bench.py's decode-only single-stream number).

Run: python scripts/cb_bench.py [n_requests] [new_tokens]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from llm_qat_tpu.models import GPT2Config, QuantConfig, SPModelConfig, init_sp_params
from llm_qat_tpu.serving import ContinuousBatchingEngine
from llm_qat_tpu.train.calibration_manager import (
    calibrate_input_quantizers, calibrate_weight_quantizers)

N_REQ = int(sys.argv[1]) if len(sys.argv) > 1 else 24
NEW = int(sys.argv[2]) if len(sys.argv) > 2 else 128
SLOTS, MAXLEN, CHUNK = 8, 512, 64

cfg = SPModelConfig(
    model=GPT2Config(),
    quant=QuantConfig(bit_widths=(4, 8, 32), quantizer_per_bit={8: "minmax"},
                      per_channel=False),
    compute_dtype="bfloat16",
)
params = init_sp_params(jax.random.PRNGKey(0), cfg)
params = calibrate_weight_quantizers(params, cfg)
rng0 = np.random.default_rng(5)
params = calibrate_input_quantizers(
    params, cfg, [jnp.asarray(rng0.integers(0, 50257, (2, 64))) for _ in range(3)])
rng = np.random.default_rng(0)
prompts = [rng.integers(1, 50000, (n,))
           for n, _ in zip((16, 64, 128) * N_REQ, range(N_REQ))]


def run(label, **kw):
    kw.setdefault("lm_head_bits", 8)
    eng = ContinuousBatchingEngine(params, cfg, bits=kw.pop("bits", 8),
                                   n_slots=SLOTS, max_len=MAXLEN, **kw)
    # warm the compile caches with a dummy request round
    eng.submit(prompts[0], max_new_tokens=CHUNK + 2)
    eng.run_until_done(chunk=CHUNK)

    # (a) end-to-end serving throughput — through the axon tunnel this is
    # DISPATCH-latency bound (~31 ms/round trip x prefills + chunks), so it
    # measures the dev link, not the chip; reported for completeness
    t0 = time.perf_counter()
    ids = [eng.submit(p, max_new_tokens=NEW) for p in prompts]
    fin = eng.run_until_done(chunk=CHUNK)
    dt = time.perf_counter() - t0
    total = sum(len(fin[i].generated) for i in ids)
    assert all(len(fin[i].generated) == NEW for i in ids)

    # (b) steady-state decode rate: all slots active at mixed positions,
    # ONE chunked dispatch of BIG tokens — the chip-meaningful number
    # (comparable to bench.py's single-stream decode, which has uniform
    # positions and no per-slot sampling state)
    BIG = 64  # keeps max prefix under max_len across warm + 3 reps, so
    # every rep really runs BIG steps (step_chunk silently caps k to the
    # remaining cache room)
    for pr in prompts[:SLOTS]:
        eng.submit(pr, max_new_tokens=MAXLEN)  # long: stay active
    eng.step_chunk(8)   # fill slots + settle
    eng.step_chunk(BIG)  # warm the BIG-chunk executable
    reps, ts = 3, []
    for _ in range(reps):
        before = int(np.sum(eng.gen_counts))
        t1 = time.perf_counter()
        eng.step_chunk(BIG)
        ts.append(time.perf_counter() - t1)
        made = int(np.sum(eng.gen_counts)) - before
        assert made == SLOTS * BIG, (made, SLOTS * BIG)
    # One step_chunk call = one dispatch + one host sync, which through
    # the axon tunnel carries the fixed ~25-30 ms roundtrip (the r4
    # methodology artifact — scripts/_tunnel.py). r4's "11.4k steady-
    # state" number did NOT subtract it, overstating the CB-vs-single-
    # stream gap ~3x; report both.
    from _tunnel import fetch_baseline_s

    fetch = fetch_baseline_s()
    raw = float(np.median(ts))
    dchunk = max(raw - fetch, 1e-9)
    ss = SLOTS * BIG / dchunk
    print(f"{label}: e2e {total/dt:,.0f} tok/s ({dt:.2f}s, link-bound) | "
          f"steady-state decode {ss:,.0f} tok/s "
          f"({dchunk/BIG*1e6:.0f} us/step @B={SLOTS}; "
          f"raw-with-dispatch {SLOTS*BIG/raw:,.0f} tok/s, "
          f"fetch {fetch*1e3:.1f} ms)", flush=True)
    return ss


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "quick":
        run("mega  W4 KV4 (r4)  ", bits=4, weight_format="int4_xla",
            kv_layout="mega", kv_bits=4)
    elif len(sys.argv) > 3 and sys.argv[3] == "diet":
        run("mega  W4 KV4 head8 ", bits=4, weight_format="int4_xla",
            kv_layout="mega", kv_bits=4)
        run("mega  W4 KV4 head4 ", bits=4, weight_format="int4_xla",
            kv_layout="mega", kv_bits=4, lm_head_bits=4)
    else:
        run("packed (r3 path)   ", weight_format="int8_xla",
            kv_layout="packed")
        run("mega  W8 KV8 (r4)  ", weight_format="int8_xla",
            kv_layout="mega", kv_bits=8)
        run("mega  W4 KV4 (r4)  ", bits=4, weight_format="int4_xla",
            kv_layout="mega", kv_bits=4)
