"""Parity phases (b)/(d) at scales that can discriminate (VERDICT r4 #5).

The r4 parity battery ran on the byte-level i.i.d.-words harness, which a
d=128/4-layer model SATURATES — so the two reference phenomena that
depend on student capacity (all-layers-vs-random feature distillation,
`Report…md:80-87`) and precision-boundary overfitting (RPI defense,
`Report…md:178-183`) could not express. This sweep re-runs both phases on
the order-2 Markov task (`synthetic_markov_corpus`: 16k contexts x 8
successors over a 128-word vocabulary — capacity-bound by construction)
at three model sizes, reporting the phenomenon at each size plus the
scale TREND the verdict asked for.

Run: python scripts/parity_scale.py [b d] (TPU; ~20-30 min)
Results -> outputs/parity_scale.json
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from parity_battery import Harness, phase_b, phase_d  # noqa: E402

OUT = Path("outputs/parity_scale.json")
SIZES = ((128, 4, 6000, 1e-3), (256, 8, 8000, 7e-4),
         (512, 8, 10000, 5e-4))  # (d, L, base_iters, lr)


def main(argv):
    which = [p for p in argv if p in ("b", "d")] or ["b", "d"]
    results = {}
    if OUT.exists():
        results = json.loads(OUT.read_text())
    for d, L, iters, lr in SIZES:
        key = f"d{d}_L{L}"
        print(f"\n==== scale {key} ====", flush=True)
        t0 = time.time()
        h = Harness(base_iters=iters, d=d, n_layer=L, corpus="markov",
                    base_lr=lr)
        sub = results.setdefault(key, {})
        if "b" in which:
            phase_b(h, sub)
        if "d" in which:
            phase_d(h, sub)
        OUT.parent.mkdir(parents=True, exist_ok=True)
        OUT.write_text(json.dumps(results, indent=2))
        print(f"[{key}] done in {time.time()-t0:.0f}s", flush=True)

    # scale-trend summary
    print("\n| size | random-layer PPL | all-layers PPL | best RPI recovery |")
    print("|---|---|---|---|")
    for d, L, *_ in SIZES:
        sub = results.get(f"d{d}_L{L}", {})
        b = sub.get("b_distill_ablation", {})
        dd = sub.get("d_rpi_defense", {})
        byp = dd.get("by_probability", {})
        best = max((v.get("recovery_ratio", float("nan"))
                    for k, v in byp.items() if k != "0.0"),
                   default=float("nan"))
        print(f"| d{d}/L{L} | {b.get('random_layer')} | "
              f"{b.get('all_layers')} | {best:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1:])
