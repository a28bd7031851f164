"""Elastic training checkpoints: async saves + preemption restore.

The reference's only resilience is a 3-retry synchronous save
(`part1_switchable_precision/deploy.py:154-177`) and a `--checkpoint` flag
that is parsed but never consumed (`main_sp.py:146-148`) — there is no
mid-training resume and a preempted run loses everything (SURVEY.md §5
"Failure detection / elastic recovery: absent"). TPU pods ARE preemptible,
so the TPU build treats elasticity as first-class:

- `AsyncCheckpointManager.save(step, state)` snapshots the pytree to host
  memory synchronously (one `jax.device_get` — cheap next to a train step)
  and hands the disk write (npz + verify, `deploy/checkpoint.py` format) to
  a background thread: training resumes immediately, save bandwidth
  overlaps the next steps — the same split Orbax's async checkpointer
  makes, without taking a dependency on its API churn.
- Writes are atomic (tmp file + `os.replace`) so a preemption mid-write
  never corrupts the latest checkpoint; `keep` bounds disk usage.
- `restore_latest()` scans the directory for the newest complete step —
  the preemption-restart flow: the relaunched job calls it and continues
  from wherever the last completed save was.

Optimizer state and step counter ride along with the params (any pytree of
arrays round-trips), so resume is exact, not params-only.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np



_STEP_RE = re.compile(r"^step_(\d+)\.npz$")


def _atomic_savez(path: Path, flat: Dict[str, np.ndarray], meta: Dict,
                  max_retries: int = 3):
    tmp = path.with_suffix(".tmp.npz")
    for attempt in range(max_retries):
        try:
            np.savez(tmp, __meta__=json.dumps(meta), **flat)
            loaded = np.load(tmp, allow_pickle=False)
            for k, v in flat.items():
                if not np.array_equal(loaded[k], v):
                    raise IOError(f"verify failed for {k}")
            loaded.close()
            os.replace(tmp, path)  # atomic: readers never see partial files
            return
        except Exception:
            if attempt == max_retries - 1:
                raise
            time.sleep(0.1)


class AsyncCheckpointManager:
    """Step-numbered async checkpoints with preemption restore.

    Usage:
        mgr = AsyncCheckpointManager(out_dir, keep=3)
        restored = mgr.restore_latest(init_state)   # None on a fresh start
        ...
        if step % save_every == 0:
            mgr.save(step, {"params": params, "opt_state": opt_state})
        mgr.wait()                          # join pending writes at exit
    """

    def __init__(self, directory, keep: int = 3):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep = keep
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    # -- saving -----------------------------------------------------------
    def save(self, step: int, state: Any, meta: Optional[Dict] = None):
        """Snapshot `state` (any pytree of arrays) and save asynchronously.

        Blocks only for the previous pending write (at most one in flight —
        bounds host memory at one snapshot) and the device→host transfer.
        """
        self.wait()
        host_state = jax.device_get(state)
        # generic pytree serialization (params dicts AND optax states):
        # leaves by index, structure restored from a live template
        leaves = jax.tree_util.tree_leaves(host_state)
        flat = {f"leaf_{i:05d}": np.asarray(v) for i, v in enumerate(leaves)}
        m = {"step": int(step), "timestamp": time.time(),
             "n_leaves": len(leaves), "extra": meta or {}}
        path = self.dir / f"step_{int(step):010d}.npz"

        def work():
            try:
                _atomic_savez(path, flat, m)
                self._gc()
            except BaseException as e:  # surfaced on next wait()/save()
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self):
        """Join the in-flight write; re-raise any background failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def _gc(self):
        steps = sorted(self._steps())
        for s in steps[: -self.keep] if self.keep > 0 else []:
            try:
                (self.dir / f"step_{s:010d}.npz").unlink()
            except OSError:
                pass

    # -- restoring --------------------------------------------------------
    def _steps(self):
        out = []
        for p in self.dir.iterdir():
            match = _STEP_RE.match(p.name)
            if match:
                out.append(int(match.group(1)))
        return out

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return max(steps) if steps else None

    def restore_latest(self, template: Any
                       ) -> Optional[Tuple[int, Any, Dict]]:
        """(step, state, meta) of the newest complete checkpoint, or None.

        `template` is a live pytree with the target structure (e.g. a
        freshly-initialized train state) — leaves are restored into it by
        flattening order. Corrupt files (a crash can leave a torn tmp,
        never a torn step file — but disks lie) are skipped with a warning,
        falling back to the next-newest: the preemption-restart flow must
        come up with *some* valid state whenever one exists.
        """
        treedef = jax.tree_util.tree_structure(template)
        for s in sorted(self._steps(), reverse=True):
            path = self.dir / f"step_{s:010d}.npz"
            try:
                data = np.load(path, allow_pickle=False)
                meta = json.loads(str(data["__meta__"]))
                n = meta["n_leaves"]
                if n != treedef.num_leaves:
                    raise ValueError(
                        f"checkpoint has {n} leaves, template has "
                        f"{treedef.num_leaves}")
                leaves = [data[f"leaf_{i:05d}"] for i in range(n)]
                return s, jax.tree_util.tree_unflatten(treedef, leaves), meta
            except Exception as e:
                print(f"WARNING: skipping corrupt checkpoint {path}: {e}")
                continue
        return None
