"""Checkpointing and deployment export.

Re-implements the reference deployment layer (SURVEY.md §2.6):
- per-bit SP checkpoint saver (`part1_switchable_precision/deploy.py:125-183`):
  one file per student bit-width with model/config dicts + the bit, with a
  3-retry save + reload-verify loop (`deploy.py:154-177`);
- true-INT8 exporter (`deploy.py:5-123`): re-quantize every linear's weights
  to int8 + scalar scale/zp (per-tensor), keep LoRA in float, report
  compression;
- CPT target-bit saver (`part2_cyclic_precision_training/deploy.py:8-104`)
  whose multi-bit scale tables serialize naturally here — our banks ARE
  arrays, so no custom `_scales_{bits}` key mangling is needed.

Format: numpy `.npz` with flattened pytree paths + a JSON sidecar for configs
(orbax is available, but npz keeps checkpoints dependency-light, portable,
and content-verifiable; every array round-trips exactly).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(val)
    return out


def _config_to_dict(cfg) -> Dict:
    if dataclasses.is_dataclass(cfg):
        return {
            k: _config_to_dict(v) if dataclasses.is_dataclass(v) else
            (dict(v) if isinstance(v, dict) else
             list(v) if isinstance(v, tuple) else v)
            for k, v in dataclasses.asdict(cfg).items()
        }
    return cfg


def save_checkpoint(path, params, config=None, bit_width: Optional[int] = None,
                    extra: Optional[Dict] = None, max_retries: int = 3) -> bool:
    """Save with retry + reload-verify (reference `deploy.py:154-177`)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(params)
    meta = {
        "bit_width": bit_width,
        "timestamp": time.time(),
        "config": _config_to_dict(config) if config is not None else None,
        "extra": extra or {},
    }
    for attempt in range(max_retries):
        try:
            np.savez(path, __meta__=json.dumps(meta), **flat)
            loaded = np.load(path if str(path).endswith(".npz")
                             else str(path) + ".npz", allow_pickle=False)
            for k, v in flat.items():
                if not np.array_equal(loaded[k], v):
                    raise IOError(f"verify failed for {k}")
            return True
        except Exception:
            if attempt == max_retries - 1:
                raise
            time.sleep(0.1)
    return False


def load_checkpoint(path) -> Tuple[Dict[str, Any], Dict]:
    """Returns (params, meta). Marks nothing calibrated — callers decide
    (the reference marks quantizers calibrated when scale+zp are present,
    `part1 quantization.py:73-75`; our banks carry their scales inline)."""
    p = str(path)
    if not p.endswith(".npz"):
        p = p + ".npz"
    data = np.load(p, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    flat = {k: data[k] for k in data.files if k != "__meta__"}
    return _unflatten(flat), meta


def save_per_bit_checkpoints(out_dir, params, cfg, prefix: str = "sp",
                             bits_list=None) -> Dict[int, str]:
    """One checkpoint per student bit (reference `deploy.py:125-183`).

    The reference re-saves the full state per bit after set_precision; our
    banks already contain every precision, so each file tags the target bit
    in metadata (the loader then pins that precision index).
    """
    out_dir = Path(out_dir)
    bits_list = bits_list or [b for b in cfg.quant.bit_widths if b < 32]
    paths = {}
    for bits in bits_list:
        p = out_dir / f"{prefix}_{bits}bit.npz"
        save_checkpoint(p, params, cfg, bit_width=bits)
        paths[bits] = str(p)
    return paths


def export_int8(params, cfg) -> Tuple[Dict[str, Any], Dict]:
    """True-INT8 export (reference `deploy.py:5-123`): per-tensor symmetric
    int8 weights + float scale; LoRA/LN stay float. Returns (export_tree,
    report) with the compression ratio vs fp32."""
    report = {"orig_bytes": 0, "int8_bytes": 0}

    def convert(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        arr = np.asarray(leaf)
        report["orig_bytes"] += arr.nbytes
        if keys[-1] == "w":
            abs_max = max(float(np.abs(arr).max()), 1e-8)
            scale = abs_max / 127.0
            q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
            report["int8_bytes"] += q.nbytes + 4
            return {"int8": q, "scale": np.float32(scale)}
        report["int8_bytes"] += arr.nbytes
        return arr

    tree = jax.tree_util.tree_map_with_path(convert, params)
    report["compression_ratio"] = report["orig_bytes"] / max(
        report["int8_bytes"], 1
    )
    return tree, report
