"""Profiling and roofline accounting utilities.

The reference has NO profiling infrastructure (SURVEY.md §5: tqdm postfix +
`torch.cuda.memory_allocated()` prints only). This module supplies the
TPU-native replacement: `jax.profiler` trace capture, simple step timing, and
roofline estimates for the quantized matmul path (needed for the
tokens/s/chip north star in BASELINE.json).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a block (view with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._count = 0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")


# v5e (v5 lite) per-chip peak numbers (public spec)
V5E_PEAK_BF16_FLOPS = 394e12  # 394 TFLOP/s bf16
V5E_HBM_BW = 819e9  # 819 GB/s


@dataclass
class RooflineEstimate:
    flops: float
    bytes: float
    compute_time_s: float
    memory_time_s: float
    bound: str

    @property
    def time_s(self) -> float:
        return max(self.compute_time_s, self.memory_time_s)


def matmul_roofline(m: int, k: int, n: int, weight_bits: int = 8,
                    act_bytes: int = 2, peak_flops: float = V5E_PEAK_BF16_FLOPS,
                    hbm_bw: float = V5E_HBM_BW) -> RooflineEstimate:
    """Roofline estimate for one x(M,K) @ Wq(K,N) with packed weights."""
    flops = 2.0 * m * k * n
    w_bytes = k * n * weight_bits / 8.0
    a_bytes = (m * k + m * n) * act_bytes
    total_bytes = w_bytes + a_bytes
    ct = flops / peak_flops
    mt = total_bytes / hbm_bw
    return RooflineEstimate(
        flops=flops, bytes=total_bytes, compute_time_s=ct, memory_time_s=mt,
        bound="memory" if mt > ct else "compute",
    )


def gpt2_decode_roofline(batch: int, n_layer: int = 12, d: int = 768,
                         vocab: int = 50257, weight_bits: int = 8,
                         context: int = 192) -> Dict:
    """Tokens/s/chip upper bound for GPT-2 decode at the given weight width.

    Per token per layer: qkv (d,3d), proj (d,d), fc (d,4d), proj (4d,d) →
    12·d² MACs/layer; plus lm_head d·V; plus KV-cache reads 2·L·ctx·d·2B.
    """
    per_layer = matmul_roofline(batch, d, 3 * d, weight_bits).time_s \
        + matmul_roofline(batch, d, d, weight_bits).time_s \
        + matmul_roofline(batch, d, 4 * d, weight_bits).time_s \
        + matmul_roofline(batch, 4 * d, d, weight_bits).time_s
    head = matmul_roofline(batch, d, vocab, 16).time_s  # head stays bf16
    kv_bytes = 2 * n_layer * context * d * 2 * batch
    kv_time = kv_bytes / V5E_HBM_BW
    step_time = n_layer * per_layer + head + kv_time
    return {
        "step_time_us": step_time * 1e6,
        "tokens_per_sec": batch / step_time,
        "tokens_per_sec_per_seq": 1.0 / step_time,
    }
