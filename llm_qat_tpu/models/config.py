"""Model / quantization configuration for the TPU-native QAT framework.

Replaces the reference's config classes
(`part1_switchable_precision/config_sp.py:1-65`,
`part2_cyclic_precision_training/config_cpt.py`,
`part5_squad/config_squad.py`) with frozen dataclasses plus *static precision
tables*: every bank-indexed quantity (num_bits, quantizer kind, LoRA scaling)
is precomputed into small numpy arrays so that at runtime the active precision
is a single traced index into stacked parameter banks — no recompilation on
`set_precision`, unlike the reference's ModuleDict key switching
(`part1_switchable_precision/lora.py:105-121`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from ..quant.functional import KIND_LOG, KIND_MINMAX


def default_quantizer_kind(bits: int) -> str:
    """Reference default: minmax for <=4 bits, log for 5..16, none at 32.

    (`config_sp.py:14-30`; validated by the ablation in BASELINE.md showing
    minmax better <=4 bits and log better >=5 bits.)
    """
    if bits >= 32:
        return "none"
    return "minmax" if bits <= 4 else "log"


@dataclass(frozen=True)
class GPT2Config:
    """GPT-2 124M architecture (reference `config_sp.py:2-10`)."""

    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5
    embd_pdrop: float = 0.1

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head


@dataclass(frozen=True)
class QuantConfig:
    """Switchable-precision quantization configuration.

    `bit_widths` lists every selectable precision (students + 32-bit teacher,
    reference `config_sp.py:33-35`). Per-bit LoRA rank/alpha mirror
    `config_sp.py:36-37`; `quantizer_per_bit` overrides the minmax/log default.
    `per_channel` selects per-channel (training) vs per-tensor (the reference
    forces per-tensor at eval load, `part3_eval_sp/main_sp_eval.py:60`).
    """

    bit_widths: Tuple[int, ...] = (7, 32)
    lora_rank_per_bit: Dict[int, int] = field(
        default_factory=lambda: {b: 64 for b in range(3, 17)} | {32: 0}
    )
    lora_alpha_per_bit: Dict[int, int] = field(
        default_factory=lambda: {b: 64 for b in range(3, 17)} | {32: 0}
    )
    quantizer_per_bit: Dict[int, str] = field(default_factory=dict)
    per_channel: bool = True
    symmetric: bool = True
    eps: float = 1e-5

    def __post_init__(self):
        object.__setattr__(self, "bit_widths", tuple(sorted(self.bit_widths)))

    def __hash__(self):
        # dict fields break the dataclass-generated hash; configs are used as
        # static jit arguments, so hash a stable tuple form instead.
        return hash((
            self.bit_widths,
            tuple(sorted(self.lora_rank_per_bit.items())),
            tuple(sorted(self.lora_alpha_per_bit.items())),
            tuple(sorted(self.quantizer_per_bit.items())),
            self.per_channel,
            self.symmetric,
            self.eps,
        ))

    # -- static precision tables -------------------------------------------

    @property
    def n_prec(self) -> int:
        return len(self.bit_widths)

    @property
    def teacher_bits(self) -> int:
        return max(self.bit_widths)

    @property
    def student_bits(self) -> Tuple[int, ...]:
        return tuple(b for b in self.bit_widths if b < 32)

    def kind_name(self, bits: int) -> str:
        return self.quantizer_per_bit.get(bits, default_quantizer_kind(bits))

    def prec_index(self, bits: int) -> int:
        """Static bits → bank index (host-side)."""
        return self.bit_widths.index(bits)

    def bits_table(self) -> np.ndarray:
        """float32[n_prec] of bit-widths (traced indexable)."""
        return np.asarray(self.bit_widths, np.float32)

    def kind_table(self) -> np.ndarray:
        """int32[n_prec]: KIND_MINMAX/KIND_LOG per precision (none→minmax; the
        >=32 passthrough in `fake_quant` makes the kind irrelevant there)."""
        return np.asarray(
            [
                KIND_LOG if self.kind_name(b) == "log" else KIND_MINMAX
                for b in self.bit_widths
            ],
            np.int32,
        )

    def rank_table(self) -> np.ndarray:
        return np.asarray(
            [self.lora_rank_per_bit.get(b, 0) for b in self.bit_widths], np.int32
        )

    def scaling_table(self) -> np.ndarray:
        """float32[n_prec]: LoRA alpha/rank per precision, 0 when disabled
        (reference `lora.py:23-33`)."""
        out = []
        for b in self.bit_widths:
            r = self.lora_rank_per_bit.get(b, 0)
            a = self.lora_alpha_per_bit.get(b, 0)
            out.append(0.0 if (b >= 32 or r <= 0) else a / r)
        return np.asarray(out, np.float32)

    @property
    def max_rank(self) -> int:
        """Stacked LoRA banks use one rank (max over bits); entries whose
        configured rank is 0 (the 32-bit slot) hold zeros with scaling 0."""
        return max([self.lora_rank_per_bit.get(b, 0) for b in self.bit_widths] + [0])


@dataclass(frozen=True)
class SPModelConfig:
    """Full switchable-precision model configuration (part1/part5 flavor)."""

    model: GPT2Config = field(default_factory=GPT2Config)
    quant: QuantConfig = field(default_factory=QuantConfig)
    compute_dtype: str = "float32"  # "bfloat16" on TPU for matmul inputs
    # "auto": on TPU, the Pallas flash kernel when the shape allows (no
    # mask, T % 128 == 0, head_dim 64/128) AND T >= ops.attention.FLASH_MIN_T
    # — honest in-jit timing (scripts/attn_bench.py, r4) shows the dense
    # T×T path is faster below T=1024 (per-program kernel overhead dominates
    # flash's bandwidth savings at GPT-2 sizes); dense elsewhere.
    # "dense"/"flash" force.
    attention_impl: str = "auto"
    # Quantized-linear implementation for `sp_linear`:
    #   "cond"  — fake_quant with lax.cond/lax.switch dispatch (the original
    #             formulation; one branch executes, but conditionals fence
    #             XLA fusion),
    #   "flat"  — conditional-free select-based fake_quant
    #             (`quant.functional.fake_quant_flat`), identical semantics,
    #   "fused" — Pallas fused dequant+matmul+LoRA kernel with custom-vjp STE
    #             (`ops.fused_linear`), TPU only,
    #   "auto"  — fused on TPU, flat elsewhere.
    linear_impl: str = "auto"
    # Unroll factor for the scan-over-layers (1 = rolled). Unrolling turns
    # per-layer dynamic-slice/DUS parameter access into static slices XLA
    # can fuse; the r4 trace showed the rolled scan spends more time on
    # slice/DUS/copy plumbing than on matmuls.
    scan_unroll: int = 1

    def replace(self, **kw) -> "SPModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class CPTConfig:
    """Cyclic-precision-training configuration (reference `config_cpt.py`)."""

    model: GPT2Config = field(default_factory=GPT2Config)
    bit_widths: Tuple[int, ...] = tuple(range(2, 19)) + (32,)
    lora_rank: int = 16
    lora_alpha: int = 32
    gradient_bits: int = 8
    target_bits: int = 5
    quantizer_kind: str = "log"  # reference: all-log quantizers (config_cpt.py:14-18)
    per_channel: bool = True
    symmetric: bool = True
    eps: float = 1e-5
    schedule_type: str = "cosine"
    total_epochs: int = 150
    total_cycles: int = 15
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class TrainConfig:
    """SP training hyperparameters (reference `config_sp.py:42-65`)."""

    batch_size: int = 32
    max_seq_length: int = 256
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    adam_epsilon: float = 1e-8
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    max_grad_norm: float = 1.0
    num_iterations: int = 550
    gradient_accumulation_steps: int = 8
    eval_interval: int = 50
    distill_alpha_kl: float = 1.0
    distill_alpha_feature: float = 1e-7
    distill_temperature: float = 3.0
    distill_accumulative: bool = False  # random-layer (False) vs all-layers feature loss
    # The reference collects hidden states with .clone().detach() for BOTH
    # teacher and student (models_sp.py:322,331), so its feature loss
    # carries NO gradient — the faithful default. True lets the feature
    # term train the student (what the reference report's all-layers-vs-
    # random ablation numbers imply; exercised by scripts/parity_scale.py).
    distill_feature_grad: bool = False
    # dtype of the cached teacher softmax probs shared by all student
    # micro-steps. "bfloat16" halves the per-student (B,T,V) read traffic
    # (~1.9 ms/step on v5e) but rounds p_t so sum(p_t) != 1 and the KL
    # gradient no longer vanishes exactly at p_s == p_t (~0.4% relative).
    # Default is the exact reference formula; perf benches opt into
    # bfloat16 explicitly (scripts/train_bench.py).
    distill_cache_dtype: str = "float32"
    # Unroll the student micro-step loop (a python loop instead of
    # lax.scan). Measured on v5e (scripts/train_bench.py, r4): the unrolled
    # form is ~20 ms/step SLOWER than the scan (XLA schedules the 3x larger
    # subgraph worse than it pays for the removed carry copies) — keep the
    # scan by default.
    unroll_students: bool = False
    # How the student micro-steps execute inside the jitted train step:
    #   "scan"   — lax.scan over students, grad-tree carry adds (r3/r4)
    #   "unroll" — python loop (== unroll_students=True; kept for A/B)
    #   "vmap"   — ONE batched fwd+bwd over all students: precision/rng/
    #              layer become a leading (n_students,) axis, every matmul
    #              turns into one batched MXU dot, and the per-student
    #              grad accumulation happens INSIDE the backward weight
    #              contractions (the vmapped axis sums in the dW dots)
    #              instead of as scan carry adds — attacking the r4 trace's
    #              ~11 ms of accumulation adds/DUS + the 3x op count
    #              (docs/RESULTS_R4.md "op-count IS the cost").
    # None -> "unroll" if unroll_students else "scan".
    student_mode: Optional[str] = None
    calibration_batches: int = 10  # reference CalibrationManager (`train_sp.py:90-123`)


def tiny_test_config(n_prec_bits=(4, 32)) -> SPModelConfig:
    """Small config for CPU tests (mirrors reference tests' n_layer=2 models,
    `part5_squad/tests/test_model.py:55-61`)."""
    return SPModelConfig(
        model=GPT2Config(
            vocab_size=256, n_positions=64, n_embd=32, n_layer=2, n_head=2
        ),
        quant=QuantConfig(
            bit_widths=tuple(n_prec_bits),
            lora_rank_per_bit={b: 4 for b in range(2, 17)} | {32: 0},
            lora_alpha_per_bit={b: 8 for b in range(2, 17)} | {32: 0},
        ),
    )
