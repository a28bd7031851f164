"""Deployment: checkpoints, per-bit exports, true-INT8 packing."""

from .checkpoint import (
    export_int8,
    load_checkpoint,
    save_checkpoint,
    save_per_bit_checkpoints,
)

__all__ = [
    "export_int8",
    "load_checkpoint",
    "save_checkpoint",
    "save_per_bit_checkpoints",
]
