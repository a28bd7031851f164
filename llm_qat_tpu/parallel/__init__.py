"""Multi-chip parallelism: mesh construction and TP/DP sharding rules."""

from .mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    shard_params,
    sp_param_specs,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_params",
    "sp_param_specs",
]
