"""Context-parallel SP forward: sequence axis sharded over the mesh.

Long-context inference/eval past a single chip's HBM (SURVEY.md §5: the
reference handles long documents only by host-side sliding windows). The
sequence axis of activations shards over a mesh axis; every position-wise
piece of the SP model (LN, quantized linears, LoRA, embeddings) shards
trivially under GSPMD, and attention — the only cross-position op — runs as
`ring_attention` (shard_map + ppermute K/V rotation, exact causal numerics).

Position embeddings need *global* positions, which GSPMD handles because the
`wpe[:T]` slice is computed from the global shape before sharding applies.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import SPModelConfig
from ..models.sp_model import PrecTables, prec_tables, sp_forward
from .ring_attention import ring_attention


def sp_forward_context_parallel(params, input_ids, prec, cfg: SPModelConfig,
                                mesh: Mesh, axis_name: str = "data", *,
                                tables: Optional[PrecTables] = None,
                                labels=None):
    """SP forward with sequence sharded over `axis_name`.

    `input_ids` (B, T) with T divisible by the axis size. Returns the usual
    sp_forward output dict; logits come back sharded over the sequence axis
    (gather with `jax.device_get` or keep sharded for sharded loss).
    """
    if tables is None:
        tables = prec_tables(cfg.quant)

    attention_fn = partial(ring_attention, mesh=mesh, axis_name=axis_name)

    seq_sharding = NamedSharding(mesh, P(None, axis_name))
    ids = jax.device_put(jnp.asarray(input_ids), seq_sharding)

    @jax.jit
    def fwd(params, ids, prec):
        return sp_forward(
            params, ids, prec, cfg, tables=tables, labels=labels,
            attention_fn=attention_fn,
        )

    return fwd(params, ids, jnp.asarray(prec, jnp.int32))
