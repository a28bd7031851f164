"""Device mesh and sharding rules for multi-chip SP training/inference.

The reference has NO distributed layer at all (SURVEY.md §2.8: no
torch.distributed/NCCL anywhere; every entry point pins one CUDA device,
`main_sp.py:150-153`). This module is the first-class TPU replacement: a
(`data`, `model`) `jax.sharding.Mesh`, tensor-parallel PartitionSpecs for
every SP parameter bank, and batch sharding over the data axis. XLA GSPMD
inserts the collectives (all-gather/psum over ICI) from these annotations.

TP layout (Megatron-style, adapted to the quantized banks):
- c_attn / c_fc: column-parallel — weight (L, in, out) shards `out` on
  "model"; bias and LoRA B shard `out`; LoRA A replicated. Crucially the
  per-channel weight-quantizer scale bank (L, P, out) shards its channel axis
  *with* the weight's out axis (SURVEY.md §7 "hard parts": scale tables must
  shard on the same axis as their weight channel dimension).
- attn_proj / mlp_proj: row-parallel — weight shards `in` on "model" (the
  contraction inserts a psum); per-channel *input*-quantizer scale (L, P, in)
  shards with the input axis; LoRA A shards `in`, LoRA B replicated.
- embeddings: wte shards vocab on "model" (logits matmul becomes
  vocab-parallel); wpe + LN banks replicated.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: Optional[int] = None,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults: all devices on the model axis if n_model divides the count,
    else all on data. For a single device both axes are 1 (specs become
    no-ops, so the same code path runs everywhere).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None and n_model is None:
        n_model = 1
        n_data = n
    elif n_data is None:
        n_data = n // n_model
    elif n_model is None:
        n_model = n // n_data
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Column-parallel linears shard the out axis; row-parallel shard the in axis.
_COL_LINEAR = {"c_attn", "c_fc"}
_ROW_LINEAR = {"attn_proj", "mlp_proj"}


def _linear_spec(linear_name: str, leaf_name: str, per_channel: bool) -> P:
    col = linear_name in _COL_LINEAR
    if leaf_name == "w":  # (L, in, out)
        return P(None, None, "model") if col else P(None, "model", None)
    if leaf_name == "b":  # (L, out)
        return P(None, "model") if col else P(None)
    if leaf_name in ("wq_scale", "wq_zp"):  # (L, P, out-ch) or (L, P, 1)
        if per_channel and col:
            return P(None, None, "model")
        return P(None)
    if leaf_name in ("iq_scale", "iq_zp"):  # (L, P, in-ch) or (L, P, 1)
        if per_channel and not col:
            return P(None, None, "model")
        return P(None)
    if leaf_name == "lora_A":  # (L, P, in, r)
        return P(None) if col else P(None, None, "model", None)
    if leaf_name == "lora_B":  # (L, P, r, out)
        return P(None, None, None, "model") if col else P(None)
    return P(None)


def sp_param_specs(params, per_channel: bool = True) -> Any:
    """PartitionSpec pytree matching an SP params pytree."""

    def f(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys[0] == "wte":
            return P("model", None)
        if keys[0] == "wpe":
            return P(None)
        if keys[0] == "ln_f" or (len(keys) >= 2 and keys[1] in ("ln1", "ln2")):
            return P(None)
        if keys[0] == "blocks" and len(keys) >= 3:
            return _linear_spec(keys[1], keys[2], per_channel)
        return P(None)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh: Mesh, per_channel: bool = True):
    """Place params on the mesh with TP shardings."""
    specs = sp_param_specs(params, per_channel)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings), shardings


def _infer_linear_spec(linear_name: str, leaf_name: str) -> P:
    """Specs for one linear of the INFERENCE tree (`quantize_for_inference`):
    same Megatron layout as `_linear_spec`, adapted to the serving leaves
    (int8 codes + per-out-channel scales, factored/folded LoRA, static
    activation scales)."""
    col = linear_name in _COL_LINEAR
    if leaf_name in ("w_q", "w_i8", "w_int8", "lora_AB"):  # (L, in, out)
        return P(None, None, "model") if col else P(None, "model", None)
    if leaf_name == "b":  # (L, out)
        return P(None, "model") if col else P(None)
    if leaf_name == "w_s":  # (L, out) per-channel or (L,)/(L, 1) per-tensor
        return P(None, "model") if col else P(None)
    if leaf_name in ("iq_scale", "iq_zp"):  # (L, in) or (L,)
        return P(None, "model") if not col else P(None)
    if leaf_name == "lora_A":  # (L, in, r)
        return P(None) if col else P(None, "model", None)
    if leaf_name == "lora_B":  # (L, r, out)
        return P(None, None, "model") if col else P(None)
    return P(None)  # x_s and other scalars replicated


def infer_param_specs(iparams, per_channel: bool = True) -> Any:
    """PartitionSpec pytree for a `quantize_for_inference` tree (TP decode).

    The reference cannot serve multi-GPU at all (SURVEY.md §2.8); here the
    pre-quantized serving weights shard exactly like the training banks —
    int8 codes column/row-parallel with their scale vectors on the same
    channel axis — and GSPMD inserts the psum after each row-parallel
    projection. Per-tensor leaves ((L,)/(L, 1) scales) stay replicated.
    """

    def f(path, leaf):
        keys = [p.key for p in path if hasattr(p, "key")]
        if np.ndim(leaf) == 0:  # _bits/_kind scalars
            return P()
        if keys[0] in ("wte", "head_i8"):  # (V, d): vocab-parallel head
            return P("model", None)
        if keys[0] == "head_s":  # (V,)
            return P("model")
        if keys[0] == "blocks" and len(keys) >= 3:
            spec = _infer_linear_spec(keys[1], keys[2])
            # per-tensor scale/zp vectors are 1-D/(L,1): drop the channel
            # sharding the per-channel layout would use
            if len(spec) > np.ndim(leaf) or (
                    np.ndim(leaf) >= 2 and leaf.shape[-1] == 1):
                return P(None)
            return spec
        return P(None)

    return jax.tree_util.tree_map_with_path(f, iparams)


def shard_infer_params(iparams, mesh: Mesh, per_channel: bool = True):
    """Place a serving tree on the mesh with TP shardings."""
    specs = infer_param_specs(iparams, per_channel)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(iparams, shardings), shardings


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV caches (B, H, T, D) — or packed (B, H, T/P, P·D) — shard batch
    over "data" and heads over "model" (each chip holds its heads' cache;
    attention is fully local, SURVEY.md §2.8 'KV cache tensor-sharded')."""
    return NamedSharding(mesh, P("data", "model", None, None))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input batch (B, T) shards over the data axis."""
    return NamedSharding(mesh, P("data", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
