"""Ring-attention context parallelism over a mesh axis.

The reference has no long-context machinery at all (SURVEY.md §5: dense
materialized T×T attention, max context 1024, sliding windows at the data
level). This module supplies the TPU-native context-parallel mechanism
promised in SURVEY.md §2.8: the sequence axis is sharded over a mesh axis,
each device holds a Q/K/V shard, and K/V shards rotate around the ring via
`lax.ppermute` while an online-softmax accumulator builds each query shard's
exact causal attention — HBM per device stays O(T/n), enabling sequence
lengths past a single chip's memory.

Pure `shard_map` + collectives (XLA schedules the permutes over ICI on real
hardware); numerics match the dense reference exactly (tested on the virtual
8-device CPU mesh against `ops.attention.causal_attention_reference`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _ring_attention_local(q, k, v, axis_name: str):
    """Per-device body: q,k,v are (B, H, T_local, D) sequence shards."""
    B, H, Tl, D = q.shape
    n_dev = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    scale = 1.0 / math.sqrt(D)

    qf = q.astype(jnp.float32) * scale

    # online softmax state (pvary: mark as device-varying so the scan carry
    # type matches the axis-varying updates under shard_map)
    m = jax.lax.pvary(jnp.full((B, H, Tl, 1), NEG_INF, jnp.float32), axis_name)
    l = jax.lax.pvary(jnp.zeros((B, H, Tl, 1), jnp.float32), axis_name)
    acc = jax.lax.pvary(jnp.zeros((B, H, Tl, D), jnp.float32), axis_name)

    # global positions of my queries
    q_pos = my_idx * Tl + jnp.arange(Tl)

    def step(carry, step_idx):
        m, l, acc, k_cur, v_cur = carry
        # K/V shard currently held came from device (my_idx - step_idx) % n
        src = (my_idx - step_idx) % n_dev
        k_pos = src * Tl + jnp.arange(Tl)

        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        causal = q_pos[:, None] >= k_pos[None, :]
        s = jnp.where(causal[None, None], s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32)

        # rotate K/V to the next device (ring over ICI)
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_new, l_new, acc_new, k_next, v_next), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m, l, acc, k, v), jnp.arange(n_dev))

    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, axis_name: str = "data"):
    """Causal attention with the sequence axis sharded over `axis_name`.

    q,k,v: (B, H, T, D) with T divisible by the axis size. Returns the same
    shape, numerically equal to dense causal attention.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
