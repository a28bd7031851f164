"""KV-cached autoregressive generation with `lax` control flow.

The reference `SPLMHeadModel.generate` (`models_sp.py:460-507`) recomputes the
FULL prefix attention for every generated token (O(T²) per token, no KV
cache) and runs a host-side python loop with temperature/top-k/top-p/EOS
handling. This module is the TPU-native replacement promised in SURVEY.md
§3.4: a preallocated KV cache updated with `lax.dynamic_update_slice`, a
single prefill pass, and a `lax.scan` decode loop — one compiled executable
for any prompt length up to the static maximum.

Sampling semantics match the reference:
- temperature scaling (`models_sp.py:473-475`)
- top-k filtering (keep k highest logits, others -inf)
- top-p nucleus filtering (`models_sp.py:477-486`: sort desc, drop tokens
  whose cumulative softmax prob exceeds p, always keep the first)
- greedy argmax when `do_sample=False`; early-stop bookkeeping on EOS
  (generation continues but tokens after EOS are replaced by pad/EOS).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import SPModelConfig
from .sp_model import (
    PrecTables,
    prec_tables,
    sp_linear,
    switchable_layernorm,
)


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, H, T_max, Dh)
    v: jax.Array  # (L, B, H, T_max, Dh)
    length: jax.Array  # () int32 — number of valid positions


def init_kv_cache(cfg: SPModelConfig, batch: int, max_len: int,
                  dtype=jnp.float32) -> KVCache:
    m = cfg.model
    shape = (m.n_layer, batch, m.n_head, max_len, m.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((), jnp.int32),
    )


def _block_with_cache(x, bp, prec, tables, cfg, k_cache, v_cache, start, t_len):
    """One transformer block over `x` (B, S, d) attending to cache[:start+S].

    Returns (out, new_k, new_v) where new_k/new_v are the S new positions'
    K/V (B, H, S, Dh) for the caller to insert into the cache.
    """
    m = cfg.model
    B, S, C = x.shape

    h = switchable_layernorm(x, bp["ln1"], prec, m.layer_norm_epsilon)
    qkv, _ = sp_linear(h, bp["c_attn"], prec, tables, cfg)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, m.n_head, m.head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)

    # full K/V = cache with the new entries written at [start, start+S)
    k_all = jax.lax.dynamic_update_slice(k_cache, k.astype(k_cache.dtype),
                                         (0, 0, start, 0))
    v_all = jax.lax.dynamic_update_slice(v_cache, v.astype(v_cache.dtype),
                                         (0, 0, start, 0))

    T_max = k_all.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(m.head_dim, jnp.float32))
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k_all,
                        preferred_element_type=jnp.float32) * scale
    # causal + validity mask: query position (start + s) attends to t <= it
    q_pos = start + jax.lax.broadcasted_iota(jnp.int32, (S, T_max), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (S, T_max), 1)
    valid = k_pos <= jnp.minimum(q_pos, start + t_len - 1)
    scores = jnp.where(valid[None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v_all.dtype)
    attn = jnp.einsum("bhst,bhtd->bhsd", probs, v_all)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, C)
    attn_out, _ = sp_linear(attn, bp["attn_proj"], prec, tables, cfg)
    x = x + attn_out

    h2 = switchable_layernorm(x, bp["ln2"], prec, m.layer_norm_epsilon)
    fc, _ = sp_linear(h2, bp["c_fc"], prec, tables, cfg)
    fc = jax.nn.gelu(fc, approximate=False)
    proj, _ = sp_linear(fc, bp["mlp_proj"], prec, tables, cfg)
    x = x + proj
    return x, k_all, v_all


def forward_with_cache(params, input_ids, prec, cfg: SPModelConfig,
                       cache: KVCache, tables: Optional[PrecTables] = None):
    """Forward `input_ids` (B, S) continuing from `cache.length` positions.

    Returns (logits (B, S, V), updated cache). Used both for prefill (S =
    prompt length) and decode (S = 1).
    """
    if tables is None:
        tables = prec_tables(cfg.quant)
    prec = jnp.asarray(prec, jnp.int32)
    B, S = input_ids.shape
    start = cache.length

    tok = params["wte"][input_ids]
    pos_ids = start + jnp.arange(S)
    pos = params["wpe"][pos_ids][None]
    h = tok + pos

    def body(carry, xs):
        x = carry
        bp, kc, vc = xs
        x, k_all, v_all = _block_with_cache(
            x, bp, prec, tables, cfg, kc, vc, start, jnp.asarray(S, jnp.int32)
        )
        return x, (k_all, v_all)

    h, (k_new, v_new) = jax.lax.scan(body, h, (params["blocks"], cache.k, cache.v))

    h = switchable_layernorm(h, params["ln_f"], prec, cfg.model.layer_norm_epsilon)
    logits = jnp.dot(h, params["wte"].T.astype(h.dtype),
                     preferred_element_type=jnp.float32)
    new_cache = KVCache(k=k_new, v=v_new, length=start + S)
    return logits, new_cache


def _filter_logits(logits, temperature, top_k, top_p):
    """Temperature / top-k / top-p filtering (reference `models_sp.py:473-486`)."""
    logits = logits / jnp.maximum(temperature, 1e-6)
    V = logits.shape[-1]

    if top_k is not None and top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -1e30, logits)

    if top_p is not None and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        # reference shifts the removal mask right so the first token above
        # the threshold is kept (models_sp.py:481-484)
        remove = cum > top_p
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
        )
        # smallest *kept* logit is the cutoff
        thresh = jnp.where(remove, jnp.inf, sorted_logits).min(
            axis=-1, keepdims=True
        )
        logits = jnp.where(logits < thresh, -1e30, logits)
    return logits


def _filter_logits_vec(logits, temperature, top_k, top_p):
    """Per-ROW temperature / top-k / top-p filtering, all traced.

    Batched variant of `_filter_logits` for serving: each row of `logits`
    (B, V) has its own temperature (B,), top_k (B,) int32 (0 disables) and
    top_p (B,) f32 (1.0 disables) — the reference applies one setting per
    `generate` call (`models_sp.py:473-486`); continuous batching interleaves
    requests with different settings in one step, so the knobs become traced
    per-slot operands instead of static python values.
    """
    V = logits.shape[-1]
    logits = logits / jnp.maximum(temperature[:, None], 1e-6)

    srt = jnp.sort(logits, axis=-1)  # ascending
    idx = jnp.clip(V - top_k, 0, V - 1)
    kth = jnp.take_along_axis(srt, idx[:, None], axis=-1)
    logits = jnp.where((top_k[:, None] > 0) & (logits < kth), -1e30, logits)

    # top-p must operate on the top-k-FILTERED distribution (reference
    # models_sp.py:478-486 chains the filters), so re-sort the masked logits
    # rather than reusing `srt` from before the top-k mask.
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_desc, axis=-1), axis=-1)
    remove = cum > top_p[:, None]
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[:, :1]), remove[:, :-1]], axis=-1)
    thresh = jnp.where(remove, jnp.inf, sorted_desc).min(
        axis=-1, keepdims=True)
    logits = jnp.where((top_p[:, None] < 1.0) & (logits < thresh), -1e30,
                       logits)
    return logits


@partial(jax.jit, static_argnames=("cfg", "max_new_tokens", "do_sample",
                                   "temperature", "top_k", "top_p",
                                   "eos_token_id"))
def generate(params, input_ids, prec, cfg: SPModelConfig, *,
             rng=None, max_new_tokens: int = 32, temperature: float = 1.0,
             top_k: Optional[int] = None, top_p: Optional[float] = None,
             do_sample: bool = True, eos_token_id: Optional[int] = None,
             tables: Optional[PrecTables] = None):
    """KV-cached generation (replaces reference `models_sp.py:460-507`).

    One prefill over the prompt, then `max_new_tokens` single-token decode
    steps under `lax.scan`. Tokens after EOS are frozen to EOS.
    """
    if tables is None:
        tables = prec_tables(cfg.quant)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    B, T0 = input_ids.shape
    max_len = min(cfg.model.n_positions, T0 + max_new_tokens)
    prec = jnp.asarray(prec, jnp.int32)

    cache = init_kv_cache(cfg, B, max_len)
    logits, cache = forward_with_cache(params, input_ids, prec, cfg, cache, tables)
    last_logits = logits[:, -1]

    def sample(logits, rng):
        if top_p is None and top_k is None and temperature == 1.0 and not do_sample:
            return jnp.argmax(logits, axis=-1)  # static shortcut
        filt = _filter_logits(logits, temperature, top_k, top_p)
        if do_sample:
            return jax.random.categorical(rng, filt, axis=-1)
        return jnp.argmax(filt, axis=-1)

    def body(carry, rng_i):
        cache, last_logits, done = carry
        tok = sample(last_logits, rng_i)
        if eos_token_id is not None:
            tok = jnp.where(done, eos_token_id, tok)
            done = done | (tok == eos_token_id)
        logits, cache = forward_with_cache(
            params, tok[:, None], prec, cfg, cache, tables
        )
        return (cache, logits[:, 0], done), tok

    done0 = jnp.zeros((B,), bool)
    rngs = jax.random.split(rng, max_new_tokens)
    (_, _, _), toks = jax.lax.scan(body, (cache, last_logits, done0), rngs)
    return jnp.concatenate([input_ids, toks.T], axis=1)
