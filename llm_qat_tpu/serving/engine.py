"""Continuous-batching serving engine over the pre-quantized decode path.

The reference has no serving layer at all (SURVEY.md §L8: checkpoints only;
its `generate` is a host loop with full-prefix recompute). BASELINE.json's
north star calls for production serving with continuous batching; this module
provides the single-chip version:

- N decode *slots* share one set of per-layer KV caches (slot = batch row);
- requests queue up and are prefilled into free slots (per-slot K/V insert);
- one jitted decode step advances ALL active slots a token, with per-slot
  positions (each slot has its own sequence length — attention masks and
  cache writes are per-slot scatters);
- finished sequences (EOS or max tokens) free their slot immediately for the
  next queued request — no head-of-line blocking on long generations.

Multi-host scale-out composes with `parallel.mesh` (shard the slot axis over
"data", weights over "model"); this class keeps the single-chip loop simple.

Throughput note: through the axon development tunnel every device dispatch
costs ~0.3 s of link latency, so the host-driven loop measures ~56 tok/s
(24 mixed requests) regardless of chunking — compute per chunk is ~ms. On a
real TPU host the same loop is decode-bound (the single-stream megakernel
path measures ~21k tok/s at B=8, docs/RESULTS_R3.md; this engine's
per-slot-position path trails it but scales request mixes). `step_chunk`
exists precisely to amortize dispatches (k decode steps per round trip).
"""

from __future__ import annotations

import itertools
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import SPModelConfig
from ..models.inference import (
    StaticMeta,
    _infer_linear,
    _ln,
    init_layer_caches,
    quantize_for_inference,
)


@dataclass
class Request:
    req_id: int
    prompt: np.ndarray  # (T0,) int32
    max_new_tokens: int
    temperature: float = 1.0
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    do_sample: bool = False
    generated: List[int] = field(default_factory=list)
    done: bool = False


def _sample_slots(logits, keys, counts, temp, top_k, top_p, do_sample,
                  greedy_only: bool = False):
    """Per-slot sampling: logits (B, V), keys (B, 2) uint32 per-request PRNG
    keys, counts (B,) token index within each request (the fold_in stream —
    token i of a request always uses fold_in(req_key, i), making chunked and
    stepwise decode bit-identical). Greedy rows take argmax of the filtered
    logits (filters keep the max, so == plain argmax). Reference sampling
    semantics: `models_sp.py:473-491`.

    `greedy_only` (STATIC, decided by the host from the active requests'
    settings) skips `_filter_logits_vec` entirely: its two full sorts over
    (B, vocab) cost ~1 ms/step on v5e and dominated the CB decode chunk
    when every request was greedy anyway (round-4 measurement,
    scripts/cb_bench.py)."""
    if greedy_only:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    from ..models.generate import _filter_logits_vec

    filt = _filter_logits_vec(logits, temp, top_k, top_p)

    def one(key, c, f):
        return jax.random.categorical(jax.random.fold_in(key, c), f)

    sampled = jax.vmap(one)(keys, counts, filt)
    return jnp.where(do_sample, sampled,
                     jnp.argmax(filt, axis=-1)).astype(jnp.int32)


def _decode_step(iparams, tokens, caches, lengths, active, keys, counts,
                 temp, top_k, top_p, do_sample, cfg: SPModelConfig,
                 static: StaticMeta, attn_interpret: bool = False,
                 greedy_only: bool = False):
    """One token for every slot. tokens (B, 1); lengths (B,) current lengths;
    active (B,) bool; keys/counts/temp/top_k/top_p/do_sample (B,) per-slot
    sampling state. Returns (next_token (B,), new_caches)."""
    from ..ops.decode_attention import kv_pack_factor

    m = cfg.model
    B = tokens.shape[0]
    kv_pack = kv_pack_factor(m.head_dim)
    packed_kv = (kv_pack > 1
                 and caches[0].shape[-1] == kv_pack * m.head_dim)
    T_max = (kv_pack * caches[0].shape[2] if packed_kv
             else caches[0].shape[2])
    bits = jnp.float32(static.bits)
    kind = jnp.int32(static.kind)

    pos = jnp.clip(lengths, 0, m.n_positions - 1)
    h = iparams["wte"][tokens] + iparams["wpe"][pos][:, None].astype(
        iparams["wte"].dtype)

    new_caches = list(caches)
    rows = jnp.arange(B)
    for li in range(m.n_layer):
        bp = jax.tree.map(lambda a: a[li], iparams["blocks"])
        hn = _ln(h, bp["ln1"]["g"], bp["ln1"]["b"], m.layer_norm_epsilon)
        qkv = _infer_linear(hn, bp["c_attn"], bits, kind, cfg, True, static)
        qh, kh, vh = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, 1, m.n_head, m.head_dim).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qh), heads(kh), heads(vh)
        if packed_kv:
            # per-slot packed HBM kernel: inactive slots (pos < 0) neither
            # write nor produce a meaningful output row (host ignores them)
            from ..ops.decode_attention import decode_attention_hbm_multi

            pos_eff = jnp.where(active, pos, -1)
            attn_o, kc, vc = decode_attention_hbm_multi(
                qh, kh, vh, caches[2 * li], caches[2 * li + 1], pos_eff,
                interpret=attn_interpret)
            new_caches[2 * li], new_caches[2 * li + 1] = kc, vc
            attn = attn_o.transpose(0, 2, 1, 3).reshape(B, 1, -1).astype(
                h.dtype)
        else:
            # per-slot scatter: slot b writes its K/V at its own position
            kc = caches[2 * li].at[rows, :, pos, :].set(
                kh[:, :, 0, :].astype(caches[0].dtype))
            vc = caches[2 * li + 1].at[rows, :, pos, :].set(
                vh[:, :, 0, :].astype(caches[0].dtype))
            new_caches[2 * li], new_caches[2 * li + 1] = kc, vc

            scale = 1.0 / jnp.sqrt(jnp.float32(m.head_dim))
            scores = jnp.einsum("bhsd,bhtd->bhst", qh, kc,
                                preferred_element_type=jnp.float32) * scale
            k_pos = jax.lax.broadcasted_iota(jnp.int32, (B, T_max), 1)
            valid = k_pos <= pos[:, None]  # causal per slot
            scores = jnp.where(valid[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(vc.dtype)
            attn = jnp.einsum("bhst,bhtd->bhsd", probs, vc)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, 1, -1).astype(
                h.dtype)
        h = h + _infer_linear(attn, bp["attn_proj"], bits, kind, cfg, True,
                              static).astype(h.dtype)
        h2 = _ln(h, bp["ln2"]["g"], bp["ln2"]["b"], m.layer_norm_epsilon)
        fc = _infer_linear(h2, bp["c_fc"], bits, kind, cfg, True, static)
        fc = jax.nn.gelu(fc, approximate=False).astype(h.dtype)
        h = h + _infer_linear(fc, bp["mlp_proj"], bits, kind, cfg, True,
                              static).astype(h.dtype)

    h = _ln(h, iparams["ln_f"]["g"], iparams["ln_f"]["b"],
            m.layer_norm_epsilon)
    logits = jnp.dot(h[:, 0], iparams["wte"].T,
                     preferred_element_type=jnp.float32)
    nxt = _sample_slots(logits, keys, counts, temp, top_k, top_p, do_sample,
                        greedy_only)
    # inactive slots keep token 0 (ignored by the host)
    nxt = jnp.where(active, nxt, 0)
    return nxt, tuple(new_caches)


class ContinuousBatchingEngine:
    """Continuous-batching decode server (single chip) with per-slot
    sampling (temperature / top-k / top-p / greedy per request)."""

    def __init__(self, params, cfg: SPModelConfig, bits: int,
                 n_slots: int = 8, max_len: int = 512,
                 eos_token_id: Optional[int] = None, dtype=jnp.bfloat16,
                 weight_format: str = "dense", lm_head_int8: bool = False,
                 lm_head_bits: Optional[int] = None,
                 kv_layout: str = "auto", kv_bits: int = 8,
                 mega_tbp: int = 64, attn_interpret: bool = False,
                 rng=None):
        from ..ops.decode_attention import kv_pack_factor

        self.cfg = cfg
        self.n_slots = n_slots
        self.max_len = min(max_len, cfg.model.n_positions)
        self.eos_token_id = eos_token_id
        self.dtype = dtype
        if kv_layout == "auto":
            kv_layout = ("packed" if jax.default_backend() == "tpu"
                         else "dense")
        self.kv_layout = kv_layout
        kv_pack = kv_pack_factor(cfg.model.head_dim)
        packed = kv_layout == "packed" and kv_pack > 1
        self.iparams = quantize_for_inference(
            params, cfg, bits, dtype, weight_format=weight_format,
            lm_head_int8=lm_head_int8, lm_head_bits=lm_head_bits)
        self.static = self.iparams.pop("_static")

        self.caches = init_layer_caches(cfg, n_slots, self.max_len, dtype,
                                        kv_layout=kv_layout)
        self.lengths = np.zeros((n_slots,), np.int32)
        self.last_token = np.zeros((n_slots,), np.int32)
        self.slot_req: List[Optional[Request]] = [None] * n_slots
        self.queue: deque = deque()
        self.finished: Dict[int, Request] = {}
        self._ids = itertools.count()
        # per-slot sampling state (host mirrors of the traced operands)
        self.base_rng = (jax.random.PRNGKey(0) if rng is None else rng)
        self.slot_keys = np.zeros((n_slots, 2), np.uint32)
        self.gen_counts = np.zeros((n_slots,), np.int32)
        self.temp = np.ones((n_slots,), np.float32)
        self.top_k = np.zeros((n_slots,), np.int32)
        self.top_p = np.ones((n_slots,), np.float32)
        self.do_sample = np.zeros((n_slots,), bool)

        cfg_ = cfg
        static = self.static

        self._step = jax.jit(
            lambda ip, toks, caches, lengths, active, keys, counts, temp,
            tk, tp, ds, greedy=False: _decode_step(
                ip, toks, caches, lengths, active, keys, counts, temp, tk,
                tp, ds, cfg_, static, attn_interpret, greedy),
            static_argnames=("greedy",),
        )
        self._sample_first = jax.jit(_sample_slots)

        # chunked decode: k steps on-device per host round trip. Essential
        # when the host↔device link has latency (measured 25 tok/s with
        # per-step sync through the axon tunnel vs thousands chunked). A
        # slot finishing mid-chunk generates discard-tokens; stale K/V past
        # a finished slot's length is never attended (per-slot masks) and
        # prefill overwrites on reuse.
        @partial(jax.jit, static_argnames=("k", "greedy"),
                 donate_argnums=(2,))
        def _step_chunk(ip, toks, caches, lengths, active, keys, counts,
                        temp, tk, tp, ds, k, greedy=False):
            def body(carry, _):
                toks, caches, lengths, counts = carry
                nxt, caches = _decode_step(ip, toks, caches, lengths, active,
                                           keys, counts, temp, tk, tp, ds,
                                           cfg_, static, attn_interpret,
                                           greedy)
                lengths = jnp.where(active, lengths + 1, lengths)
                counts = jnp.where(active, counts + 1, counts)
                return (nxt[:, None], caches, lengths, counts), nxt

            (_, caches, lengths, _), toks_out = jax.lax.scan(
                body, (toks, caches, lengths, counts), None, length=k)
            return toks_out.T, caches  # (B, k)

        self._step_chunk = _step_chunk

        # per-slot prefill: run the prompt through the model with a B=1
        # cache, then insert each layer's K/V rows into the slot
        from ..models.inference import infer_forward_unrolled

        prefill_layout = "dense" if kv_layout == "mega" else kv_layout

        @partial(jax.jit, static_argnames=("pad_len",))
        def _prefill(ip, ids, pad_len):
            caches1 = init_layer_caches(cfg_, 1, self.max_len, dtype,
                                        kv_layout=prefill_layout)
            logits, caches1, _ = infer_forward_unrolled(
                ip, ids, cfg_, caches1, jnp.int32(0), static=static,
                initial_prefill=True, attn_interpret=attn_interpret)
            return logits, caches1

        self._prefill = _prefill

        # one dispatch inserting ALL layer caches for a slot (the naive
        # per-array .at[].set loop costs 2*n_layer host round trips per
        # request — fatal over a high-latency link)
        @partial(jax.jit, donate_argnums=(0,))
        def _insert_slot(caches, caches1, slot, t0):
            out = []
            for i in range(len(caches)):
                t_dim = caches[i].shape[2]
                # packed rows hold kv_pack timesteps: copy ceil(t0/P) rows
                thr = ((t0 + kv_pack - 1) // kv_pack) if packed else t0
                t_idx = jnp.arange(t_dim)[None, :, None]
                row = jnp.where(t_idx < thr, caches1[i][0],
                                caches[i][slot])[None]
                out.append(jax.lax.dynamic_update_slice(
                    caches[i], row, (slot, 0, 0, 0)))
            return tuple(out)

        self._insert_slot = _insert_slot

        if kv_layout == "mega":
            self._setup_mega(kv_bits, mega_tbp, attn_interpret)

    def _setup_mega(self, kv_bits: int, mega_tbp: int,
                    attn_interpret: bool):
        """Megakernel decode path for mixed per-slot positions
        (VERDICT r3 #6): every layer of a continuous-batching decode step
        in ONE Pallas call via `mega_decode_step_cb`, with two-level KV —
        per-slot main caches (read-only within a chunk) + a chunk-local
        recent buffer appended at the batch-uniform step index, merged
        into main once per chunk (per-token XLA scatters into the big
        caches measured ~300 µs; the chunk merge amortizes that away)."""
        from ..models.inference import _lm_head, _ln
        from ..ops.mega_decode import (
            cb_merge_recent, mega_decode_step_cb, pack_mega_weights,
        )

        cfg_ = self.cfg
        m = cfg_.model
        dtype = self.dtype
        if kv_bits not in (8, 4):
            raise ValueError(f"mega CB needs kv_bits 8 or 4; got {kv_bits}")
        self.kv_bits = kv_bits
        self.mega = pack_mega_weights(self.iparams, cfg_)
        self._has_lora = "lora_A" in self.iparams["blocks"]["c_attn"]
        _ca = self.iparams["blocks"]["c_attn"]
        aq_max = (float(np.asarray(_ca["qmax"])[0])
                  if "qmax" in _ca else 127.0)
        qmax_kv = 127 if kv_bits == 8 else 7
        dc = m.n_embd if kv_bits == 8 else m.n_embd // 2
        L, B, T = m.n_layer, self.n_slots, self.max_len
        tbp = min(mega_tbp, T)
        while T % tbp and tbp > 8:
            tbp -= 8
        # chunk cap: the CB kernel's recent buffer is ONE stream block
        # (prefetched under the main pass — r5), so a chunk may decode at
        # most tbp tokens between merges; step_chunk splits larger asks
        self._mega_chunk_cap = tbp
        self.caches = (
            jnp.zeros((L, B, T, dc), jnp.int8),
            jnp.zeros((L, B, T, dc), jnp.int8),
            jnp.ones((L, T, 128), jnp.float32),
            jnp.ones((L, T, 128), jnp.float32),
        )

        def _recent(tr):
            return (jnp.zeros((L, B, tr, dc), jnp.int8),
                    jnp.zeros((L, B, tr, dc), jnp.int8),
                    jnp.ones((L, tr, 128), jnp.float32),
                    jnp.ones((L, tr, 128), jnp.float32))

        def _inner(ip, tokens, main, rec, lengths0, rpos, keys, counts,
                   temp, tk, tp, ds, greedy):
            pos_abs = jnp.clip(lengths0 + rpos, 0, m.n_positions - 1)
            h = (ip["wte"][tokens[:, 0]]
                 + ip["wpe"][pos_abs].astype(ip["wte"].dtype)).astype(
                     jnp.float32)
            h_out, *rec = mega_decode_step_cb(
                h, self.mega, *main, *rec, lengths0, rpos, n_head=m.n_head,
                head_dim=m.head_dim, has_lora=self._has_lora,
                eps=m.layer_norm_epsilon, tbp=tbp, act_dtype=dtype,
                aq_max=aq_max, kv_bits=kv_bits, tiles_per_step=4,
                interpret=attn_interpret)
            hf = _ln(h_out[:, None, :].astype(dtype), ip["ln_f"]["g"],
                     ip["ln_f"]["b"], m.layer_norm_epsilon)
            logits = _lm_head(ip, hf)[:, 0]
            nxt = _sample_slots(logits, keys, counts, temp, tk, tp, ds,
                                greedy)
            return nxt, tuple(rec)

        def _mega_step(ip, tokens, caches, lengths, active, keys, counts,
                       temp, tk, tp, ds, greedy=False):
            rec = _recent(tbp)
            nxt, rec = _inner(ip, tokens, caches, rec, lengths,
                              jnp.int32(0), keys, counts, temp, tk, tp,
                              ds, greedy)
            caches = cb_merge_recent(*caches, *rec, lengths, 1)
            return jnp.where(active, nxt, 0), caches

        self._step = jax.jit(_mega_step, static_argnames=("greedy",))

        @partial(jax.jit, static_argnames=("k", "greedy"),
                 donate_argnums=(2,))
        def _step_chunk(ip, toks, caches, lengths, active, keys, counts,
                        temp, tk, tp, ds, k, greedy=False):
            tr = -(-k // tbp) * tbp
            rec0 = _recent(tr)

            def body(carry, i):
                toks, rec, counts = carry
                nxt, rec = _inner(ip, toks, caches, rec, lengths, i, keys,
                                  counts, temp, tk, tp, ds, greedy)
                counts = jnp.where(active, counts + 1, counts)
                return (nxt[:, None], rec, counts), jnp.where(active, nxt, 0)

            (_, rec, _), toks_out = jax.lax.scan(
                body, (toks, rec0, counts), jnp.arange(k))
            caches = cb_merge_recent(*caches, *rec, lengths, k)
            return toks_out.T, caches

        self._step_chunk = _step_chunk

        # dense B=1 prefill caches -> row-major quantized rows -> slot
        @partial(jax.jit, donate_argnums=(0,))
        def _insert_slot(caches, caches1, slot, t0):
            kc, vc, ksc, vsc = caches

            def conv(c):  # (1, H, T, D) -> (T, d)
                _, H_, T_, D_ = c.shape
                return c[0].transpose(1, 0, 2).reshape(T_, H_ * D_)

            def quant(rows):  # (L, T, d) -> codes (L, T, dc), scales (L, T)
                rf = rows.astype(jnp.float32)
                s = jnp.maximum(jnp.max(jnp.abs(rf), axis=-1), 1e-8) / qmax_kv
                codes = jnp.clip(jnp.round(rf / s[..., None]),
                                 -qmax_kv, qmax_kv).astype(jnp.int8)
                if kv_bits == 4:
                    d2 = codes.shape[-1] // 2
                    codes = ((codes[..., :d2] & 0xF) | (codes[..., d2:] << 4))
                return codes, s

            k_rows = jnp.stack([conv(c) for c in caches1[0::2]])
            v_rows = jnp.stack([conv(c) for c in caches1[1::2]])
            k_codes, k_s = quant(k_rows)
            v_codes, v_s = quant(v_rows)
            t_idx = jnp.arange(T)
            keep = (t_idx < t0)[None, :, None]
            kc = kc.at[:, slot].set(jnp.where(keep, k_codes, kc[:, slot]))
            vc = vc.at[:, slot].set(jnp.where(keep, v_codes, vc[:, slot]))
            keep2 = (t_idx < t0)[None, :]
            ksc = ksc.at[:, :, slot].set(
                jnp.where(keep2, k_s, ksc[:, :, slot]))
            vsc = vsc.at[:, :, slot].set(
                jnp.where(keep2, v_s, vsc[:, :, slot]))
            return kc, vc, ksc, vsc

        self._insert_slot = _insert_slot

    # -- public API --------------------------------------------------------
    def submit(self, prompt, max_new_tokens: int = 32, *,
               temperature: float = 1.0, top_k: Optional[int] = None,
               top_p: Optional[float] = None, do_sample: bool = False) -> int:
        """Queue a request; returns its id.

        Capacity contract: the prompt must leave room for at least one
        decoded token (`len(prompt) <= max_len - 1`) — beyond that the
        decode step would append K/V past the cache end, which on the
        megakernel path is a DMA out of bounds that ABORTS the TPU
        backend (`ops/mega_decode.py` pos < T contract), not a Python
        error. Requests whose `prompt + max_new_tokens` exceed capacity
        are accepted but finish early at the cache limit, mirroring the
        reference's stop at `n_positions`
        (`part1_switchable_precision/models_sp.py:501-505`).
        """
        prompt = np.asarray(prompt, np.int32)
        if prompt.ndim != 1:
            raise ValueError(f"prompt must be 1-D; got shape {prompt.shape}")
        if len(prompt) > self.max_len - 1:
            raise ValueError(
                f"prompt length {len(prompt)} exceeds engine capacity "
                f"(max_len={self.max_len} leaves room for at most "
                f"{self.max_len - 1} prompt tokens + 1 generated)")
        req = Request(next(self._ids), prompt,
                      max_new_tokens, temperature=temperature, top_k=top_k,
                      top_p=top_p, do_sample=do_sample)
        self.queue.append(req)
        return req.req_id

    def _all_greedy(self, active_np) -> bool:
        """STATIC sampling-mode flag: True when every active request is
        plain greedy (skips the (B, vocab) sort-based filter per step; at
        most two executables per chunk size)."""
        return bool(
            not self.do_sample[active_np].any()
            and (self.top_k[active_np] == 0).all()
            and (self.top_p[active_np] == 1.0).all())

    def _bucket(self, n: int) -> int:
        b = 8
        while b < n:
            b *= 2
        return min(b, self.max_len)

    def _finish(self, slot: int, req: Request):
        req.done = True
        self.finished[req.req_id] = req
        if slot >= 0:
            self.slot_req[slot] = None
            self.lengths[slot] = 0
            self.last_token[slot] = 0
            self.gen_counts[slot] = 0

    def _fill_slots(self):
        for slot in range(self.n_slots):
            while self.slot_req[slot] is None and self.queue:
                req = self.queue.popleft()
                if req.max_new_tokens <= 0:
                    # nothing to generate — don't sample the prefill token
                    self._finish(-1, req)
                    continue
                T0 = len(req.prompt)
                pad = self._bucket(T0)
                ids = np.zeros((1, pad), np.int32)
                ids[0, :T0] = req.prompt
                logits, caches1 = self._prefill(self.iparams,
                                                jnp.asarray(ids), pad)
                # the FIRST generated token comes from the prefill logits,
                # sampled under the request's own settings (the old code
                # argmaxed it and then dropped it from `generated` — a
                # shifted-by-one stream vs `generate`)
                key = np.asarray(
                    jax.random.fold_in(self.base_rng, req.req_id), np.uint32)
                first = int(self._sample_first(
                    logits[:1, T0 - 1], jnp.asarray(key[None]),
                    jnp.zeros((1,), jnp.int32),
                    jnp.asarray([req.temperature], jnp.float32),
                    jnp.asarray([req.top_k or 0], jnp.int32),
                    jnp.asarray([1.0 if req.top_p is None else req.top_p],
                                jnp.float32),
                    jnp.asarray([req.do_sample]))[0])
                req.generated.append(first)
                hit_eos = (self.eos_token_id is not None
                           and first == self.eos_token_id)
                if len(req.generated) >= req.max_new_tokens or hit_eos:
                    self._finish(-1, req)
                    continue  # slot stays free; try the next queued request
                # insert the first T0 cache rows into this slot (1 dispatch)
                self.caches = self._insert_slot(
                    self.caches, caches1, jnp.int32(slot), jnp.int32(T0))
                self.lengths[slot] = T0
                self.last_token[slot] = first
                self.gen_counts[slot] = 1
                self.slot_keys[slot] = key
                self.temp[slot] = req.temperature
                self.top_k[slot] = req.top_k or 0
                self.top_p[slot] = 1.0 if req.top_p is None else req.top_p
                self.do_sample[slot] = req.do_sample
                self.slot_req[slot] = req

    def step(self) -> int:
        """Advance every active slot one token; returns #active slots."""
        self._fill_slots()
        active_np = np.asarray([r is not None for r in self.slot_req])
        if not active_np.any():
            return 0
        toks = jnp.asarray(self.last_token[:, None])
        nxt, self.caches = self._step(
            self.iparams, toks, self.caches, jnp.asarray(self.lengths),
            jnp.asarray(active_np), jnp.asarray(self.slot_keys),
            jnp.asarray(self.gen_counts), jnp.asarray(self.temp),
            jnp.asarray(self.top_k), jnp.asarray(self.top_p),
            jnp.asarray(self.do_sample), greedy=self._all_greedy(active_np),
        )
        nxt = np.asarray(nxt)
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            tok = int(nxt[slot])
            req.generated.append(tok)
            self.lengths[slot] += 1
            self.gen_counts[slot] += 1
            self.last_token[slot] = tok
            hit_eos = (self.eos_token_id is not None
                       and tok == self.eos_token_id)
            out_of_room = self.lengths[slot] + 1 >= self.max_len
            if (len(req.generated) >= req.max_new_tokens or hit_eos
                    or out_of_room):
                self._finish(slot, req)
        return int(active_np.sum())

    def step_chunk(self, k: int = 16) -> int:
        """Advance active slots up to k tokens in ONE device dispatch.

        The chunk runs device-side without host sync; slot bookkeeping (EOS,
        max-tokens, recycling) happens once per chunk. Tokens generated after
        a slot's stop condition within the chunk are discarded.
        """
        self._fill_slots()
        active_np = np.asarray([r is not None for r in self.slot_req])
        if not active_np.any():
            return 0
        # cap k so no slot overruns its cache; on the mega path also cap
        # at the recent-buffer block size (kernel contract, r5)
        max_room = int(self.max_len - 1 - self.lengths[active_np].max())
        cap = getattr(self, "_mega_chunk_cap", None)
        if cap is not None:
            k = min(k, cap)
        k_eff = max(1, min(k, max_room))
        toks = jnp.asarray(self.last_token[:, None])
        toks_out, self.caches = self._step_chunk(
            self.iparams, toks, self.caches, jnp.asarray(self.lengths),
            jnp.asarray(active_np), jnp.asarray(self.slot_keys),
            jnp.asarray(self.gen_counts), jnp.asarray(self.temp),
            jnp.asarray(self.top_k), jnp.asarray(self.top_p),
            jnp.asarray(self.do_sample), k=k_eff,
            greedy=self._all_greedy(active_np),
        )
        toks_out = np.asarray(toks_out)  # (B, k_eff) — the one host sync
        for slot, req in enumerate(self.slot_req):
            if req is None:
                continue
            taken = 0
            for j in range(k_eff):
                tok = int(toks_out[slot, j])
                req.generated.append(tok)
                taken += 1
                if ((self.eos_token_id is not None
                     and tok == self.eos_token_id)
                        or len(req.generated) >= req.max_new_tokens):
                    break
            self.lengths[slot] += taken
            self.gen_counts[slot] += taken
            self.last_token[slot] = int(toks_out[slot, taken - 1])
            hit_eos = (self.eos_token_id is not None
                       and req.generated[-1] == self.eos_token_id)
            out_of_room = self.lengths[slot] + 1 >= self.max_len
            if (len(req.generated) >= req.max_new_tokens or hit_eos
                    or out_of_room):
                self._finish(slot, req)
        return int(active_np.sum())

    def run_until_done(self, max_steps: int = 10_000,
                       chunk: int = 1) -> Dict[int, Request]:
        steps = 0
        while (self.queue or any(r is not None for r in self.slot_req)) \
                and steps < max_steps:
            if chunk > 1:
                self.step_chunk(chunk)
            else:
                self.step()
            steps += 1
        return self.finished
