"""Continuous-batching inference engine over the shared paged KV pool.

The serving capability the reference does not have at all: its worker
(`internvl/serve/model_worker.py:263-281`) serializes requests behind a
semaphore and each `generate` call owns a private tuple-concat cache for
its full duration — a second request waits even while the first is
decoding one token at a time at ~1% chip utilization. This engine runs
REQUESTS THROUGH ONE BATCHED DECODE PROGRAM continuously (the vLLM
scheduling model, re-built TPU-style):

* one physical page pool (`infer/paged_kv.PagedKVCache`) shared by up to
  ``max_rows`` in-flight requests; a host-side free-list
  :class:`PageAllocator` reserves each request's worst case
  (prompt + max_new_tokens) at admission and reclaims it at completion —
  unlike the session's device bump allocator, pages cycle forever;
* admission runs the new prompt through fixed-shape chunked prefill onto
  its row (`ops/paged_attention.paged_prefill_attention` + self-attention
  logsumexp merge) while other rows' state just sits in the pool —
  compiled once per chunk shape, arbitrary prompt lengths stream through;
* decode runs in jitted K-step blocks over ALL rows at once
  (`lax.scan`, pool donated so every store is in place), with per-row
  active masks and token budgets carried inside the block: a row that
  samples its stop token or exhausts ``max_new_tokens`` simply stops
  advancing; between blocks the host harvests the (B, K) emitted tokens,
  streams them to each request, retires finished rows (page-table row
  → -1 — the kernels treat -1 entries as dead and the store kernel
  no-ops on them, so a retired row can never touch reused pages), and
  admits queued requests into the freed rows.

Decode cost therefore amortizes across concurrent requests (batched
matmuls on the MXU, one page-pool sweep per row) and TTFT for a new
request is one chunked prefill, not a queue of full generations.

Everything is static-shaped: the only compiled programs are one prefill
chunk, one decode block, and two O(B) housekeeping ops.
"""

from __future__ import annotations

import dataclasses
import itertools
import logging
import queue
import threading
from collections import deque
from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from v2pe_tpu.infer import paged_kv as pk
from v2pe_tpu.infer.generate import GenerationConfig, _sample
from v2pe_tpu.models import internlm2, internvl_chat

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# host-side page accounting
# ---------------------------------------------------------------------------


class PageAllocator:
    """Free-list over the pool's physical page ids.

    With ``n_shards > 1`` (sequence-sharded pool) the physical range is
    split per shard and a row's page at table slot s must live on shard
    s % n_shards — the placement invariant the seq-sharded kernels'
    compacted local page view relies on (``ops/paged_attention.
    _local_page_view``). Each shard's local page 0 (global d·NP/n) is its
    reserved null page and is never handed out."""

    def __init__(self, n_pages: int, n_shards: int = 1):
        assert n_pages % n_shards == 0
        self.n_pages = n_pages
        self.n_shards = n_shards
        self.pages_per_shard = n_pages // n_shards
        self._free: List[List[int]] = [
            list(range(d * self.pages_per_shard + 1,
                       (d + 1) * self.pages_per_shard))
            for d in range(n_shards)]

    def shard_of(self, page: int) -> int:
        return page // self.pages_per_shard

    @property
    def available(self) -> int:
        return sum(len(f) for f in self._free)

    def _demand(self, n: int, first_slot: int) -> List[int]:
        d = [0] * self.n_shards
        for s in range(first_slot, first_slot + n):
            d[s % self.n_shards] += 1
        return d

    def shortage(self, n: int, first_slot: int = 0) -> dict:
        """Per-shard page deficit for an ``alloc(n, first_slot)``."""
        return {d: need - len(self._free[d])
                for d, need in enumerate(self._demand(n, first_slot))
                if need > len(self._free[d])}

    def alloc(self, n: int, first_slot: int = 0) -> Optional[List[int]]:
        """Pages for table slots first_slot..first_slot+n-1, in slot
        order, respecting the slot→shard placement invariant."""
        if self.shortage(n, first_slot):
            return None
        return [self._free[(first_slot + i) % self.n_shards].pop()
                for i in range(n)]

    def release(self, pages: Sequence[int]) -> None:
        for p in pages:
            self._free[self.shard_of(int(p))].append(int(p))


class PrefixCache:
    """Automatic prefix caching: hash-chained FULL prompt pages shared
    across requests (the vLLM block-hash model). Page i of a prompt is
    keyed by ``H(key_{i-1}, ids[i·ps:(i+1)·ps], pos[i·ps:(i+1)·ps])``
    seeded with a digest of the request's pixel data — V2PE's fractional
    positions and the image content both shape the stored kv, so both are
    part of the identity; two prompts share a page only when every token,
    every rotary position, and the media bytes before it match.

    Pages carry a refcount; at refcount 0 they are NOT freed but parked
    in an LRU — a later identical prefix re-acquires them and skips its
    prefill entirely. The engine evicts parked pages (oldest first,
    de-registering their keys) only when the free list runs dry. KV pages
    are append-only (prefill/decode write strictly past ``lengths``), so
    a shared page is immutable by construction — no copy-on-write needed.
    """

    def __init__(self):
        self._page_of: dict = {}          # key -> page id
        self._key_of: dict = {}           # page id -> key
        self._ref: dict = {}              # page id -> refcount
        self._lru: "dict[int, None]" = {}  # parked refcount-0 pages, FIFO
        self.hits = 0

    @property
    def evictable(self) -> int:
        return len(self._lru)

    @staticmethod
    def chain_keys(ids: np.ndarray, pos: np.ndarray, page_size: int,
                   seed: bytes = b"") -> List[bytes]:
        import hashlib

        keys, h = [], seed
        for i in range(len(ids) // page_size):
            sl = slice(i * page_size, (i + 1) * page_size)
            h = hashlib.blake2b(
                h + np.asarray(ids[sl], np.int64).tobytes()
                + np.asarray(pos[sl], np.float32).tobytes(),
                digest_size=16).digest()
            keys.append(h)
        return keys

    def match(self, keys: Sequence[bytes]) -> int:
        """Longest cached prefix (in pages) of the key chain."""
        n = 0
        for k in keys:
            if k not in self._page_of:
                break
            n += 1
        return n

    def acquire(self, key: bytes) -> int:
        """Take a reference on the cached page for ``key``."""
        page = self._page_of[key]
        self._ref[page] += 1
        self._lru.pop(page, None)
        self.hits += 1
        return page

    def register(self, key: bytes, page: int) -> bool:
        """Publish a freshly written page under ``key`` (ref already 1 —
        the registering row). No-op if the key is already cached (the
        duplicate page stays private to its row)."""
        if key in self._page_of:
            return False
        self._page_of[key] = page
        self._key_of[page] = key
        self._ref[page] = 1
        return True

    def release(self, page: int) -> None:
        """Drop a reference; at zero the page parks in the LRU."""
        self._ref[page] -= 1
        if self._ref[page] == 0:
            self._lru[page] = None

    def evict(self, n: int, pred=None) -> List[int]:
        """De-register up to ``n`` parked pages (oldest first), optionally
        only those matching ``pred(page)`` (per-shard eviction under a
        sequence-sharded pool)."""
        out = []
        for page in list(self._lru):
            if len(out) == n:
                break
            if pred is not None and not pred(page):
                continue
            del self._lru[page]
            del self._ref[page]
            del self._page_of[self._key_of.pop(page)]
            out.append(page)
        return out


@dataclasses.dataclass
class EngineRequest:
    """One in-flight generation. ``token_queue`` receives generated token
    ids as they are harvested (``None`` sentinel on completion)."""

    ids: np.ndarray                  # (S,) prompt token ids
    pos: np.ndarray                  # (S,) float32 V2PE positions
    max_new_tokens: int
    pixel_values: Optional[np.ndarray] = None   # (T, 3, sz, sz)
    request_id: int = 0
    tokens: List[int] = dataclasses.field(default_factory=list)
    token_queue: "queue.Queue" = dataclasses.field(
        default_factory=queue.Queue)
    finished: "threading.Event" = dataclasses.field(
        default_factory=threading.Event)
    _text: Optional[str] = None
    error: Optional[BaseException] = None  # scheduler failure (fail_all)

    def result(self, timeout: Optional[float] = None) -> str:
        self.finished.wait(timeout)
        if self.error is not None:
            raise RuntimeError(
                f"engine request {self.request_id} failed") from self.error
        return self._text


# ---------------------------------------------------------------------------
# jitted device programs (compiled once per engine geometry)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "attn_impl", "ctx"),
         donate_argnums=(1,))
def _prefill_row_chunk(llm, cache, row, embeds, pos, seg, *, cfg, attn_impl,
                       ctx=None):
    """One fixed-shape prompt chunk into row ``row`` of the shared cache:
    page-sweep + self-attention through the chunked-prefill path of
    ``llm_forward`` on a batch-1 view, lengths advanced by the chunk's
    valid token count. Returns (cache, last_logits (V,) fp32 at the
    chunk's last valid position).

    ``ctx`` (static) is the engine's captured ShardingContext: binding it
    into the trace (rather than reading the ambient one) keys the jit
    cache on the mesh, so engines with different meshes in one process
    can't reuse each other's programs."""
    from v2pe_tpu.parallel import context as pctx

    view = cache._replace(
        page_table=jax.lax.dynamic_slice_in_dim(cache.page_table, row, 1, 0),
        lengths=jax.lax.dynamic_slice_in_dim(cache.lengths, row, 1, 0))
    valid = jnp.sum((seg != 0).astype(jnp.int32), axis=1)        # (1,)
    with pctx.use_sharding(ctx):
        hidden, view = internlm2.llm_forward(
            llm, cfg, inputs_embeds=embeds, rope_pos_ids=pos,
            segment_ids=seg, attn_impl=attn_impl, paged_cache=view,
            paged_attend_cache=True, return_hidden=True)
    view = pk.advance_lengths(view, valid)
    cache = cache._replace(
        k_pages=view.k_pages, v_pages=view.v_pages,
        k_scales=view.k_scales, v_scales=view.v_scales,
        lengths=jax.lax.dynamic_update_slice(
            cache.lengths, view.lengths, (row,)))
    last_hidden = jnp.take_along_axis(
        hidden, jnp.maximum(valid - 1, 0)[:, None, None], axis=1)[:, 0]
    last_logits = internlm2.head_logits(last_hidden, llm["output_kernel"])
    return cache, last_logits[0]


@partial(jax.jit, static_argnames=("gc",))
def _first_token(logits, rng, *, gc):
    return _sample(logits[None], gc, rng)[0].astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "gc", "k", "attn_impl", "ctx"),
         donate_argnums=(1,))
def _decode_block(llm, cache, tok, pos, active, rem, rng, *, cfg, gc, k,
                  attn_impl, ctx=None):
    """K decode steps over every row at once. ``active`` rows write their
    fed token's kv at slot ``lengths`` (store-then-attend kernels) and
    advance; inactive rows ride along masked — their store is a no-op on
    dead (-1) page-table entries and their samples are discarded. A row
    deactivates inside the block when it samples a stop token or its
    ``rem`` budget hits zero. Returns (cache, tok, pos, active, rem,
    emitted (B, k) int32 with -1 where nothing was emitted)."""
    from v2pe_tpu.parallel import context as pctx

    eos = (jnp.asarray(gc.eos_token_ids, jnp.int32) if gc.eos_token_ids
           else jnp.zeros((0,), jnp.int32))

    def body(carry, _):
        cache, tok, pos, active, rem, key = carry
        key, sub = jax.random.split(key)
        emb = llm["tok_embeddings"][tok][:, None, :]
        with pctx.use_sharding(ctx):
            logits, cache = internlm2.llm_forward(
                llm, cfg, inputs_embeds=emb, rope_pos_ids=pos[:, None],
                attn_impl=attn_impl, paged_cache=cache)
        cache = pk.advance_lengths(cache, active.astype(jnp.int32))
        nxt = _sample(logits[:, -1], gc, sub).astype(jnp.int32)
        emitted = jnp.where(active, nxt, -1)
        rem = rem - active.astype(jnp.int32)
        live = ~jnp.isin(nxt, eos) if eos.size else \
            jnp.ones_like(active)
        new_active = active & live & (rem > 0)
        pos = pos + active.astype(pos.dtype)
        tok = jnp.where(new_active, nxt, tok)
        return (cache, tok, pos, new_active, rem, key), emitted

    (cache, tok, pos, active, rem, _), emitted = jax.lax.scan(
        body, (cache, tok, pos, active, rem, rng), None, length=k)
    return cache, tok, pos, active, rem, jnp.swapaxes(emitted, 0, 1)


@partial(jax.jit, static_argnames=("cfg", "gc", "n_iters", "attn_impl",
                                   "ctx"), donate_argnums=(1, 2, 3))
def _spec_block(llm, cache, ctx_buf, n_ctx, tok, pos, active, rem, *, cfg,
                gc, n_iters, attn_impl, ctx=None):
    """``n_iters`` prompt-lookup verify iterations over every row at once —
    the speculative counterpart of :func:`_decode_block` (token-exact by
    construction; see infer/speculative.py). Each iteration drafts K
    tokens per row from the row's ``ctx_buf`` history, verifies K+1 in one
    forward, and emits the accepted prefix. Returns (cache, ctx_buf,
    n_ctx, tok, pos, active, rem, emitted (B, n_iters*(K+1)) with -1 where
    nothing was emitted)."""
    from v2pe_tpu.infer.speculative import prompt_lookup_draft
    from v2pe_tpu.parallel import context as pctx

    K = int(gc.speculative_k)
    g = int(gc.speculative_ngram)
    B, W = ctx_buf.shape
    eos = (jnp.asarray(gc.eos_token_ids, jnp.int32) if gc.eos_token_ids
           else jnp.zeros((0,), jnp.int32))

    def _isin(x):
        return jnp.isin(x, eos) if eos.size else jnp.zeros(x.shape, bool)

    rows = jnp.arange(B)[:, None]
    off = jnp.arange(K + 1)[None, :]

    def body(carry, _):
        cache, ctxb, n_ctx, tok, pos, active, rem = carry
        draft = prompt_lookup_draft(ctxb, n_ctx, K, g)
        x = jnp.concatenate([tok[:, None], draft], axis=1)
        cache = pk.allocate_rows(
            cache, jnp.where(active, K + 1, 0).astype(jnp.int32))
        emb = llm["tok_embeddings"][x]
        seg = jnp.broadcast_to(jnp.where(active, 1, 0)[:, None], (B, K + 1))
        with pctx.use_sharding(ctx):
            logits, cache = internlm2.llm_forward(
                llm, cfg, inputs_embeds=emb,
                rope_pos_ids=pos[:, None] +
                jnp.arange(K + 1, dtype=jnp.float32)[None],
                segment_ids=seg, attn_impl=attn_impl, paged_cache=cache)
        y = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        verified = jnp.cumprod(jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32),
             (x[:, 1:] == y[:, :-1]).astype(jnp.int32)], axis=1), axis=1)
        no_eos_before = jnp.cumprod(jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32),
             (~_isin(y[:, :-1])).astype(jnp.int32)], axis=1), axis=1)
        keep = (verified * no_eos_before).astype(bool) \
            & (off < rem[:, None]) & active[:, None]
        m = jnp.sum(keep.astype(jnp.int32), axis=1)
        emitted = jnp.where(keep, y, -1)
        ctxb = ctxb.at[rows, jnp.where(keep, n_ctx[:, None] + off, W)
                       ].set(y, mode="drop")
        cache = pk.advance_lengths(cache, jnp.where(active, m, 0))
        last_kept = jnp.take_along_axis(
            y, jnp.maximum(m - 1, 0)[:, None], axis=1)[:, 0]
        tok = jnp.where(active & (m > 0), last_kept, tok)
        n_ctx = n_ctx + m
        pos = pos + m.astype(pos.dtype)
        rem = rem - m
        active = active & ~jnp.any(keep & _isin(y), axis=1) & (rem > 0)
        return (cache, ctxb, n_ctx, tok, pos, active, rem), emitted

    (cache, ctx_buf, n_ctx, tok, pos, active, rem), emitted = jax.lax.scan(
        body, (cache, ctx_buf, n_ctx, tok, pos, active, rem), None,
        length=n_iters)
    emitted = jnp.swapaxes(emitted, 0, 1).reshape(B, n_iters * (K + 1))
    return cache, ctx_buf, n_ctx, tok, pos, active, rem, emitted


@partial(jax.jit, donate_argnums=(0,))
def _append_ctx(ctx_buf, n_ctx, emitted):
    """Append a plain decode block's emitted tokens (-1 = none) to the
    draft context buffer — keeps prompt-lookup history current while
    speculation is adaptively suspended, so the re-probe block drafts
    from the REAL tail of each stream, not the pre-suspension tail."""
    B, W = ctx_buf.shape
    valid = emitted >= 0
    off = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    idx = jnp.where(valid, n_ctx[:, None] + off, W)
    ctx_buf = ctx_buf.at[jnp.arange(B)[:, None], idx].set(
        jnp.maximum(emitted, 0), mode="drop")
    return ctx_buf, n_ctx + jnp.sum(valid, axis=1).astype(n_ctx.dtype)


@partial(jax.jit, donate_argnums=(0,))
def _set_ctx_row(ctx_buf, row, vals, n):
    """Install an admitted row's prompt (+ first token) into the draft
    context buffer; slots past ``n`` are zeroed (never matched — lookup is
    bounded by n_ctx, but keep rows clean for debuggability)."""
    W = ctx_buf.shape[1]
    vals = jnp.where(jnp.arange(W) < n, vals, 0)
    return jax.lax.dynamic_update_slice(ctx_buf, vals[None], (row, 0))


@partial(jax.jit, donate_argnums=(0, 1))
def _set_row(page_table, lengths, row, table_row, length0):
    """Install a freshly admitted row's page table. ``length0`` > 0 when a
    cached prefix already fills the row's leading pages (prefix cache)."""
    page_table = jax.lax.dynamic_update_slice(
        page_table, table_row[None], (row, 0))
    lengths = jax.lax.dynamic_update_slice(
        lengths, length0.reshape(1).astype(lengths.dtype), (row,))
    return page_table, lengths


@partial(jax.jit, donate_argnums=(0, 1))
def _clear_rows(page_table, lengths, mask):
    """Retire finished rows: dead (-1) table entries + zero lengths, so the
    decode kernels skip them and the store kernel no-ops — the freed
    physical pages can be handed to other rows immediately."""
    page_table = jnp.where(mask[:, None], -1, page_table)
    lengths = jnp.where(mask, 0, lengths)
    return page_table, lengths


# ---------------------------------------------------------------------------
# the engine
# ---------------------------------------------------------------------------


class InferenceEngine:
    """Continuous batching over one shared paged pool.

    Args:
      chat_model: a :class:`~v2pe_tpu.infer.chat.ChatModel` (weights +
        tokenizer + template).
      max_rows: maximum concurrently decoding requests (the batch size of
        the decode block program).
      max_len: maximum prompt+generation length of a single request (sets
        the page-table width, i.e. the decode kernel's page sweep bound).
      pool_tokens: total KV capacity in tokens across all rows (defaults
        to ``max_rows * max_len`` — no oversubscription; smaller values
        oversubscribe and rely on admission control).
      chunk_size: prefill chunk length (one compiled program; prompts are
        padded up to a multiple).
      decode_block: decode steps fused per jitted block call (host
        harvests/admits between blocks, so this bounds added TTFT while a
        block is in flight).
      generation_config: engine-wide sampling settings; per-request
        ``max_new_tokens`` is honored via the in-block budget. Stop ids
        default to the model's template stop tokens.
      kv_dtype: None (model dtype), 'int8' (quantized pool — doubles
        the token capacity per HBM byte) or 'int4' (doubles it again;
        hardware nibble-packed jnp.int4 pages).
    """

    def __init__(self, chat_model, *, max_rows: int = 8,
                 max_len: int = 8192, pool_tokens: Optional[int] = None,
                 page_size: int = 512, chunk_size: int = 512,
                 decode_block: int = 16,
                 generation_config: Optional[GenerationConfig] = None,
                 kv_dtype=None, prefix_caching: bool = True,
                 spec_min_accept: float = 1.5,
                 spec_reprobe_blocks: int = 16):
        self.m = chat_model
        self.cfg = chat_model.cfg
        self.attn_impl = chat_model.attn_impl
        self.max_rows = max_rows
        self.max_len = max_len
        self.page_size = page_size
        self.chunk_size = chunk_size
        self.decode_block = decode_block
        MP = -(-max_len // page_size)
        self.max_pages_per_row = MP
        pool_tokens = pool_tokens or max_rows * max_len
        # captured ONCE: the engine's programs are traced for this mesh
        # (sequence-sharded pool + tensor-sharded heads when the context
        # says so — continuous batching on the 1M-context layout)
        from v2pe_tpu.parallel import context as pctx

        self.ctx = pctx.current()
        n_shards = 1
        if self.ctx is not None and \
                self.ctx.seq_axis in self.ctx.mesh.shape:
            n_shards = self.ctx.mesh.shape[self.ctx.seq_axis]
        # per shard: its pages + its reserved local null page 0
        NP = n_shards * (-(-pool_tokens // (page_size * n_shards)) + 1)
        gc = generation_config or GenerationConfig()
        if not gc.eos_token_ids:
            stop = tuple(chat_model.conv_template.stop_token_ids) or \
                (self.cfg.llm.eos_token_id,)
            gc = dataclasses.replace(gc, eos_token_ids=stop)
        self.gc = gc
        # speculative continuous batching (_spec_block): drafts ride a
        # per-row device-side token-history buffer; verify writes need
        # K+1 page slack past prompt+max_new
        self._spec = gc.speculative_k > 0
        if self._spec:
            assert not gc.do_sample, \
                "speculative engine decode is greedy-only"
        self._spec_slack = gc.speculative_k + 1 if self._spec else 0
        # adaptive off-switch: a workload whose drafts don't hit (accept/
        # forward below the break-even ratio — verify-forward cost over
        # plain-step cost, ~1.3-2.2x depending on context) pays the full
        # (K+1)-token verify price for ~1 token forever. Track acceptance
        # per verify forward per active row (EMA over blocks); below
        # ``spec_min_accept`` drafting SUSPENDS for ``spec_reprobe_blocks``
        # plain decode blocks, then one spec block re-probes (workloads
        # shift: a copy-heavy answer span can appear mid-stream).
        self.spec_min_accept = float(spec_min_accept)
        self.spec_reprobe_blocks = int(spec_reprobe_blocks)
        self._spec_accept_ema: Optional[float] = None
        self._spec_suspended_for = 0
        self._ctx_dev = jnp.zeros(
            (max_rows, max_len + self._spec_slack + 8), jnp.int32) \
            if self._spec else None
        self._nctx = np.zeros(max_rows, np.int32)
        self.cache = pk.PagedKVCache.zeros(
            self.cfg.llm, max_rows, NP, page_size, MP,
            dtype=chat_model.params["llm"]["tok_embeddings"].dtype,
            kv_dtype=kv_dtype, n_shards=n_shards)
        if self.ctx is not None:
            # place the pool physically over the mesh (each device holds
            # NP/n_seq pages and, when the head count divides, Hkv/n_t
            # heads) so the engine's HBM budget actually scales with the
            # slice instead of replicating
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            mesh = self.ctx.mesh
            nt = mesh.shape.get(self.ctx.tensor_axis, 1)
            Hkv = self.cfg.llm.num_key_value_heads
            head_ax = self.ctx.tensor_axis if (nt > 1 and Hkv % nt == 0) \
                else None
            seq_ax = self.ctx.seq_axis if n_shards > 1 else None
            spec = NamedSharding(mesh, P(None, head_ax, seq_ax, None, None))
            self.cache = self.cache._replace(
                k_pages=jax.device_put(self.cache.k_pages, spec),
                v_pages=jax.device_put(self.cache.v_pages, spec),
                k_scales=jax.device_put(self.cache.k_scales, spec)
                if self.cache.k_scales is not None else None,
                v_scales=jax.device_put(self.cache.v_scales, spec)
                if self.cache.v_scales is not None else None)
        self.allocator = PageAllocator(NP, n_shards=n_shards)
        self.prefix_cache = PrefixCache() if prefix_caching else None
        self.stats = {"prefill_chunks": 0, "prefix_hit_pages": 0}
        # host mirrors / per-row state
        self._row_req: List[Optional[EngineRequest]] = [None] * max_rows
        self._row_pages: List[List[int]] = [[] for _ in range(max_rows)]
        # pages participating in the prefix cache, per row: [(page, key)]
        self._row_cached: List[List] = [[] for _ in range(max_rows)]
        self._tok = np.zeros(max_rows, np.int32)
        self._pos = np.zeros(max_rows, np.float32)
        self._active = np.zeros(max_rows, bool)
        self._rem = np.zeros(max_rows, np.int32)
        self._queue: "deque[EngineRequest]" = deque()
        self._ids = itertools.count()
        self._rng = jax.random.PRNGKey(0)
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._thread: Optional[threading.Thread] = None
        self._stopping = False
        self._failed: Optional[BaseException] = None

    # ------------------------------------------------------------ submission
    def submit(self, ids: np.ndarray, pos: np.ndarray,
               pixel_values: Optional[np.ndarray] = None,
               max_new_tokens: int = 256) -> EngineRequest:
        """Queue raw (ids, positions) for generation."""
        ids = np.asarray(ids, np.int64).reshape(-1)
        need = -(-(len(ids) + max_new_tokens + self._spec_slack)
                 // self.page_size)
        if len(ids) + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt+max_new {len(ids) + max_new_tokens} exceeds the "
                f"engine max_len {self.max_len}")
        if -(-need // self.allocator.n_shards) > \
                self.allocator.pages_per_shard - 1:
            raise ValueError("request can never fit the page pool")
        req = EngineRequest(ids=ids, pos=np.asarray(pos, np.float32),
                            max_new_tokens=max_new_tokens,
                            pixel_values=pixel_values,
                            request_id=next(self._ids))
        with self._wake:
            if self._failed is not None:
                raise RuntimeError("engine scheduler has failed") \
                    from self._failed
            self._queue.append(req)
            self._wake.notify()
        return req

    def submit_chat(self, pixel_values: Optional[np.ndarray], question: str,
                    max_new_tokens: int = 256, history=None,
                    num_patches_list=None,
                    rope_pos_id_version: Optional[str] = None,
                    rope_pos_id_stride: Optional[int] = None
                    ) -> EngineRequest:
        """Prompt-building convenience mirroring ``ChatModel.chat``."""
        if num_patches_list is None:
            num_patches_list = [pixel_values.shape[0]] \
                if pixel_values is not None else []
        if history is None and pixel_values is not None \
                and "<image>" not in question:
            question = "<image>\n" + question
        ids, pos, _ = self.m.encode_chat(
            question, num_patches_list, history,
            rope_pos_id_version=rope_pos_id_version,
            rope_pos_id_stride=rope_pos_id_stride)
        return self.submit(ids, pos, pixel_values=pixel_values,
                           max_new_tokens=max_new_tokens)

    # ------------------------------------------------------------- scheduler
    def _free_row(self) -> Optional[int]:
        for r in range(self.max_rows):
            if self._row_req[r] is None:
                return r
        return None

    def step(self) -> bool:
        """One scheduler iteration: admit whatever fits, then one decode
        block if anything is decoding. Returns False when nothing could
        make progress (idle, or queued work is blocked on pages)."""
        progressed = False
        while True:
            with self._lock:
                if not self._queue:
                    break
                row = self._free_row()
                if row is None:
                    break
                plan = self._plan_admission(self._queue[0])
                if plan is None:
                    break
                req = self._queue.popleft()
            self._admit(req, row, plan)
            progressed = True
        if self._active.any():
            if self._spec and self._spec_suspended_for > 0:
                self._spec_suspended_for -= 1
                # suspended plain blocks run at a LARGER k than the spec
                # block's iteration count: a spec engine picks a small
                # decode_block (each iteration can emit up to K+1 tokens)
                # and inheriting it for plain decode would pay ~8x the
                # host/dispatch overhead per token (measured: adaptive
                # recovered only half the plain engine's rate before this)
                self._run_decode_block(k=min(64, self.decode_block * 8))
                if self._spec_suspended_for == 0:
                    # forget the stale estimate before the re-probe block
                    self._spec_accept_ema = None
            elif self._spec:
                self._run_spec_block()
            else:
                self._run_decode_block()
            progressed = True
        return progressed

    def run_until_idle(self) -> None:
        """Drive the scheduler until every submitted request completed."""
        while self._queue or any(r is not None for r in self._row_req):
            if not self.step():
                raise RuntimeError(
                    "engine stalled: queued request cannot be admitted "
                    "(pool too small for the concurrent working set)")

    # ----------------------------------------------------- background thread
    def start(self) -> None:
        """Run the scheduler on a daemon thread (for the serving worker)."""
        if self._thread is not None:
            return
        self._stopping = False

        def loop():
            while not self._stopping:
                try:
                    progressed = self.step()
                except Exception as e:  # a dead scheduler must not strand
                    # blocked result() callers (EngineChat, the worker) —
                    # fail everything in flight and queued, then exit
                    logger.exception("engine scheduler failed; "
                                     "failing all pending requests")
                    self._fail_all(e)
                    return
                if not progressed:
                    with self._wake:
                        if not self._queue and not self._active.any() \
                                and not self._stopping:
                            self._wake.wait(timeout=0.1)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def _fail_all(self, exc: BaseException) -> None:
        with self._lock:
            self._failed = exc
            pending = [r for r in self._row_req if r is not None]
            self._row_req = [None] * self.max_rows
            queued = list(self._queue)
            self._queue.clear()
        for req in pending + queued:
            req.error = exc
            req.token_queue.put(None)
            req.finished.set()

    def stop(self) -> None:
        self._stopping = True
        with self._wake:
            self._wake.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    # -------------------------------------------------------------- internals
    def _plan_admission(self, req: EngineRequest):
        """Match the prompt against the prefix cache and reserve pages.
        Returns (pages, keys, n_matched_pages) or None when the pool can't
        cover the request right now; on success cached-prefix pages are
        already acquired and sit at the front of ``pages``."""
        ps = self.page_size
        need = -(-(len(req.ids) + req.max_new_tokens + self._spec_slack)
                 // ps)
        pc = self.prefix_cache
        keys: List[bytes] = []
        shared: List[int] = []
        if pc is not None:
            import hashlib

            seed = hashlib.blake2b(
                req.pixel_values.tobytes(), digest_size=16).digest() \
                if req.pixel_values is not None else b""
            keys = pc.chain_keys(req.ids, req.pos, ps, seed)
            # always leave >=1 prompt token to prefill: the new request
            # needs the last position's logits to sample its first token
            matched = min(pc.match(keys), (len(req.ids) - 1) // ps)
            shared = [pc.acquire(k) for k in keys[:matched]]
        n_new, first = need - len(shared), len(shared)
        fresh = self.allocator.alloc(n_new, first_slot=first)
        if fresh is None and pc is not None:
            # evict parked pages shard by shard to cover the exact deficit
            # (pages are not interchangeable across shards: slot s of a
            # row must live on shard s % n)
            for d, k in self.allocator.shortage(n_new, first).items():
                self.allocator.release(pc.evict(
                    k, pred=lambda p, d=d: self.allocator.shard_of(p) == d))
            fresh = self.allocator.alloc(n_new, first_slot=first)
        if fresh is None:
            for page in shared:           # roll the acquisition back
                pc.release(page)
            return None
        self.stats["prefix_hit_pages"] += len(shared)
        return shared + fresh, keys, len(shared)

    def _admit(self, req: EngineRequest, row: int, plan) -> None:
        pages, keys, matched = plan
        llm = self.m.params["llm"]
        dtype = llm["tok_embeddings"].dtype
        MP, CH, ps = self.max_pages_per_row, self.chunk_size, self.page_size
        table_row = np.full(MP, -1, np.int32)
        table_row[:len(pages)] = pages
        consumed = matched * ps           # tokens served by shared pages
        pt, lens = _set_row(self.cache.page_table, self.cache.lengths,
                            jnp.int32(row), jnp.asarray(table_row),
                            jnp.int32(consumed))
        self.cache = self.cache._replace(page_table=pt, lengths=lens)
        cached = [(pages[i], keys[i]) for i in range(matched)]

        S = len(req.ids)
        Sf = S - consumed                 # suffix left to prefill
        Sp = -(-Sf // CH) * CH
        ids_p = np.pad(req.ids[consumed:], (0, Sp - Sf))[None]
        pos_p = np.pad(req.pos[consumed:],
                       (0, Sp - Sf))[None].astype(np.float32)
        seg_p = np.pad(np.ones(Sf, np.int32), (0, Sp - Sf))[None]
        embeds = llm["tok_embeddings"][jnp.asarray(ids_p, jnp.int32)]
        if req.pixel_values is not None and \
                (np.asarray(ids_p[0]) == self.m.img_context_token_id).any():
            vit = internvl_chat.extract_feature(
                self.m.params, self.cfg,
                jnp.asarray(req.pixel_values, dtype),
                attn_impl=self.attn_impl)
            # a cached prefix may cover the leading image tokens: scatter
            # fills the suffix's <IMG_CONTEXT> slots with the TRAILING
            # feature rows (the leading ones' kv already sits in the
            # shared pages)
            n_ctx = int((np.asarray(ids_p[0])
                         == self.m.img_context_token_id).sum())
            tail = vit.reshape(-1, vit.shape[-1])[-n_ctx:][:, None, :]
            embeds = internvl_chat.scatter_image_embeds(
                embeds, jnp.asarray(ids_p, jnp.int32), tail,
                jnp.ones((n_ctx,), jnp.int32), self.m.img_context_token_id)

        last_logits = None
        for c in range(Sp // CH):
            sl = slice(c * CH, (c + 1) * CH)
            self.cache, last_logits = _prefill_row_chunk(
                llm, self.cache, jnp.int32(row),
                embeds[:, sl], jnp.asarray(pos_p[:, sl]),
                jnp.asarray(seg_p[:, sl]),
                cfg=self.cfg.llm, attn_impl=self.attn_impl, ctx=self.ctx)
            self.stats["prefill_chunks"] += 1

        # publish this prompt's freshly written full pages for reuse
        if self.prefix_cache is not None:
            for i in range(matched, S // ps):
                if self.prefix_cache.register(keys[i], pages[i]):
                    cached.append((pages[i], keys[i]))

        self._rng, sub = jax.random.split(self._rng)
        tok0 = int(_first_token(last_logits, sub, gc=self.gc))
        self._row_req[row] = req
        self._row_pages[row] = pages
        self._row_cached[row] = cached
        self._emit(row, tok0)           # may retire on eos / max_new == 1
        if self._row_req[row] is None:
            return
        self._tok[row] = tok0
        self._pos[row] = float(req.pos[-1]) + 1.0
        self._active[row] = True
        self._rem[row] = req.max_new_tokens - 1
        if self._spec:
            S = len(req.ids)
            vals = np.zeros(self._ctx_dev.shape[1], np.int32)
            vals[:S] = req.ids
            vals[S] = tok0
            self._ctx_dev = _set_ctx_row(self._ctx_dev, jnp.int32(row),
                                         jnp.asarray(vals),
                                         jnp.int32(S + 1))
            self._nctx[row] = S + 1

    def _emit(self, row: int, token: int) -> None:
        req = self._row_req[row]
        req.tokens.append(int(token))
        req.token_queue.put(int(token))
        if token in self.gc.eos_token_ids \
                or len(req.tokens) >= req.max_new_tokens:
            self._retire(row)

    def _retire(self, row: int) -> None:
        """Completion: dead-mark the row on device, reclaim pages, finish
        the request."""
        mask = np.zeros(self.max_rows, bool)
        mask[row] = True
        pt, lens = _clear_rows(self.cache.page_table, self.cache.lengths,
                               jnp.asarray(mask))
        self.cache = self.cache._replace(page_table=pt, lengths=lens)
        in_cache = {p for p, _ in self._row_cached[row]}
        for page, _ in self._row_cached[row]:
            self.prefix_cache.release(page)   # parks at refcount 0
        self.allocator.release(
            [p for p in self._row_pages[row] if p not in in_cache])
        self._row_pages[row] = []
        self._row_cached[row] = []
        self._active[row] = False
        req, self._row_req[row] = self._row_req[row], None
        req._text = self.m._decode(np.asarray(req.tokens, np.int64),
                                   len(req.tokens))
        req.token_queue.put(None)
        req.finished.set()

    def _run_decode_block(self, k: Optional[int] = None) -> None:
        llm = self.m.params["llm"]
        self._rng, sub = jax.random.split(self._rng)
        self.cache, tok, pos, active, rem, emitted = _decode_block(
            llm, self.cache, jnp.asarray(self._tok), jnp.asarray(self._pos),
            jnp.asarray(self._active), jnp.asarray(self._rem), sub,
            cfg=self.cfg.llm, gc=self.gc, k=k or self.decode_block,
            attn_impl=self.attn_impl, ctx=self.ctx)
        emitted = np.asarray(emitted)
        if self._spec:
            # suspended-speculation mode: keep the draft history current
            self._ctx_dev, nctx = _append_ctx(
                self._ctx_dev, jnp.asarray(self._nctx),
                jnp.asarray(emitted))
            self._nctx = np.array(nctx)
        # np.array (copy): np.asarray of a jax array is read-only
        self._tok = np.array(tok)
        self._pos = np.array(pos)
        self._active = np.array(active)
        self._rem = np.array(rem)
        self._drain_emitted(emitted)

    def _run_spec_block(self) -> None:
        """Speculative counterpart of :meth:`_run_decode_block`: each of
        ``decode_block`` iterations verifies K+1 tokens per row in one
        forward, so a block emits between decode_block and
        decode_block*(K+1) tokens per active row."""
        llm = self.m.params["llm"]
        self._n_act_before_block = int(self._active.sum())
        (self.cache, self._ctx_dev, nctx, tok, pos, active, rem,
         emitted) = _spec_block(
            llm, self.cache, self._ctx_dev, jnp.asarray(self._nctx),
            jnp.asarray(self._tok), jnp.asarray(self._pos),
            jnp.asarray(self._active), jnp.asarray(self._rem),
            cfg=self.cfg.llm, gc=self.gc, n_iters=self.decode_block,
            attn_impl=self.attn_impl, ctx=self.ctx)
        emitted = np.asarray(emitted)
        self._nctx = np.array(nctx)
        self._tok = np.array(tok)
        self._pos = np.array(pos)
        self._active = np.array(active)
        self._rem = np.array(rem)
        self.stats["spec_forwards"] = self.stats.get("spec_forwards", 0) \
            + int(self.decode_block)
        self.stats["spec_accepted"] = self.stats.get("spec_accepted", 0) \
            + int((emitted >= 0).sum())
        # adaptive suspend (see __init__): acceptance per verify forward
        # per row that was active when the block launched
        n_act = getattr(self, "_n_act_before_block", 0)
        if n_act:
            accept = float((emitted >= 0).sum()) / (self.decode_block *
                                                    n_act)
            ema = self._spec_accept_ema
            self._spec_accept_ema = accept if ema is None \
                else 0.5 * ema + 0.5 * accept
            if self._spec_accept_ema < self.spec_min_accept:
                self._spec_suspended_for = self.spec_reprobe_blocks
                self.stats["spec_suspends"] = \
                    self.stats.get("spec_suspends", 0) + 1
        self._drain_emitted(emitted)

    def _drain_emitted(self, emitted: np.ndarray) -> None:
        for row in range(self.max_rows):
            if self._row_req[row] is None:
                continue
            for t in emitted[row]:
                if t < 0 or self._row_req[row] is None:
                    continue
                self._emit(row, int(t))
            # budget exhausted without a stop token mid-block
            if self._row_req[row] is not None and not self._active[row]:
                self._retire(row)


class EngineChat:
    """``ChatModel.chat``-compatible facade over a shared InferenceEngine.

    Drop-in for any per-sample consumer of ``ChatModel`` (the eval drivers
    call ``model.chat(...)`` once per benchmark item — SURVEY.md §2.8's
    per-sample loop): each ``chat`` call submits to the engine and blocks
    on the request's result, so N caller threads batch into one continuous
    decode program (weight reads amortized across rows) instead of N
    sequential generations. The reference has no batched-eval path at all
    (one ``model.chat`` per sample per rank). Greedy-only — sampling is an
    engine-wide setting and every reference eval decodes greedily; beam
    requests must use the plain ChatModel. All non-``chat`` attributes
    (``load_pixels``, ``cfg``, ``tokenizer``, ...) delegate to the wrapped
    model.
    """

    def __init__(self, chat_model, *, max_rows: int = 8,
                 max_len: int = 8192, **engine_kwargs):
        self._m = chat_model
        self.engine = InferenceEngine(chat_model, max_rows=max_rows,
                                      max_len=max_len, **engine_kwargs)
        self.engine.start()

    def __getattr__(self, name):
        return getattr(self._m, name)

    def chat(self, pixel_values, question,
             generation_config: Optional[GenerationConfig] = None,
             history=None, return_history: bool = False,
             num_patches_list=None, rope_pos_id_version: Optional[str] = None,
             rope_pos_id_stride: Optional[int] = None, verbose: bool = False):
        gc = generation_config or GenerationConfig()
        if gc.do_sample or gc.num_beams > 1:
            raise ValueError(
                "EngineChat decodes greedily on the shared engine; use the "
                "plain ChatModel for sampling/beam generation")
        if history is None and pixel_values is not None \
                and "<image>" not in question:
            question = "<image>\n" + question  # history keeps the marker
        req = self.engine.submit_chat(
            pixel_values, question, max_new_tokens=gc.max_new_tokens,
            history=history, num_patches_list=num_patches_list,
            rope_pos_id_version=rope_pos_id_version,
            rope_pos_id_stride=rope_pos_id_stride)
        text = req.result()
        if return_history:
            return text, (list(history or []) + [(question, text)])
        return text

    def stop(self):
        self.engine.stop()
