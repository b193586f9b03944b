"""Paged KV cache for long-context decode.

The reference has no real KV-cache management — ``chat()`` at long context
uses a naive per-layer tuple concat (modeling_internlm2.py:599-604), which
both reallocates O(S) per step and reserves worst-case memory per row. This
paged design (the BASELINE.json north-star capability) splits the cache into
fixed-size pages with a per-row page table, so:

* ragged batches share one physical pool (no per-row worst-case padding);
* memory grows by one page at a time per row;
* under a mesh the pool shards over the kv-head axis like any other tensor.

Pool layout is (L, Hkv, n_pages, page_size, hd): the layer and head axes
lead so the decode kernel (``v2pe_tpu.ops.paged_attention``) can DMA exactly
one (page_size, hd) page per grid step via a scalar-prefetched page table —
no jax-level gather ever materializes a row's full context.

Writes are one batched scatter over ALL layers at once (``write_all_layers``)
on the flat (L, Hkv, n_pages*page_size, hd) view: inside a decode loop the
pool is a donated carry, so XLA performs the scatter in place, touching only
the L*B*T written slots (the same write-only-new contract as the dense
cache's decode path in models/internlm2.py).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import LLMConfig


class PagedKVCache(NamedTuple):
    """Physical pool + page tables.

    k_pages/v_pages: (L, Hkv, n_pages, page_size, hd)
    page_table: (B, max_pages_per_row) int32 — physical page id or -1
    lengths:   (B,) int32 — tokens written per row
    next_page: (n_shards,) int32 — per-shard bump allocator heads; shard d
               owns the physical range [d*NP/n + 1, (d+1)*NP/n): EVERY
               shard's local page 0 is a reserved zero/null page, never
               allocated. The store kernel redirects rows whose fresh page
               another shard owns to local page 0 as a no-op target — if
               that page were allocatable, the no-op's stale write-back
               could erase an owned row's fresh store in the same grid.

    Sequence sharding (``n_shards > 1``): the page (n_pages) axis is the
    one sharded over the mesh's ``seq`` axis, so each device physically
    holds n_pages/n_shards pages — the design that makes 1M-token KV fit a
    v5e slice (SURVEY §7: 1M tokens x 96 KB/token = 24 GB for the 2B model,
    3 GB/chip on 8 chips). :func:`allocate_rows` places each row's i-th
    page on shard i % n_shards, so every row's context spreads evenly and
    each shard's per-row page count is bounded by ceil(MP / n_shards).
    """

    k_pages: jnp.ndarray
    v_pages: jnp.ndarray
    page_table: jnp.ndarray
    lengths: jnp.ndarray
    next_page: jnp.ndarray

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def max_pages_per_row(self) -> int:
        return self.page_table.shape[1]

    @property
    def n_shards(self) -> int:
        return self.next_page.shape[0]

    @staticmethod
    def zeros(cfg: LLMConfig, batch: int, n_pages: int, page_size: int,
              max_pages_per_row: int, dtype=jnp.bfloat16,
              n_shards: int = 1) -> "PagedKVCache":
        assert n_pages % n_shards == 0, (n_pages, n_shards)
        shape = (cfg.num_hidden_layers, cfg.num_key_value_heads, n_pages,
                 page_size, cfg.head_dim)
        # every shard's head starts at local page 1: local page 0 is that
        # shard's null page (see class docstring)
        heads = (jnp.arange(n_shards, dtype=jnp.int32)
                 * (n_pages // n_shards)) + 1
        return PagedKVCache(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            page_table=jnp.full((batch, max_pages_per_row), -1, jnp.int32),
            lengths=jnp.zeros((batch,), jnp.int32),
            next_page=heads.astype(jnp.int32),
        )


def allocate_rows(cache: PagedKVCache, new_lengths: jnp.ndarray
                  ) -> PagedKVCache:
    """Extend each row's page table to cover ``lengths + new_lengths`` tokens
    with freshly bumped pages (static shapes: the table has a fixed max).

    With ``n_shards > 1`` the row's page at row-slot s is placed on shard
    s % n_shards and drawn from that shard's bump head — per-row
    round-robin keeps every row's pages balanced across shards regardless
    of allocation interleaving between rows."""
    ps = cache.page_size
    B, MP = cache.page_table.shape
    n = cache.n_shards
    need = -(-(cache.lengths + new_lengths) // ps)  # pages needed per row
    have = -(-cache.lengths // ps)
    slot = jnp.arange(MP, dtype=jnp.int32)[None, :]
    take = (slot >= have[:, None]) & (slot < need[:, None])  # (B, MP)
    shard = slot % n                                         # (1, MP)->(B,MP)
    shard = jnp.broadcast_to(shard, take.shape)
    # rank of each new page within its shard's allocation batch, in
    # flat (row-major) order — matches a sequential bump per shard
    flat_take = take.reshape(-1)
    flat_shard = shard.reshape(-1)
    one = flat_take.astype(jnp.int32)
    rank_in_shard = jnp.zeros_like(one)
    counts = []
    for d in range(n):  # n is a small static (mesh axis size)
        sel = one * (flat_shard == d)
        rank_in_shard = rank_in_shard + jnp.where(
            flat_shard == d, jnp.cumsum(sel) - sel, 0)
        counts.append(jnp.sum(sel))
    new_ids = (cache.next_page[flat_shard] + rank_in_shard).reshape(B, MP)
    table = jnp.where(take, new_ids.astype(jnp.int32), cache.page_table)
    return cache._replace(
        page_table=table,
        next_page=cache.next_page + jnp.stack(counts).astype(jnp.int32))


def write_all_layers(cache: PagedKVCache, k_new: jnp.ndarray,
                     v_new: jnp.ndarray,
                     valid_t: jnp.ndarray | None = None) -> PagedKVCache:
    """Write (L, B, T, Hkv, hd) k/v at each row's current length in ONE
    scatter (pages must already be allocated; lengths are NOT advanced).

    valid_t: optional (B,) — number of valid tokens per row among the T
    (right-padded prompt prefill); default all T.
    """
    L, B, T, Hkv, hd = k_new.shape
    ps = cache.page_size
    NP = cache.k_pages.shape[2]
    pos = cache.lengths[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    page_slot = jnp.minimum(pos // ps, cache.max_pages_per_row - 1)
    offset = pos % ps
    phys = jnp.take_along_axis(cache.page_table, page_slot, axis=1)  # (B,T)
    valid = phys >= 0
    if valid_t is not None:
        valid &= jnp.arange(T, dtype=jnp.int32)[None, :] < valid_t[:, None]

    if T == 1:
        # decode fast path: per-row dynamic_update_slice — XLA updates the
        # donated pool IN PLACE (an .at[] scatter copied ~GBs per token)
        idx = jnp.clip(phys[:, 0] * ps + offset[:, 0], 0, NP * ps - 1)

        def upd1(pages, new):
            flat = pages.reshape(L, Hkv, NP * ps, hd)
            for b in range(B):
                val = jnp.swapaxes(new[:, b], 1, 2).astype(flat.dtype)
                cur = jax.lax.dynamic_slice(
                    flat, (0, 0, idx[b], 0), (L, Hkv, 1, hd))
                val = jnp.where(valid[b, 0], val, cur)
                flat = jax.lax.dynamic_update_slice(
                    flat, val, (0, 0, idx[b], 0))
            return flat.reshape(L, Hkv, NP, ps, hd)

        return cache._replace(k_pages=upd1(cache.k_pages, k_new),
                              v_pages=upd1(cache.v_pages, v_new))

    flat_idx = jnp.where(valid, phys * ps + offset, NP * ps)  # OOB -> drop
    flat_idx = flat_idx.reshape(-1)

    # (L, Hkv, NP*ps, hd) flat view; values (L, Hkv, B*T, hd)
    def scat(pages, new):
        flat = pages.reshape(L, Hkv, NP * ps, hd)
        vals = jnp.moveaxis(new, 3, 1).reshape(L, Hkv, B * T, hd)
        flat = flat.at[:, :, flat_idx].set(vals.astype(flat.dtype),
                                           mode="drop")
        return flat.reshape(L, Hkv, NP, ps, hd)

    return cache._replace(k_pages=scat(cache.k_pages, k_new),
                          v_pages=scat(cache.v_pages, v_new))


def write_tokens(cache: PagedKVCache, layer: int, k_new: jnp.ndarray,
                 v_new: jnp.ndarray) -> PagedKVCache:
    """Single-layer write of (B, T, Hkv, hd) (unit-test convenience; the
    decode loop uses :func:`write_all_layers`)."""
    L = cache.k_pages.shape[0]
    zeros = jnp.zeros((L,) + k_new.shape, k_new.dtype)
    k_all = zeros.at[layer].set(k_new)
    v_all = zeros.at[layer].set(v_new)
    # scatter only this layer: mask others by writing their current contents
    out = write_all_layers(cache, k_all, v_all)
    k_pages = cache.k_pages.at[layer].set(out.k_pages[layer])
    v_pages = cache.v_pages.at[layer].set(out.v_pages[layer])
    return cache._replace(k_pages=k_pages, v_pages=v_pages)


def gather_row_kv(cache: PagedKVCache, layer: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Materialize (B, max_len, Hkv, hd) k/v plus a validity mask from the
    page tables (max_len = max_pages_per_row * page_size, static).

    Debug/test path only — the decode kernel reads pages directly.
    """
    B, MP = cache.page_table.shape
    ps = cache.page_size
    phys = jnp.maximum(cache.page_table, 0)  # null page for -1 entries
    k = cache.k_pages[layer][:, phys]        # (Hkv, B, MP, ps, hd)
    v = cache.v_pages[layer][:, phys]
    Hkv, hd = k.shape[0], k.shape[-1]
    k = jnp.moveaxis(k, 0, 3).reshape(B, MP * ps, Hkv, hd)
    v = jnp.moveaxis(v, 0, 3).reshape(B, MP * ps, Hkv, hd)
    pos = jnp.arange(MP * ps, dtype=jnp.int32)[None, :]
    valid = pos < cache.lengths[:, None]
    return k, v, valid


def advance_lengths(cache: PagedKVCache, t) -> PagedKVCache:
    return cache._replace(lengths=cache.lengths + t)


