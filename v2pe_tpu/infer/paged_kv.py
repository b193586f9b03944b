"""Paged KV cache for long-context decode.

The reference has no real KV-cache management — ``chat()`` at long context
uses a naive per-layer tuple concat (modeling_internlm2.py:599-604), which
both reallocates O(S) per step and reserves worst-case memory per row. This
paged design (the BASELINE.json north-star capability) splits the cache into
fixed-size pages with a per-row page table, so:

* ragged batches share one physical pool (no per-row worst-case padding);
* memory grows by one page at a time per row;
* under a mesh the pool shards over (heads x pages) like any other tensor.

Decode attention gathers the row's pages into contiguous (max_len) form via
a static-shape page-table gather, then runs the standard flash kernel; a
fused pallas paged-attention kernel can replace the gather later without
changing this interface.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import LLMConfig


class PagedKVCache(NamedTuple):
    """Physical pool + page tables.

    k_pages/v_pages: (L, n_pages, page_size, Hkv, hd)
    page_table: (B, max_pages_per_row) int32 — physical page id or -1
    lengths:   (B,) int32 — tokens written per row
    next_page: () int32 — bump allocator head (page 0 is a zero/null page)
    """

    k_pages: jnp.ndarray
    v_pages: jnp.ndarray
    page_table: jnp.ndarray
    lengths: jnp.ndarray
    next_page: jnp.ndarray

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def max_pages_per_row(self) -> int:
        return self.page_table.shape[1]

    @staticmethod
    def zeros(cfg: LLMConfig, batch: int, n_pages: int, page_size: int,
              max_pages_per_row: int, dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.num_hidden_layers, n_pages, page_size,
                 cfg.num_key_value_heads, cfg.head_dim)
        return PagedKVCache(
            k_pages=jnp.zeros(shape, dtype),
            v_pages=jnp.zeros(shape, dtype),
            page_table=jnp.full((batch, max_pages_per_row), -1, jnp.int32),
            lengths=jnp.zeros((batch,), jnp.int32),
            next_page=jnp.ones((), jnp.int32),  # page 0 = null page
        )


def allocate_rows(cache: PagedKVCache, new_lengths: jnp.ndarray
                  ) -> PagedKVCache:
    """Extend each row's page table to cover ``lengths + new_lengths`` tokens
    with freshly bumped pages (static shapes: the table has a fixed max)."""
    ps = cache.page_size
    B, MP = cache.page_table.shape
    need = -(-(cache.lengths + new_lengths) // ps)  # pages needed per row
    have = -(-cache.lengths // ps)
    extra = jnp.maximum(need - have, 0)  # (B,)
    # prefix offsets for the bump allocator
    starts = cache.next_page + jnp.cumsum(extra) - extra
    slot = jnp.arange(MP, dtype=jnp.int32)[None, :]
    new_ids = starts[:, None] + (slot - have[:, None])
    take = (slot >= have[:, None]) & (slot < need[:, None])
    table = jnp.where(take, new_ids.astype(jnp.int32), cache.page_table)
    return cache._replace(page_table=table,
                          next_page=cache.next_page + jnp.sum(extra))


def write_tokens(cache: PagedKVCache, layer: int, k_new: jnp.ndarray,
                 v_new: jnp.ndarray) -> PagedKVCache:
    """Write (B, T, Hkv, hd) at each row's current length (single-token or
    small-T decode writes; pages must already be allocated)."""
    B, T, Hkv, hd = k_new.shape
    ps = cache.page_size
    pos = cache.lengths[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    page_slot = pos // ps                       # (B, T) logical page index
    offset = pos % ps
    phys = jnp.take_along_axis(cache.page_table, page_slot, axis=1)  # (B,T)

    k_pages = cache.k_pages
    v_pages = cache.v_pages
    flat_idx = (phys * ps + offset).reshape(-1)  # (B*T,) into (n_pages*ps)
    L, NP = k_pages.shape[0], k_pages.shape[1]
    k_flat = k_pages[layer].reshape(NP * ps, Hkv, hd)
    v_flat = v_pages[layer].reshape(NP * ps, Hkv, hd)
    k_flat = k_flat.at[flat_idx].set(k_new.reshape(-1, Hkv, hd))
    v_flat = v_flat.at[flat_idx].set(v_new.reshape(-1, Hkv, hd))
    k_pages = k_pages.at[layer].set(k_flat.reshape(NP, ps, Hkv, hd))
    v_pages = v_pages.at[layer].set(v_flat.reshape(NP, ps, Hkv, hd))
    return cache._replace(k_pages=k_pages, v_pages=v_pages)


def gather_row_kv(cache: PagedKVCache, layer: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Materialize (B, max_len, Hkv, hd) k/v plus a validity mask from the
    page tables (max_len = max_pages_per_row * page_size, static)."""
    B, MP = cache.page_table.shape
    ps = cache.page_size
    phys = jnp.maximum(cache.page_table, 0)  # null page for -1 entries
    k = cache.k_pages[layer][phys]           # (B, MP, ps, Hkv, hd)
    v = cache.v_pages[layer][phys]
    Hkv, hd = k.shape[-2:]
    k = k.reshape(B, MP * ps, Hkv, hd)
    v = v.reshape(B, MP * ps, Hkv, hd)
    pos = jnp.arange(MP * ps, dtype=jnp.int32)[None, :]
    valid = pos < cache.lengths[:, None]
    return k, v, valid


def advance_lengths(cache: PagedKVCache, t: int) -> PagedKVCache:
    return cache._replace(lengths=cache.lengths + t)
