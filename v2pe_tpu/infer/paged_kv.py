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

from typing import NamedTuple, Optional, Tuple

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
    # quantized modes (kv_dtype="int8"/"int4"): per-(layer, head, token)
    # fp32 dequantization scales, (L, Hkv, n_pages, 1, page_size) — the page's
    # token scales live on the LANE (minor) dim. Layout matters twice:
    # (a) a trailing singleton ((..., ps, 1)) gets lane-padded 128x by
    # XLA's (8,128) tiling — measured 102 MB of scales ballooning to
    # 12.19 GiB of HBM at 128k; (b) with tokens on lanes the kernel folds
    # the scales straight into the (Hkv, R, ps) score matrix (k's before
    # the softmax, v's into e) with a same-layout broadcast — no page
    # dequant, no relayout. Halving the KV bytes doubles the decodable
    # context per chip (the 2B model's bf16 KV is 96 KB/token — 12.6 GB at
    # 128k, which plus the weights does not fit one v5e; int8 + scales
    # does) and halves the page DMA traffic of the decode kernel.
    k_scales: Optional[jnp.ndarray] = None
    v_scales: Optional[jnp.ndarray] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def max_pages_per_row(self) -> int:
        return self.page_table.shape[1]

    @property
    def n_shards(self) -> int:
        return self.next_page.shape[0]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None

    @property
    def kv_bits(self) -> int:
        """Quantization width of the pool: 8 (int8) or 4 (int4, the
        hardware-packed ``jnp.int4`` dtype — the TPU stores 8 nibbles per
        32-bit word, layout T(...)(8,1), so the pool truly occupies half
        the int8 bytes and the decode kernel's page DMA — the long-context
        bottleneck — halves again). Meaningless when not quantized."""
        return 4 if self.k_pages.dtype == jnp.int4 else 8

    @staticmethod
    def zeros(cfg: LLMConfig, batch: int, n_pages: int, page_size: int,
              max_pages_per_row: int, dtype=jnp.bfloat16,
              n_shards: int = 1, kv_dtype=None) -> "PagedKVCache":
        assert n_pages % n_shards == 0, (n_pages, n_shards)
        shape = (cfg.num_hidden_layers, cfg.num_key_value_heads, n_pages,
                 page_size, cfg.head_dim)
        quant = kv_dtype in ("int8", "int4", jnp.int8, jnp.int4)
        if quant:
            dtype = jnp.int4 if kv_dtype in ("int4", jnp.int4) else jnp.int8
            if dtype == jnp.int4:
                # sub-byte layout-metadata workaround for experimental PJRT
                # clients (no-op elsewhere); the pool crosses a jit
                # boundary every decode step
                from v2pe_tpu.utils import int4_compat

                int4_compat.install()
        elif kv_dtype is not None:
            dtype = kv_dtype
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
            k_scales=jnp.zeros(shape[:3] + (1, page_size), jnp.float32)
            if quant else None,
            v_scales=jnp.zeros(shape[:3] + (1, page_size), jnp.float32)
            if quant else None,
        )


def quantize_kv(x: jnp.ndarray, bits: int = 8):
    """Symmetric int8/int4 quantization with a per-vector (last-dim, i.e.
    per-token-per-head) fp32 scale: returns (int values, scales with the
    last dim kept as a singleton). ``bits=4`` emits the native ``jnp.int4``
    dtype (hardware nibble-packed on TPU) with qmax 7."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    qmax = 7.0 if bits == 4 else 127.0
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -qmax, qmax)
    return q.astype(jnp.int4 if bits == 4 else jnp.int8), scale


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
    # idempotent: slots that already hold a page keep it (a session that
    # rolls generated tokens back by resetting lengths reuses the pages
    # its decode allocated instead of leaking them from the bump head)
    take &= cache.page_table == -1
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

    ksc = vsc = None
    if cache.quantized:
        k_new, ksc = quantize_kv(k_new, cache.kv_bits)  # (L, B, T, Hkv, 1)
        v_new, vsc = quantize_kv(v_new, cache.kv_bits)
    sshape = None if not cache.quantized else cache.k_scales.shape

    if T == 1:
        # decode fast path: per-row dynamic_update_slice — XLA updates the
        # donated pool IN PLACE (an .at[] scatter copied ~GBs per token)
        idx = jnp.clip(phys[:, 0] * ps + offset[:, 0], 0, NP * ps - 1)

        def upd1(pages, new, width, shape):
            flat = pages.reshape(L, Hkv, NP * ps, width)
            for b in range(B):
                val = jnp.swapaxes(new[:, b], 1, 2).astype(flat.dtype)
                cur = jax.lax.dynamic_slice(
                    flat, (0, 0, idx[b], 0), (L, Hkv, 1, width))
                val = jnp.where(valid[b, 0], val, cur)
                flat = jax.lax.dynamic_update_slice(
                    flat, val, (0, 0, idx[b], 0))
            return flat.reshape(shape)

        out = cache._replace(
            k_pages=upd1(cache.k_pages, k_new, hd, cache.k_pages.shape),
            v_pages=upd1(cache.v_pages, v_new, hd, cache.v_pages.shape))
        if cache.quantized:
            # scale pools are (L, Hkv, NP, 1, ps): same flat token order
            out = out._replace(
                k_scales=upd1(cache.k_scales, ksc, 1, sshape),
                v_scales=upd1(cache.v_scales, vsc, 1, sshape))
        return out

    flat_idx = jnp.where(valid, phys * ps + offset, NP * ps)  # OOB -> drop
    flat_idx = flat_idx.reshape(-1)

    # (L, Hkv, NP*ps, hd) flat view; values (L, Hkv, B*T, hd)
    def scat(pages, new, width, shape):
        flat = pages.reshape(L, Hkv, NP * ps, width)
        vals = jnp.moveaxis(new, 3, 1).reshape(L, Hkv, B * T, width)
        flat = flat.at[:, :, flat_idx].set(vals.astype(flat.dtype),
                                           mode="drop")
        return flat.reshape(shape)

    out = cache._replace(
        k_pages=scat(cache.k_pages, k_new, hd, cache.k_pages.shape),
        v_pages=scat(cache.v_pages, v_new, hd, cache.v_pages.shape))
    if cache.quantized:
        out = out._replace(k_scales=scat(cache.k_scales, ksc, 1, sshape),
                           v_scales=scat(cache.v_scales, vsc, 1, sshape))
    return out


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
    cache = cache._replace(k_pages=k_pages, v_pages=v_pages)
    if cache.quantized:
        cache = cache._replace(
            k_scales=cache.k_scales.at[layer].set(out.k_scales[layer]),
            v_scales=cache.v_scales.at[layer].set(out.v_scales[layer]))
    return cache


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
    if cache.quantized:
        # f32 dequant — exactly what the kernel computes in VMEM. Scale
        # pools are (Hkv, NP, 1, ps): token scales on the lane dim.
        ks = cache.k_scales[layer][:, phys, 0]     # (Hkv, B, MP, ps)
        vs = cache.v_scales[layer][:, phys, 0]
        k = k.astype(jnp.float32) * ks[..., None]
        v = v.astype(jnp.float32) * vs[..., None]
    Hkv, hd = k.shape[0], k.shape[-1]
    k = jnp.moveaxis(k, 0, 3).reshape(B, MP * ps, Hkv, hd)
    v = jnp.moveaxis(v, 0, 3).reshape(B, MP * ps, Hkv, hd)
    pos = jnp.arange(MP * ps, dtype=jnp.int32)[None, :]
    valid = pos < cache.lengths[:, None]
    return k, v, valid


def advance_lengths(cache: PagedKVCache, t) -> PagedKVCache:
    return cache._replace(lengths=cache.lengths + t)


