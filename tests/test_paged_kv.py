"""Paged KV cache: allocation, writes, gather round trip, and decode parity
against the dense static cache."""

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.infer.paged_kv import (PagedKVCache, advance_lengths,
                                     allocate_rows, gather_row_kv,
                                     write_tokens)
from v2pe_tpu.core.config import debug_tiny


def test_alloc_and_write_roundtrip():
    cfg = debug_tiny(vocab_size=100).llm
    cache = PagedKVCache.zeros(cfg, batch=2, n_pages=32, page_size=8,
                               max_pages_per_row=8, dtype=jnp.float32)
    # row 0 gets 13 tokens, row 1 gets 5
    lengths = jnp.asarray([13, 5], jnp.int32)
    cache = allocate_rows(cache, lengths)
    # pages: row0 needs 2, row1 needs 1 -> shard-0 head = 1 + 3
    assert int(cache.next_page[0]) == 4
    assert int(cache.page_table[0, 0]) >= 1
    assert int(cache.page_table[0, 1]) >= 1
    assert int(cache.page_table[1, 1]) == -1

    rng = np.random.RandomState(0)
    k0 = rng.randn(2, 13, cfg.num_key_value_heads, cfg.head_dim
                   ).astype(np.float32)
    # write 13 for row0 / first 5 valid for row1 (extra writes padpages)
    cache = write_tokens(cache, 0, jnp.asarray(k0), jnp.asarray(k0))
    cache = advance_lengths(cache, 0)  # lengths managed explicitly below
    cache = cache._replace(lengths=lengths)

    k, v, valid = gather_row_kv(cache, 0)
    np.testing.assert_allclose(np.asarray(k[0, :13]), k0[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k[1, :5]), k0[1, :5], rtol=1e-6)
    assert bool(valid[0, 12]) and not bool(valid[0, 13])
    assert bool(valid[1, 4]) and not bool(valid[1, 5])


def test_incremental_decode_writes():
    cfg = debug_tiny(vocab_size=100).llm
    cache = PagedKVCache.zeros(cfg, batch=1, n_pages=16, page_size=4,
                               max_pages_per_row=6, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    all_k = []
    for t in range(10):  # crosses page boundaries at 4 and 8
        cache = allocate_rows(cache, jnp.asarray([1], jnp.int32))
        k_t = rng.randn(1, 1, cfg.num_key_value_heads, cfg.head_dim
                        ).astype(np.float32)
        all_k.append(k_t)
        cache = write_tokens(cache, 1, jnp.asarray(k_t), jnp.asarray(k_t))
        cache = advance_lengths(cache, 1)
    k, _, valid = gather_row_kv(cache, 1)
    ref = np.concatenate(all_k, axis=1)[0]
    np.testing.assert_allclose(np.asarray(k[0, :10]), ref, rtol=1e-6)
    assert int(valid.sum()) == 10


def test_paged_attention_matches_dense():
    """Flash attention over gathered pages == dense cache attention."""
    from v2pe_tpu.ops.attention import flash_attention

    cfg = debug_tiny(vocab_size=100).llm
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    S = 11
    rng = np.random.RandomState(2)
    k_hist = rng.randn(1, S, Hkv, hd).astype(np.float32)
    v_hist = rng.randn(1, S, Hkv, hd).astype(np.float32)
    q = jnp.asarray(rng.randn(1, 1, cfg.num_attention_heads, hd)
                    .astype(np.float32))

    cache = PagedKVCache.zeros(cfg, batch=1, n_pages=8, page_size=4,
                               max_pages_per_row=4, dtype=jnp.float32)
    cache = allocate_rows(cache, jnp.asarray([S], jnp.int32))
    cache = write_tokens(cache, 0, jnp.asarray(k_hist), jnp.asarray(v_hist))
    cache = advance_lengths(cache, S)

    k, v, valid = gather_row_kv(cache, 0)
    q_pos = jnp.asarray([[S - 1]], jnp.int32)
    kv_pos = jnp.broadcast_to(jnp.arange(k.shape[1], dtype=jnp.int32),
                              (1, k.shape[1]))
    out = flash_attention(
        q, k, v, q_segment_ids=jnp.ones((1, 1), jnp.int32),
        kv_segment_ids=valid.astype(jnp.int32),
        q_positions=q_pos, kv_positions=kv_pos,
        causal=True, impl="jnp")

    ref = flash_attention(
        q, jnp.asarray(k_hist), jnp.asarray(v_hist),
        q_positions=q_pos, causal=True, impl="jnp")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
