"""Decode under a device mesh: dense decode with tensor/fsdp-sharded params
(GSPMD partitions the grouped einsums) and the paged kernel under shard_map
over the tensor axis must both reproduce single-device decode exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2pe_tpu.core.config import LLMConfig
from v2pe_tpu.infer import paged_kv as pk
from v2pe_tpu.models.params import init_llm_params
from v2pe_tpu.ops.paged_attention import (paged_decode_attention,
                                          sharded_paged_decode_attention)


def _cfg():
    return LLMConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=4)  # Hkv divisible by tensor=2


def test_sharded_paged_kernel_matches_single(jax8):
    cfg = _cfg()
    Hkv, hd, Hq = (cfg.num_key_value_heads, cfg.head_dim,
                   cfg.num_attention_heads)
    B, S = 2, 23
    rng = np.random.RandomState(0)
    lengths = jnp.asarray([S, 11], jnp.int32)
    cache = pk.PagedKVCache.zeros(cfg, batch=B, n_pages=32, page_size=8,
                                  max_pages_per_row=8, dtype=jnp.float32)
    cache = pk.allocate_rows(cache, lengths)
    k_hist = rng.randn(cfg.num_hidden_layers, B, S, Hkv, hd
                       ).astype(np.float32)
    v_hist = rng.randn(cfg.num_hidden_layers, B, S, Hkv, hd
                       ).astype(np.float32)
    cache = pk.write_all_layers(cache, jnp.asarray(k_hist),
                                jnp.asarray(v_hist), valid_t=lengths)
    cache = cache._replace(lengths=lengths)

    q = jnp.asarray(rng.randn(B, 1, Hq, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, 1, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, 1, Hkv, hd), jnp.float32)

    ref = paged_decode_attention(q, k_new, v_new, cache.k_pages,
                                 cache.v_pages, cache.page_table,
                                 cache.lengths, jnp.int32(0), interpret=True)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("fsdp", "tensor"))
    got = sharded_paged_decode_attention(
        mesh, "tensor", q, k_new, v_new, cache.k_pages, cache.v_pages,
        cache.page_table, cache.lengths, jnp.int32(0), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_dense_generate_under_mesh_matches_single(jax8):
    """generate() with tensor+fsdp-sharded params == single-device tokens
    (GSPMD partitions the decode einsums; no code changes needed)."""
    from v2pe_tpu.core.config import VisionConfig, VLMConfig
    from v2pe_tpu.infer.generate import GenerationConfig, generate
    from v2pe_tpu.models.params import init_vlm_params
    from v2pe_tpu.parallel.mesh import param_sharding

    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=_cfg())
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    nit = cfg.num_image_token
    ids = np.concatenate([np.arange(10, 20), [250], [251] * nit, [252],
                          np.arange(30, 35)]).astype(np.int32)[None]
    S = ids.shape[1]
    pos = np.broadcast_to(np.arange(S, dtype=np.float32), (1, S))
    pixels = np.random.RandomState(0).randn(1, 3, 56, 56).astype(np.float32)
    gc = GenerationConfig(max_new_tokens=4)
    args = (cfg, gc, jnp.asarray(ids), jnp.asarray([S], jnp.int32),
            jnp.asarray(pos), jnp.asarray(pixels), jnp.ones((1,), jnp.int32),
            251)
    tok_ref, *_ = generate(params, *args, attn_impl="jnp")

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                ("fsdp", "tensor"))
    sharded = jax.device_put(params, param_sharding(params, mesh))
    tok_mesh, *_ = generate(sharded, *args, attn_impl="jnp")
    np.testing.assert_array_equal(np.asarray(tok_ref), np.asarray(tok_mesh))


# ---------------------------------------------------------------------------
# round 3: sequence-sharded paged decode (page pool over the 'seq' axis)
# ---------------------------------------------------------------------------


def _seq_cache(cfg, B, lengths, n_shards, rng, n_pages=32, ps=8, MP=8):
    cache = pk.PagedKVCache.zeros(cfg, batch=B, n_pages=n_pages,
                                  page_size=ps, max_pages_per_row=MP,
                                  dtype=jnp.float32, n_shards=n_shards)
    cache = pk.allocate_rows(cache, lengths)
    S = int(jnp.max(lengths))
    k_hist = rng.randn(cfg.num_hidden_layers, B, S,
                       cfg.num_key_value_heads, cfg.head_dim
                       ).astype(np.float32)
    v_hist = rng.randn(cfg.num_hidden_layers, B, S,
                       cfg.num_key_value_heads, cfg.head_dim
                       ).astype(np.float32)
    cache = pk.write_all_layers(cache, jnp.asarray(k_hist),
                                jnp.asarray(v_hist), valid_t=lengths)
    return cache._replace(lengths=lengths)


def test_allocate_rows_round_robin_placement():
    cfg = _cfg()
    n = 4
    cache = pk.PagedKVCache.zeros(cfg, batch=2, n_pages=32, page_size=8,
                                  max_pages_per_row=8, dtype=jnp.float32,
                                  n_shards=n)
    cache = pk.allocate_rows(cache, jnp.asarray([40, 24], jnp.int32))
    NPl = 32 // n
    pt = np.asarray(cache.page_table)
    # row slot s must land on shard s % n
    for b, pages in enumerate([5, 3]):
        for s in range(pages):
            assert pt[b, s] // NPl == s % n, (b, s, pt)
            # every shard's local page 0 is its reserved null page
            assert pt[b, s] % NPl != 0, (b, s, pt)
        assert (pt[b, pages:] == -1).all()
    # shard heads advanced by their allocation counts (each starts at +1)
    heads = np.asarray(cache.next_page)
    assert heads[0] == 0 * NPl + 1 + 3  # row0 slots {0,4} + row1 slot {0}
    assert heads[1] == 1 * NPl + 1 + 2


@pytest.mark.parametrize("tensor", [1, 2])
def test_seq_sharded_paged_decode_matches_single(jax8, tensor):
    from v2pe_tpu.ops.paged_attention import (
        seq_sharded_paged_decode_attention, seq_sharded_store_fresh_token,
        store_fresh_token)

    cfg = _cfg()
    Hkv, hd, Hq = (cfg.num_key_value_heads, cfg.head_dim,
                   cfg.num_attention_heads)
    B = 2
    n_seq = 4
    lengths = jnp.asarray([23, 11], jnp.int32)
    rng = np.random.RandomState(1)
    cache = _seq_cache(cfg, B, lengths, n_seq, rng)

    q = jnp.asarray(rng.randn(B, 1, Hq, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, 1, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, 1, Hkv, hd), jnp.float32)

    # reference: single-device store-then-attend on the same pool
    kp_ref, vp_ref = store_fresh_token(
        k_new, v_new, cache.k_pages, cache.v_pages, cache.page_table,
        cache.lengths, jnp.int32(1), interpret=True)
    ref = paged_decode_attention(
        q, None, None, kp_ref, vp_ref, cache.page_table, cache.lengths,
        jnp.int32(1), interpret=True, fresh_in_pages=True)

    mesh = Mesh(np.array(jax.devices()[:4 * tensor]).reshape(4, tensor),
                ("seq", "tensor"))
    kp, vp = seq_sharded_store_fresh_token(
        mesh, "seq", "tensor", k_new, v_new, cache.k_pages, cache.v_pages,
        cache.page_table, cache.lengths, jnp.int32(1), interpret=True)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kp_ref))
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vp_ref))
    got = seq_sharded_paged_decode_attention(
        mesh, "seq", "tensor", q, None, None, kp, vp, cache.page_table,
        cache.lengths, jnp.int32(1), interpret=True, fresh_in_pages=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_seq_sharded_separate_fresh_matches_single(jax8):
    """T>1 separate-fresh path: the fresh fold must count exactly once
    across shards (fold gate on shard 0)."""
    from v2pe_tpu.ops.paged_attention import (
        seq_sharded_paged_decode_attention)

    cfg = _cfg()
    Hkv, hd, Hq = (cfg.num_key_value_heads, cfg.head_dim,
                   cfg.num_attention_heads)
    B, T = 2, 4
    lengths = jnp.asarray([23, 11], jnp.int32)
    rng = np.random.RandomState(2)
    cache = _seq_cache(cfg, B, lengths, 4, rng)

    q = jnp.asarray(rng.randn(B, T, Hq, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, T, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, T, Hkv, hd), jnp.float32)

    ref = paged_decode_attention(
        q, k_new, v_new, cache.k_pages, cache.v_pages, cache.page_table,
        cache.lengths, jnp.int32(0), interpret=True)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1),
                ("seq", "tensor"))
    got = seq_sharded_paged_decode_attention(
        mesh, "seq", "tensor", q, k_new, v_new, cache.k_pages,
        cache.v_pages, cache.page_table, cache.lengths, jnp.int32(0),
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_llm_decode_seq_sharded_token_exact(jax8):
    """Full llm_forward paged decode under a seq=4 mesh context reproduces
    the unsharded token stream (the 1M-serving layout at toy scale)."""
    from v2pe_tpu.models.internlm2 import llm_forward
    from v2pe_tpu.parallel import context as pctx

    cfg = _cfg()
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    B, S_prompt, n_new = 1, 13, 5
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S_prompt), 0,
                             cfg.vocab_size)

    def run(mesh_ctx, n_shards):
        cache = pk.PagedKVCache.zeros(cfg, batch=B, n_pages=32, page_size=4,
                                      max_pages_per_row=16,
                                      dtype=jnp.float32, n_shards=n_shards)
        lens = jnp.full((B,), S_prompt, jnp.int32)
        cache = pk.allocate_rows(cache, lens)
        pos = jnp.arange(S_prompt, dtype=jnp.float32)[None]
        with pctx.use_sharding(mesh_ctx):
            logits, cache = llm_forward(params, cfg, input_ids=ids,
                                        rope_pos_ids=pos, paged_cache=cache,
                                        attn_impl="jnp")
            cache = cache._replace(lengths=lens)
            toks = [int(jnp.argmax(logits[0, -1]))]
            for t in range(n_new - 1):
                cache = pk.allocate_rows(cache, jnp.ones((B,), jnp.int32))
                tok = jnp.asarray([[toks[-1]]], jnp.int32)
                posn = cache.lengths.astype(jnp.float32)[:, None]
                logits, cache = llm_forward(params, cfg, input_ids=tok,
                                            rope_pos_ids=posn,
                                            paged_cache=cache,
                                            attn_impl="jnp")
                cache = pk.advance_lengths(cache, 1)
                toks.append(int(jnp.argmax(logits[0, -1])))
        return toks

    ref = run(None, 1)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 1, 4, 2),
                ("data", "fsdp", "seq", "tensor"))
    got = run(pctx.ShardingContext(mesh=mesh), 4)
    assert got == ref, (got, ref)


@pytest.mark.slow
def test_generate_paged_under_seq_mesh(jax8):
    """generate(cache_mode='paged') inside a seq-sharded context must build
    its pool with the mesh's n_shards (an n_shards=1 pool under a seq mesh
    silently dropped pages from attention — review regression test) and
    reproduce the unsharded token stream."""
    from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
    from v2pe_tpu.infer.generate import GenerationConfig, generate
    from v2pe_tpu.models.params import init_vlm_params
    from v2pe_tpu.parallel import context as pctx

    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=300, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4))
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    nit = cfg.num_image_token
    ids = np.concatenate([np.arange(10, 22), [290], [291] * nit, [292],
                          np.arange(30, 39)]).astype(np.int32)[None]
    S = ids.shape[1]
    pos = np.arange(S, dtype=np.float32)[None]
    pixels = np.random.RandomState(0).randn(1, 3, 56, 56).astype(np.float32)
    gc = GenerationConfig(max_new_tokens=5)
    args = (params, cfg, gc, jnp.asarray(ids),
            jnp.asarray([S], jnp.int32), jnp.asarray(pos),
            jnp.asarray(pixels), jnp.ones((1,), jnp.int32), 291)

    ref, n_ref, _ = generate(*args, attn_impl="jnp", cache_mode="paged",
                             page_size=4)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(1, 1, 4, 2),
                ("data", "fsdp", "seq", "tensor"))
    with pctx.use_sharding(pctx.ShardingContext(mesh=mesh)):
        got, n_got, _ = generate(*args, attn_impl="jnp",
                                 cache_mode="paged", page_size=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert int(n_got) == int(n_ref)
