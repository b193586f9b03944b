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
