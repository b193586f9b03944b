"""Chunked prefill onto a nonempty paged cache: the multi-turn /
streaming-prompt serving path (page-sweep kernel + logsumexp merge with
chunk self-attention) must reproduce the one-shot teacher-forced forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.core.config import debug_tiny
from v2pe_tpu.infer import paged_kv as pk
from v2pe_tpu.infer.chunked_prefill import chunked_prefill
from v2pe_tpu.models.internlm2 import llm_forward
from v2pe_tpu.models.params import init_llm_params


@pytest.fixture(scope="module")
def model():
    cfg = debug_tiny(vocab_size=300).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    S_total = 60
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S_total), 0, 300)
    pos = jnp.arange(S_total, dtype=jnp.float32)[None]
    full, _ = llm_forward(params, cfg, input_ids=ids, rope_pos_ids=pos,
                          attn_impl="jnp")
    return cfg, params, ids, pos, full


def _fresh_cache(cfg, kv_dtype=None):
    return pk.PagedKVCache.zeros(cfg, batch=1, n_pages=32, page_size=8,
                                 max_pages_per_row=12, dtype=jnp.float32,
                                 kv_dtype=kv_dtype)


@pytest.mark.parametrize("splits", [(22, 38), (18, 20, 22), (25, 17, 18)])
def test_chunked_matches_full(model, splits):
    cfg, params, ids, pos, full = model
    assert sum(splits) == ids.shape[1]
    cache = _fresh_cache(cfg)
    off = 0
    for S_c in splits:
        logits, cache = chunked_prefill(
            params, cfg, cache, input_ids=ids[:, off:off + S_c],
            rope_pos_ids=pos[:, off:off + S_c], attn_impl="jnp")
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, off:off + S_c]),
            rtol=2e-5, atol=2e-5, err_msg=f"chunk at {off}+{S_c}")
        off += S_c
    assert int(cache.lengths[0]) == ids.shape[1]

    # and decode continues correctly off the chunked cache
    t = ids.shape[1] - 1
    step, cache2 = llm_forward(
        params, cfg, input_ids=ids[:, t:t + 1], rope_pos_ids=pos[:, t:t + 1],
        paged_cache=cache._replace(
            lengths=cache.lengths - 1))  # re-feed last token as decode
    # (kv for slot t gets overwritten with identical values)
    np.testing.assert_allclose(np.asarray(step[:, 0]),
                               np.asarray(full[:, t]), rtol=2e-5, atol=2e-5)


def test_chunked_prefill_int8_close(model):
    cfg, params, ids, pos, full = model
    cache = _fresh_cache(cfg, kv_dtype="int8")
    off = 0
    for S_c in (25, 35):
        logits, cache = chunked_prefill(
            params, cfg, cache, input_ids=ids[:, off:off + S_c],
            rope_pos_ids=pos[:, off:off + S_c], attn_impl="jnp")
        off += S_c
    # second chunk read the first through the quantized pool
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, 25:]),
                               rtol=0.25, atol=0.25)
    assert np.mean(np.abs(np.asarray(logits) - np.asarray(full[:, 25:]))) \
        < 0.02


@pytest.mark.slow
def test_chunked_prefill_under_tp_mesh(model, jax8):
    """Chunked prefill under a tensor-parallel context (q heads + pool kv
    heads sharded, per-shard self+page merge) matches single-device."""
    import numpy as np
    from jax.sharding import Mesh

    from v2pe_tpu.parallel import context as pctx

    cfg, params, ids, pos, full = model

    def run(ctx):
        cache = _fresh_cache(cfg)
        off, out = 0, None
        with pctx.use_sharding(ctx):
            for S_c in (25, 35):
                out, cache = chunked_prefill(
                    params, cfg, cache, input_ids=ids[:, off:off + S_c],
                    rope_pos_ids=pos[:, off:off + S_c], attn_impl="jnp")
                off += S_c
        return np.asarray(out)

    ref = run(None)
    # tensor=2 (debug_tiny: Hq=4, Hkv=2 — both divisible), seq=1
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2),
                ("seq", "tensor"))
    got = run(pctx.ShardingContext(mesh=mesh))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_chunked_prefill_under_seq_mesh(model, jax8):
    """Chunked prefill with the pool seq-sharded (the 1M serving layout):
    local page sweeps + self-attention merge via the ring lse contract
    across shards; must match single-device."""
    import numpy as np
    from jax.sharding import Mesh

    from v2pe_tpu.parallel import context as pctx

    cfg, params, ids, pos, full = model

    def run(ctx, n_shards):
        cache = pk.PagedKVCache.zeros(cfg, batch=1, n_pages=32, page_size=8,
                                      max_pages_per_row=12,
                                      dtype=jnp.float32, n_shards=n_shards)
        off, out = 0, None
        with pctx.use_sharding(ctx):
            for S_c in (25, 35):
                out, cache = chunked_prefill(
                    params, cfg, cache, input_ids=ids[:, off:off + S_c],
                    rope_pos_ids=pos[:, off:off + S_c], attn_impl="jnp")
                off += S_c
        return np.asarray(out)

    ref = run(None, 1)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("seq", "tensor"))
    got = run(pctx.ShardingContext(mesh=mesh), 4)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_chunked_ragged_rows(model):
    """Right-padded chunks (segment 0): pad slots neither write pages nor
    shift later chunks' positions."""
    cfg, params, _, _, _ = model
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 48), 0, 300)
    lens_row = np.asarray([48, 41])
    pos_full = jnp.broadcast_to(jnp.arange(48, dtype=jnp.float32), (2, 48))
    seg_full = (jnp.arange(48)[None] < lens_row[:, None]).astype(jnp.int32)
    full, _ = llm_forward(params, cfg, input_ids=ids, rope_pos_ids=pos_full,
                          segment_ids=seg_full, attn_impl="jnp")

    cache = pk.PagedKVCache.zeros(cfg, batch=2, n_pages=64, page_size=8,
                                  max_pages_per_row=12, dtype=jnp.float32)
    # chunk 1: first 28 tokens of each row (all valid); chunk 2: row 0 the
    # remaining 20 valid, row 1 the remaining 13 valid + 7 pad
    c1 = 28
    logits1, cache = chunked_prefill(
        params, cfg, cache, input_ids=ids[:, :c1],
        rope_pos_ids=pos_full[:, :c1], attn_impl="jnp")
    rest = 48 - c1
    ids2 = np.zeros((2, rest), np.int32)
    pos2 = np.zeros((2, rest), np.float32)
    seg2 = np.zeros((2, rest), np.int32)
    for b in range(2):
        nv = lens_row[b] - c1
        ids2[b, :nv] = np.asarray(ids[b, c1:lens_row[b]])
        pos2[b, :nv] = np.arange(c1, lens_row[b], dtype=np.float32)
        seg2[b, :nv] = 1
    logits2, cache = chunked_prefill(
        params, cfg, cache, input_ids=jnp.asarray(ids2),
        rope_pos_ids=jnp.asarray(pos2), segment_ids=jnp.asarray(seg2),
        attn_impl="jnp")
    assert list(np.asarray(cache.lengths)) == [48, 41]
    for b in range(2):
        nv = lens_row[b] - c1
        np.testing.assert_allclose(
            np.asarray(logits2[b, :nv]),
            np.asarray(full[b, c1:lens_row[b]]), rtol=2e-5, atol=2e-5,
            err_msg=f"row {b}")
