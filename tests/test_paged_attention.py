"""Pallas paged-decode attention kernel: parity vs dense attention over the
gathered pages, across fresh-token counts, GQA geometry, page boundaries,
and ragged batches (interpret mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.core.config import LLMConfig
from v2pe_tpu.infer import paged_kv as pk
from v2pe_tpu.ops.attention_ref import attention_reference
from v2pe_tpu.ops.paged_attention import paged_decode_attention


def _cfg(L=2, Hq=4, Hkv=2, hd=16):
    return LLMConfig(vocab_size=100, hidden_size=Hq * hd,
                     intermediate_size=64, num_hidden_layers=L,
                     num_attention_heads=Hq, num_key_value_heads=Hkv)


def _build(cfg, lengths, page_size, max_pages, n_pages=64, dtype=np.float32,
           seed=0):
    B = len(lengths)
    Hkv, hd, L = (cfg.num_key_value_heads, cfg.head_dim,
                  cfg.num_hidden_layers)
    S = max(lengths)
    rng = np.random.RandomState(seed)
    k_hist = rng.randn(L, B, S, Hkv, hd).astype(dtype)
    v_hist = rng.randn(L, B, S, Hkv, hd).astype(dtype)
    lengths = jnp.asarray(lengths, jnp.int32)
    cache = pk.PagedKVCache.zeros(cfg, batch=B, n_pages=n_pages,
                                  page_size=page_size,
                                  max_pages_per_row=max_pages,
                                  dtype=jnp.asarray(k_hist).dtype)
    cache = pk.allocate_rows(cache, lengths)
    cache = pk.write_all_layers(cache, jnp.asarray(k_hist),
                                jnp.asarray(v_hist), valid_t=lengths)
    cache = cache._replace(lengths=lengths)
    return cache, k_hist, v_hist


def _dense_ref(layer, k_hist, v_hist, lengths, q, k_new, v_new):
    B, T = q.shape[:2]
    S = k_hist.shape[2]
    k_full = jnp.concatenate([jnp.asarray(k_hist[layer]), k_new], axis=1)
    v_full = jnp.concatenate([jnp.asarray(v_hist[layer]), v_new], axis=1)
    kv_pos = jnp.broadcast_to(jnp.arange(S + T, dtype=jnp.int32), (B, S + T))
    kv_seg = jnp.where((kv_pos < lengths[:, None]) | (kv_pos >= S), 1, 0)
    q_pos = S + jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    return attention_reference(
        q, k_full, v_full, q_segment_ids=jnp.ones((B, T), jnp.int32),
        kv_segment_ids=kv_seg, causal=True,
        q_positions=q_pos, kv_positions=kv_pos)


@pytest.mark.parametrize("T", [1, 4])
@pytest.mark.parametrize("lengths,page_size,max_pages", [
    ([23, 13], 8, 8),
    ([64, 1], 8, 16),      # exact page boundary + minimal row
    ([17, 40], 16, 4),
])
def test_paged_decode_parity(T, lengths, page_size, max_pages):
    cfg = _cfg()
    cache, k_hist, v_hist = _build(cfg, lengths, page_size, max_pages)
    B = len(lengths)
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(B, T, cfg.num_attention_heads, cfg.head_dim)
                    .astype(np.float32))
    k_new = jnp.asarray(rng.randn(B, T, cfg.num_key_value_heads, cfg.head_dim)
                        .astype(np.float32))
    v_new = jnp.asarray(rng.randn(B, T, cfg.num_key_value_heads, cfg.head_dim)
                        .astype(np.float32))
    for layer in range(cfg.num_hidden_layers):
        out = paged_decode_attention(
            q, k_new, v_new, cache.k_pages, cache.v_pages, cache.page_table,
            cache.lengths, jnp.int32(layer), interpret=True)
        ref = _dense_ref(layer, k_hist, v_hist, cache.lengths, q, k_new,
                         v_new)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6)


def test_paged_decode_parity_bf16_gqa128():
    """Production-like geometry: hd=128, G=2, bf16 pool."""
    cfg = _cfg(L=1, Hq=4, Hkv=2, hd=128)
    cache, k_hist, v_hist = _build(cfg, [100, 37], page_size=64, max_pages=4,
                                   dtype=np.float32)
    cache = cache._replace(k_pages=cache.k_pages.astype(jnp.bfloat16),
                           v_pages=cache.v_pages.astype(jnp.bfloat16))
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 1, 4, 128), jnp.bfloat16)
    k_new = jnp.asarray(rng.randn(2, 1, 2, 128), jnp.bfloat16)
    v_new = jnp.asarray(rng.randn(2, 1, 2, 128), jnp.bfloat16)
    out = paged_decode_attention(
        q, k_new, v_new, cache.k_pages, cache.v_pages, cache.page_table,
        cache.lengths, jnp.int32(0), interpret=True)
    ref = _dense_ref(0, k_hist.astype(np.float32), v_hist.astype(np.float32),
                     cache.lengths, q.astype(jnp.float32),
                     k_new.astype(jnp.float32), v_new.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_write_all_layers_matches_gather():
    """The one-scatter multi-layer write lands tokens exactly where the
    per-layer gather reads them back."""
    cfg = _cfg(L=3)
    lengths = [9, 30]
    cache, k_hist, v_hist = _build(cfg, lengths, page_size=8, max_pages=8)
    for layer in range(3):
        k, v, valid = pk.gather_row_kv(cache, layer)
        for b, ln in enumerate(lengths):
            np.testing.assert_allclose(np.asarray(k[b, :ln]),
                                       k_hist[layer, b, :ln], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(v[b, :ln]),
                                       v_hist[layer, b, :ln], rtol=1e-6)
        assert np.array_equal(np.asarray(valid.sum(axis=1)), lengths)


def test_incremental_decode_write_then_kernel():
    """Token-by-token allocate/write/advance loop crossing page boundaries,
    then the kernel attends over exactly the written history."""
    cfg = _cfg(L=1)
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    cache = pk.PagedKVCache.zeros(cfg, batch=1, n_pages=16, page_size=4,
                                  max_pages_per_row=6, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    all_k, all_v = [], []
    for t in range(10):  # crosses page boundaries at 4 and 8
        cache = pk.allocate_rows(cache, jnp.asarray([1], jnp.int32))
        k_t = rng.randn(1, 1, 1, Hkv, hd).astype(np.float32)
        v_t = rng.randn(1, 1, 1, Hkv, hd).astype(np.float32)
        all_k.append(k_t)
        all_v.append(v_t)
        cache = pk.write_all_layers(cache, jnp.asarray(k_t), jnp.asarray(v_t))
        cache = pk.advance_lengths(cache, 1)
    assert int(cache.lengths[0]) == 10

    q = jnp.asarray(rng.randn(1, 1, cfg.num_attention_heads, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(1, 1, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(1, 1, Hkv, hd), jnp.float32)
    out = paged_decode_attention(
        q, k_new, v_new, cache.k_pages, cache.v_pages, cache.page_table,
        cache.lengths, jnp.int32(0), interpret=True)
    k_hist = np.concatenate(all_k, axis=2)  # (1, 1, 10, Hkv, hd)
    v_hist = np.concatenate(all_v, axis=2)
    ref = _dense_ref(0, k_hist, v_hist, cache.lengths, q, k_new, v_new)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_llm_forward_paged_matches_full_forward():
    """prefill + token-by-token decode through the paged cache must match
    the teacher-forced full forward (the dense-cache contract of
    tests/test_decode.py, now via the page pool)."""
    from v2pe_tpu.core.config import debug_tiny
    from v2pe_tpu.models.internlm2 import llm_forward
    from v2pe_tpu.models.params import init_llm_params

    cfg = debug_tiny(vocab_size=300).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    S_prompt, S_total = 13, 19
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S_total), 0, 300)
    pos = jnp.arange(S_total, dtype=jnp.float32)[None]

    full_logits, _ = llm_forward(params, cfg, input_ids=ids,
                                 rope_pos_ids=pos, attn_impl="jnp")

    cache = pk.PagedKVCache.zeros(cfg, batch=1, n_pages=16, page_size=4,
                                  max_pages_per_row=8, dtype=jnp.float32)
    lens = jnp.asarray([S_prompt], jnp.int32)
    cache = pk.allocate_rows(cache, lens)
    # prefill writes the pages in place and returns the updated cache
    prefill_logits, cache = llm_forward(
        params, cfg, input_ids=ids[:, :S_prompt],
        rope_pos_ids=pos[:, :S_prompt], paged_cache=cache, attn_impl="jnp")
    cache = cache._replace(lengths=lens)
    np.testing.assert_allclose(np.asarray(prefill_logits),
                               np.asarray(full_logits[:, :S_prompt]),
                               rtol=1e-5, atol=1e-5)

    for t in range(S_prompt, S_total):
        cache = pk.allocate_rows(cache, jnp.asarray([1], jnp.int32))
        # write-then-attend: decode returns the updated cache directly
        step_logits, cache = llm_forward(
            params, cfg, input_ids=ids[:, t:t + 1],
            rope_pos_ids=pos[:, t:t + 1], paged_cache=cache, attn_impl="jnp")
        cache = pk.advance_lengths(cache, 1)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]),
            rtol=1e-5, atol=1e-5, err_msg=f"decode step {t}")


def test_llm_forward_paged_long_prompt_in_scan_writes():
    """>16-token prompts take the carried-pool prefill branch (per-layer
    in-scan page scatters, no full-KV temp); pages must hold exactly what
    write_all_layers would have written, and right-padded rows (segment 0)
    must not write their pad slots."""
    from v2pe_tpu.core.config import debug_tiny
    from v2pe_tpu.models.internlm2 import llm_forward
    from v2pe_tpu.models.params import init_llm_params

    cfg = debug_tiny(vocab_size=300).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    B, S = 2, 24
    true_lens = jnp.asarray([24, 19], jnp.int32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, 300)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (B, S))
    seg = (jnp.arange(S)[None, :] < true_lens[:, None]).astype(jnp.int32)

    cache = pk.PagedKVCache.zeros(cfg, batch=B, n_pages=32, page_size=4,
                                  max_pages_per_row=8, dtype=jnp.float32)
    cache = pk.allocate_rows(cache, true_lens)

    logits_a, cache_a = llm_forward(
        params, cfg, input_ids=ids, rope_pos_ids=pos, segment_ids=seg,
        paged_cache=cache, attn_impl="jnp")
    assert isinstance(cache_a, pk.PagedKVCache)

    # golden: reproduce via per-layer capture + write_all_layers
    from v2pe_tpu.models import internlm2 as m

    hidden, _ = llm_forward(params, cfg, input_ids=ids, rope_pos_ids=pos,
                            segment_ids=seg, attn_impl="jnp",
                            return_hidden=True)
    # capture fresh k/v per layer exactly as the model computes them
    from v2pe_tpu.ops.rope import apply_rotary, compute_rope_cos_sin

    cos, sin = compute_rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    x = params["tok_embeddings"][ids]
    ks, vs = [], []
    L = params["layers"]["attention_norm"].shape[0]
    for li in range(L):
        lp = jax.tree.map(lambda a: a[li], params["layers"])
        from v2pe_tpu.ops.norms import rms_norm

        h = rms_norm(x, lp["attention_norm"], cfg.rms_norm_eps)
        qkv = jnp.dot(h, lp["wqkv_kernel"],
                      preferred_element_type=jnp.float32).astype(h.dtype)
        _, k, v = m.split_wqkv(qkv, cfg)
        k = apply_rotary(k, cos, sin)
        ks.append(k)
        vs.append(v)
        x, _ = m.layer_forward(lp, cfg, x, cos, sin, segment_ids=seg,
                               positions=None, attn_impl="jnp")
    cache_b = pk.write_all_layers(cache, jnp.stack(ks), jnp.stack(vs),
                                  valid_t=true_lens)
    np.testing.assert_allclose(np.asarray(cache_a.k_pages),
                               np.asarray(cache_b.k_pages), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(cache_a.v_pages),
                               np.asarray(cache_b.v_pages), rtol=1e-6,
                               atol=1e-6)


def _dense_ref_from_gather(cache, layer, q, k_new, v_new):
    """Reference over the (dequantized) gathered pages — bit-identical
    history to what the kernel reads."""
    k_g, v_g, valid = pk.gather_row_kv(cache, layer)
    B, T = q.shape[:2]
    S = k_g.shape[1]
    if k_new is not None:
        k_g = jnp.concatenate([k_g, k_new.astype(k_g.dtype)], axis=1)
        v_g = jnp.concatenate([v_g, v_new.astype(v_g.dtype)], axis=1)
    kv_pos = jnp.broadcast_to(jnp.arange(k_g.shape[1], dtype=jnp.int32),
                              (B, k_g.shape[1]))
    kv_seg = jnp.where((kv_pos < cache.lengths[:, None]) | (kv_pos >= S),
                       1, 0)
    q_pos = S + jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    return attention_reference(
        q.astype(k_g.dtype), k_g, v_g,
        q_segment_ids=jnp.ones((B, T), jnp.int32),
        kv_segment_ids=kv_seg, causal=True,
        q_positions=q_pos, kv_positions=kv_pos)


@pytest.mark.parametrize("T", [1, 4])
@pytest.mark.parametrize("kv_dtype", ["int8", "int4"])
def test_paged_decode_parity_quantized(T, kv_dtype):
    """int8/int4-quantized pool: the kernel's in-VMEM dequant (scales
    folded on the lane dim) matches dense attention over the dequantized
    gather bit-for-bit; vs the RAW (unquantized) history the int8 pool
    tracks to ~1% and int4 (qmax 7, per-token-per-head scales) to ~6%."""
    cfg = _cfg()
    lengths = [23, 13]
    B = len(lengths)
    Hkv, hd, L = cfg.num_key_value_heads, cfg.head_dim, cfg.num_hidden_layers
    rng = np.random.RandomState(0)
    S = max(lengths)
    k_hist = rng.randn(L, B, S, Hkv, hd).astype(np.float32)
    v_hist = rng.randn(L, B, S, Hkv, hd).astype(np.float32)
    lens = jnp.asarray(lengths, jnp.int32)
    cache = pk.PagedKVCache.zeros(cfg, batch=B, n_pages=64, page_size=8,
                                  max_pages_per_row=8, kv_dtype=kv_dtype)
    assert cache.quantized
    assert cache.k_pages.dtype == (jnp.int4 if kv_dtype == "int4"
                                   else jnp.int8)
    assert cache.kv_bits == (4 if kv_dtype == "int4" else 8)
    cache = pk.allocate_rows(cache, lens)
    cache = pk.write_all_layers(cache, jnp.asarray(k_hist),
                                jnp.asarray(v_hist), valid_t=lens)
    cache = cache._replace(lengths=lens)
    q = jnp.asarray(rng.randn(B, T, cfg.num_attention_heads, hd), jnp.float32)
    k_new = jnp.asarray(rng.randn(B, T, Hkv, hd), jnp.float32)
    v_new = jnp.asarray(rng.randn(B, T, Hkv, hd), jnp.float32)
    for layer in range(L):
        out = paged_decode_attention(
            q, k_new, v_new, cache.k_pages, cache.v_pages, cache.page_table,
            cache.lengths, jnp.int32(layer), interpret=True,
            k_scales=cache.k_scales, v_scales=cache.v_scales)
        ref = _dense_ref_from_gather(cache, layer, q, k_new, v_new)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # and the quantization itself is faithful to the raw history
        raw = _dense_ref(layer, k_hist, v_hist, cache.lengths, q, k_new,
                         v_new)
        tol = 0.05 if kv_dtype == "int8" else 0.30
        dev = float(jnp.max(jnp.abs(out - raw)))
        assert dev < tol, (kv_dtype, layer, dev)


@pytest.mark.slow  # slow interpret sweep; quantized store/decode parity re-certified every round by the paged-decode dryrun check
@pytest.mark.parametrize("kv_dtype", ["int8", "int4"])
def test_store_fresh_token_quantized_roundtrip(kv_dtype):
    """The quantized store kernel writes value AND scale pages in place;
    token-by-token decode over them matches the dequantized-gather dense
    reference (fresh_in_pages causal semantics)."""
    from v2pe_tpu.ops.paged_attention import store_fresh_token

    cfg = _cfg(L=2)
    Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
    cache = pk.PagedKVCache.zeros(cfg, batch=2, n_pages=16, page_size=4,
                                  max_pages_per_row=6, kv_dtype=kv_dtype)
    rng = np.random.RandomState(5)
    hist = []
    for t in range(9):  # crosses page boundaries
        cache = pk.allocate_rows(cache, jnp.asarray([1, 1], jnp.int32))
        k_t = jnp.asarray(rng.randn(2, 1, Hkv, hd), jnp.float32)
        v_t = jnp.asarray(rng.randn(2, 1, Hkv, hd), jnp.float32)
        hist.append((k_t, v_t))
        for layer in range(cfg.num_hidden_layers):
            res = store_fresh_token(
                k_t * (layer + 1), v_t * (layer + 1), cache.k_pages,
                cache.v_pages, cache.page_table, cache.lengths,
                jnp.int32(layer), interpret=True,
                k_scales=cache.k_scales, v_scales=cache.v_scales)
            cache = cache._replace(k_pages=res[0], v_pages=res[1],
                                   k_scales=res[2], v_scales=res[3])
        cache = pk.advance_lengths(cache, 1)

    for layer in range(cfg.num_hidden_layers):
        k_g, v_g, valid = pk.gather_row_kv(cache, layer)
        k_exp = np.concatenate([np.asarray(k) for k, _ in hist], axis=1) \
            * (layer + 1)
        # int4 half-step: scale=amax/7, |err| <= scale/2 (~0.3 for randn)
        qtol = 0.02 if kv_dtype == "int8" else 0.35
        np.testing.assert_allclose(np.asarray(k_g[:, :9]), k_exp,
                                   rtol=qtol, atol=qtol)
        q = jnp.asarray(rng.randn(2, 1, cfg.num_attention_heads, hd),
                        jnp.float32)
        out = paged_decode_attention(
            q, None, None, cache.k_pages, cache.v_pages, cache.page_table,
            cache.lengths - 1, jnp.int32(layer), interpret=True,
            fresh_in_pages=True, k_scales=cache.k_scales,
            v_scales=cache.v_scales)
        ref_cache = cache._replace(lengths=cache.lengths)
        ref = _dense_ref_from_gather(ref_cache, layer, q, None, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kv_dtype", ["int8", "int4"])
def test_llm_forward_paged_quantized_close(kv_dtype):
    """End-to-end paged prefill + decode with an int8/int4 pool tracks the
    fp32 teacher-forced forward within quantization error."""
    from v2pe_tpu.core.config import debug_tiny
    from v2pe_tpu.models.internlm2 import llm_forward
    from v2pe_tpu.models.params import init_llm_params

    cfg = debug_tiny(vocab_size=300).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    S_prompt, S_total = 21, 27  # >16 prompt: in-scan quantized scatters
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S_total), 0, 300)
    pos = jnp.arange(S_total, dtype=jnp.float32)[None]
    full_logits, _ = llm_forward(params, cfg, input_ids=ids,
                                 rope_pos_ids=pos, attn_impl="jnp")

    cache = pk.PagedKVCache.zeros(cfg, batch=1, n_pages=16, page_size=4,
                                  max_pages_per_row=8, kv_dtype=kv_dtype)
    lens = jnp.asarray([S_prompt], jnp.int32)
    cache = pk.allocate_rows(cache, lens)
    prefill_logits, cache = llm_forward(
        params, cfg, input_ids=ids[:, :S_prompt],
        rope_pos_ids=pos[:, :S_prompt], paged_cache=cache, attn_impl="jnp")
    cache = cache._replace(lengths=lens)
    np.testing.assert_allclose(np.asarray(prefill_logits),
                               np.asarray(full_logits[:, :S_prompt]),
                               rtol=1e-5, atol=1e-5)  # prompt: no cache read
    for t in range(S_prompt, S_total):
        cache = pk.allocate_rows(cache, jnp.asarray([1], jnp.int32))
        step_logits, cache = llm_forward(
            params, cfg, input_ids=ids[:, t:t + 1],
            rope_pos_ids=pos[:, t:t + 1], paged_cache=cache, attn_impl="jnp")
        cache = pk.advance_lengths(cache, 1)
        ltol = 0.2 if kv_dtype == "int8" else 0.6
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]),
            rtol=ltol, atol=ltol, err_msg=f"decode step {t}")


def test_generate_paged_matches_dense():
    """Full generate() with cache_mode='paged' reproduces the dense-cache
    token stream exactly — ragged 2-row batch with images."""
    from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
    from v2pe_tpu.infer.generate import GenerationConfig, generate
    from v2pe_tpu.models.params import init_vlm_params

    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=300, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2))
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    nit = cfg.num_image_token
    rng = np.random.RandomState(0)

    row0 = np.concatenate([np.arange(10, 20), [290], [291] * nit, [292],
                           np.arange(30, 35)]).astype(np.int32)
    row1 = np.concatenate([[290], [291] * nit, [292],
                           np.arange(50, 57)]).astype(np.int32)
    S = max(len(row0), len(row1))
    ids = np.zeros((2, S), np.int32)
    ids[0, :len(row0)] = row0
    ids[1, :len(row1)] = row1
    plens = jnp.asarray([len(row0), len(row1)], jnp.int32)
    pos = np.broadcast_to(np.arange(S, dtype=np.float32), (2, S)).copy()
    pixels = rng.randn(2, 3, 56, 56).astype(np.float32)

    gc = GenerationConfig(max_new_tokens=5)
    args = (params, cfg, gc, jnp.asarray(ids), plens, jnp.asarray(pos),
            jnp.asarray(pixels), jnp.ones((2,), jnp.int32), 291)
    tok_d, n_d, lens_d = generate(*args, attn_impl="jnp")
    tok_p, n_p, lens_p = generate(*args, attn_impl="jnp",
                                  cache_mode="paged", page_size=4)
    np.testing.assert_array_equal(np.asarray(tok_d), np.asarray(tok_p))
    assert int(n_d) == int(n_p)
    np.testing.assert_array_equal(np.asarray(lens_d), np.asarray(lens_p))


def test_chat_paged_matches_dense():
    """ChatModel(cache_mode='paged') produces the same response text as the
    dense-cache chat for the same weights/prompt/image."""
    from PIL import Image

    from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
    from v2pe_tpu.infer.chat import ChatModel
    from v2pe_tpu.infer.generate import GenerationConfig
    from v2pe_tpu.models.params import init_vlm_params

    from .test_data_pipeline import _toy_tokenizer

    tok = _toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tok), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        max_dynamic_patch=2)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8))
    gc = GenerationConfig(max_new_tokens=6)

    dense = ChatModel(params, cfg, tok, attn_impl="jnp")
    paged = ChatModel(params, cfg, tok, attn_impl="jnp",
                      cache_mode="paged", page_size=8)
    pv, n = dense.load_pixels(img)
    r_d = dense.chat(pv, "Describe.", gc)
    pv2, _ = paged.load_pixels(img)
    r_p = paged.chat(pv2, "Describe.", gc)
    assert r_d == r_p


@pytest.mark.parametrize("kv_dtype", ["int8", "int4"])
def test_chat_paged_quantized_runs(kv_dtype):
    """The serving kv_dtype='int8'/'int4' knob drives the quantized pool
    through the full chat surface (tiny random weights: tokens may differ
    from bf16 by quantization, so this asserts the path runs end to end)."""
    from PIL import Image

    from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
    from v2pe_tpu.infer.chat import ChatModel
    from v2pe_tpu.infer.generate import GenerationConfig
    from v2pe_tpu.models.params import init_vlm_params

    from .test_data_pipeline import _toy_tokenizer

    tok = _toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tok), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        max_dynamic_patch=2)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    model = ChatModel(params, cfg, tok, attn_impl="jnp",
                      cache_mode="paged", page_size=8, kv_dtype=kv_dtype)
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8))
    pv, _ = model.load_pixels(img)
    r = model.chat(pv, "Describe.", GenerationConfig(max_new_tokens=4))
    assert isinstance(r, str)


def test_stream_generate_paged_matches_dense():
    """Chunked streaming decode over the paged cache yields the same token
    stream as the dense cache (the serve worker's cache_mode knob)."""
    from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
    from v2pe_tpu.infer.generate import GenerationConfig
    from v2pe_tpu.infer.streaming import stream_generate
    from v2pe_tpu.models.params import init_vlm_params

    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=300, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2))
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    nit = cfg.num_image_token
    ids = np.concatenate([np.arange(10, 20), [290], [291] * nit, [292],
                          np.arange(30, 37)]).astype(np.int32)[None]
    pos = np.arange(ids.shape[1], dtype=np.float32)[None]
    pixels = np.random.RandomState(0).randn(1, 3, 56, 56).astype(np.float32)
    gc = GenerationConfig(max_new_tokens=9)

    def run(mode):
        toks = []
        for chunk in stream_generate(
                params, cfg, gc, ids, pos, pixels,
                np.ones((1,), np.int32), 291, chunk=4, attn_impl="jnp",
                cache_mode=mode, page_size=8):
            toks.extend(int(t) for t in chunk)
        return toks

    assert run("dense") == run("paged")
