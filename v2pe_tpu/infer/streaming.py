"""Chunked streaming decode for serving.

The reference streams via a thread + HF TextIteratorStreamer
(serve/model_worker.py:207-225). TPU-native version: prefill once, then emit
fixed-size decode chunks from a jitted multi-token step (amortizing dispatch
latency), yielding text increments between chunks."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import VLMConfig
from v2pe_tpu.infer.generate import GenerationConfig, _sample
from v2pe_tpu.models import internlm2, internvl_chat
from v2pe_tpu.models.internlm2 import KVCache


@partial(jax.jit, static_argnames=("cfg", "gc", "img_context_token_id",
                                   "attn_impl", "max_total", "cache_mode",
                                   "page_size", "kv_dtype"))
def _prefill(params, cfg: VLMConfig, gc: GenerationConfig, input_ids,
             rope_pos_ids, pixel_values, image_flags,
             img_context_token_id: int, max_total: int, rng,
             attn_impl: str = "auto", cache_mode: str = "dense",
             page_size: int = 128, kv_dtype=None):
    llm = params["llm"]
    B, S = input_ids.shape
    embeds = llm["tok_embeddings"][input_ids]
    vit = internvl_chat.extract_feature(params, cfg, pixel_values,
                                        attn_impl=attn_impl)
    embeds = internvl_chat.scatter_image_embeds(
        embeds, input_ids, vit, image_flags, img_context_token_id)
    if cache_mode == "paged":
        from v2pe_tpu.infer import paged_kv as pk
        from v2pe_tpu.parallel import context as pctx

        # match the ambient seq sharding (see infer/generate.py — the
        # seq-sharded kernels require allocate_rows' round-robin layout)
        ctx = pctx.current()
        n_shards = ctx.seq_shards if ctx is not None else 1
        MP = -(-max_total // page_size)
        n_pages = n_shards * (B * (-(-MP // n_shards)) + 1)
        cache = pk.PagedKVCache.zeros(cfg.llm, B, n_pages, page_size, MP,
                                      kv_dtype=kv_dtype, n_shards=n_shards,
                                      dtype=llm["tok_embeddings"].dtype)
        lens = jnp.full((B,), S, jnp.int32)
        cache = pk.allocate_rows(cache, lens)
        # llm_forward writes pages in place and returns the updated cache
        hidden, cache = internlm2.llm_forward(
            llm, cfg.llm, inputs_embeds=embeds, rope_pos_ids=rope_pos_ids,
            attn_impl=attn_impl, paged_cache=cache, return_hidden=True)
        cache = cache._replace(lengths=lens)
    else:
        cache = KVCache.zeros(cfg.llm, B, max_total,
                              dtype=llm["tok_embeddings"].dtype)
        hidden, cache = internlm2.llm_forward(
            llm, cfg.llm, inputs_embeds=embeds, rope_pos_ids=rope_pos_ids,
            attn_impl=attn_impl, kv_cache=cache, return_hidden=True)
    last_logits = internlm2.head_logits(hidden[:, -1:],
                                        llm["output_kernel"])[:, 0]
    tok0 = _sample(last_logits, gc, rng).astype(jnp.int32)
    return tok0, cache


@partial(jax.jit, static_argnames=("cfg", "gc", "chunk", "attn_impl"),
         donate_argnums=(3,))  # donate the cache: without aliasing, every
# chunk call would copy the multi-GB pool/KV buffers at the jit boundary,
# defeating the in-place store kernel (callers rebind the returned cache)
def _decode_chunk(params, cfg: VLMConfig, gc: GenerationConfig, cache,
                  tok, pos, done, rng, chunk: int, attn_impl: str = "auto"):
    llm = params["llm"]
    eos = jnp.asarray(gc.eos_token_ids, jnp.int32) if gc.eos_token_ids \
        else jnp.zeros((0,), jnp.int32)
    B = tok.shape[0]
    out = jnp.zeros((B, chunk), jnp.int32)

    cnt = jnp.zeros((B,), jnp.int32)

    from v2pe_tpu.infer import paged_kv as pk

    def body(i, state):
        cache, tok, pos, done, out, cnt, key = state
        key, sub = jax.random.split(key)
        emb = llm["tok_embeddings"][tok][:, None, :]
        if isinstance(cache, pk.PagedKVCache):
            # paged: dispatch on the cache TYPE (static at trace time)
            cache = pk.allocate_rows(cache, jnp.ones((B,), jnp.int32))
            logits, cache = internlm2.llm_forward(
                llm, cfg.llm, inputs_embeds=emb, rope_pos_ids=pos[:, None],
                attn_impl=attn_impl, paged_cache=cache)
            cache = pk.advance_lengths(cache, 1)
        else:
            logits, cache = internlm2.llm_forward(
                llm, cfg.llm, inputs_embeds=emb, rope_pos_ids=pos[:, None],
                attn_impl=attn_impl, kv_cache=cache)
        nxt = _sample(logits[:, -1], gc, sub).astype(jnp.int32)
        nxt = jnp.where(done, 0, nxt)
        out = out.at[:, i].set(nxt)
        cnt = cnt + jnp.where(done, 0, 1)  # valid iff row not done yet
        if eos.size:
            done = done | jnp.isin(nxt, eos)
        return (cache, nxt, pos + 1.0, done, out, cnt, key)

    cache, tok, pos, done, out, cnt, rng = jax.lax.fori_loop(
        0, chunk, body, (cache, tok, pos, done, out, cnt, rng))
    return cache, tok, pos, done, out, cnt, rng


def stream_generate(
    params, cfg: VLMConfig, gc: GenerationConfig,
    input_ids: np.ndarray,       # (1, S)
    rope_pos_ids: np.ndarray,    # (1, S) float32
    pixel_values, image_flags,
    img_context_token_id: int,
    chunk: int = 8,
    attn_impl: str = "auto",
    rng: Optional[jax.Array] = None,
    cache_mode: str = "dense",
    page_size: int = 128,
    kv_dtype=None,
) -> Iterator[np.ndarray]:
    """Yields int32 token chunks until EOS or max_new_tokens."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    S = input_ids.shape[1]
    max_total = S + gc.max_new_tokens
    tok, cache = _prefill(params, cfg, gc, jnp.asarray(input_ids),
                          jnp.asarray(rope_pos_ids),
                          jnp.asarray(pixel_values), jnp.asarray(image_flags),
                          img_context_token_id, max_total, rng,
                          attn_impl=attn_impl, cache_mode=cache_mode,
                          page_size=page_size, kv_dtype=kv_dtype)
    eos = set(gc.eos_token_ids)
    done = jnp.asarray([int(tok[0]) in eos]) if eos else jnp.asarray([False])
    if not bool(done[0]):
        yield np.asarray(tok)[None, 0:1][0]
    pos = jnp.asarray(rope_pos_ids[:, -1] + 1.0)
    emitted = 1
    while emitted < gc.max_new_tokens and not bool(done[0]):
        n = min(chunk, gc.max_new_tokens - emitted)
        cache, tok, pos, done, out, cnt, rng = _decode_chunk(
            params, cfg, gc, cache, tok, pos, done, rng, chunk=n,
            attn_impl=attn_impl)
        # slice by the chunk's valid-token count (token id 0 can be a real
        # vocab item, so no sentinel scanning)
        keep = [int(t) for t in np.asarray(out[0])[:int(cnt[0])]]
        emitted += n
        if keep:
            yield np.asarray(keep, np.int32)
        if keep and eos and keep[-1] in eos:
            break
