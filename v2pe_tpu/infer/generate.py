"""Autoregressive generation with a static KV cache, fully inside jit.

Replaces HF ``generate`` + the reference's tuple-concat KV cache
(modeling_internlm2.py:599-604, 1978-2017): prefill fills a preallocated
cache, then a ``lax.while_loop`` decodes token-by-token on device (no
host-device ping-pong per token — essential both for TPU efficiency and for
this session's high-latency device tunnel).

V2PE decode-time positions: generated text continues at INTEGER stride from
the (possibly fractional) prompt maximum (prepare_inputs_for_generation,
modeling_internlm2.py:2000-2002)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import VLMConfig
from v2pe_tpu.models import internlm2, internvl_chat
from v2pe_tpu.models.internlm2 import KVCache


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 256
    do_sample: bool = False
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    eos_token_ids: Tuple[int, ...] = ()
    num_beams: int = 1           # >1: beam search (infer/beam.py)
    length_penalty: float = 1.0
    early_stopping: bool = False
    # prompt-lookup speculative decoding (infer/speculative.py): K drafted
    # tokens verified per forward — token-exact greedy, paged cache only
    speculative_k: int = 0
    speculative_ngram: int = 3


def _sample(logits, gc: GenerationConfig, key):
    if not gc.do_sample or gc.temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / gc.temperature
    if gc.top_k > 0:
        kth = jax.lax.top_k(logits, gc.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gc.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gc.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


@partial(jax.jit, static_argnames=("cfg", "gc", "img_context_token_id",
                                   "attn_impl", "cache_mode", "page_size",
                                   "kv_dtype"))
def generate(
    params,
    cfg: VLMConfig,
    gc: GenerationConfig,
    input_ids: jnp.ndarray,        # (B, S) int32, right-padded with pad_id
    prompt_lengths: jnp.ndarray,   # (B,) int32 true prompt lengths
    rope_pos_ids: jnp.ndarray,     # (B, S) float32 V2PE prompt positions
    pixel_values: jnp.ndarray,     # (T, 3, sz, sz)
    image_flags: jnp.ndarray,      # (T,)
    img_context_token_id: int,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    cache_mode: str = "dense",   # 'dense' | 'paged'
    page_size: int = 128,
    kv_dtype: Optional[str] = None,  # 'int8'/'int4': quantized pool (halves
    # the KV HBM — the >=128k single-chip serving regime)
):
    """Greedy/sampling decode.

    Returns (tokens (B, max_new), steps_taken, gen_lens (B,)) where
    gen_lens[i] counts row i's valid generated tokens (including its stop
    token) — rows finished earlier are 0-filled in `tokens`, so callers must
    slice by gen_lens rather than scanning for a sentinel (token id 0 can be
    a legitimate vocabulary item).

    Right-padded batched prompts are handled through per-row positions and a
    kv segment mask derived from prompt_lengths."""
    B, S = input_ids.shape
    llm = params["llm"]
    dtype = llm["tok_embeddings"].dtype
    speculative = gc.speculative_k > 0
    if speculative:
        assert cache_mode == "paged" and not gc.do_sample, \
            "speculative decoding: paged cache + greedy only"
    # +K+1 slack: the last speculative block may write K+1 fresh tokens
    max_len = S + gc.max_new_tokens + \
        (gc.speculative_k + 1 if speculative else 0)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    # ---- prefill: scatter ViT features, run with cache
    embeds = llm["tok_embeddings"][input_ids]
    vit_embeds = internvl_chat.extract_feature(params, cfg, pixel_values,
                                               attn_impl=attn_impl)
    embeds = internvl_chat.scatter_image_embeds(
        embeds, input_ids, vit_embeds, image_flags, img_context_token_id)

    # per-row valid prompt mask: right-padded slots hold garbage keys
    arange = jnp.arange(S, dtype=jnp.int32)[None, :]
    seg = jnp.where(arange < prompt_lengths[:, None], 1, 0)
    slot = jnp.arange(max_len, dtype=jnp.int32)[None, :]

    def kv_valid_at(t):
        """valid cache slots once t decode tokens are written."""
        return ((slot < prompt_lengths[:, None]) |
                ((slot >= S) & (slot < S + t)))

    # prefill computes hidden states only; the vocab projection runs on the
    # single last position per row (the full-sequence fp32 logits head is
    # ~3 GB of HBM writes at 8k x 92k — pure TTFT waste)
    if cache_mode == "paged":
        from v2pe_tpu.infer import paged_kv as pk
        from v2pe_tpu.parallel import context as pctx

        # under a seq-sharded mesh the pool MUST be built with matching
        # n_shards: attention_forward auto-routes to the seq-sharded
        # kernels, whose local-page-view math assumes allocate_rows'
        # round-robin placement and the per-shard reserved null pages —
        # an n_shards=1 allocator there silently drops pages from
        # attention and can clobber fresh tokens via the null-page no-op
        ctx = pctx.current()
        n_shards = ctx.seq_shards if ctx is not None else 1
        MP = -(-max_len // page_size)
        # per shard: 1 reserved null page + worst-case round-robin demand
        # (each row's page at slot s lives on shard s % n)
        n_pages = n_shards * (B * (-(-MP // n_shards)) + 1)
        cache = pk.PagedKVCache.zeros(cfg.llm, B, n_pages, page_size, MP,
                                      dtype=dtype, kv_dtype=kv_dtype,
                                      n_shards=n_shards)
        cache = pk.allocate_rows(cache, prompt_lengths)
        # llm_forward writes pages in place (per-layer scatters on the scan
        # carry for long prompts; the aliased store kernel for tiny ones)
        hidden, cache = internlm2.llm_forward(
            llm, cfg.llm, inputs_embeds=embeds, rope_pos_ids=rope_pos_ids,
            segment_ids=seg, attn_impl=attn_impl, paged_cache=cache,
            return_hidden=True)
        cache = cache._replace(lengths=prompt_lengths)
    else:
        cache = KVCache.zeros(cfg.llm, B, max_len, dtype=dtype)
        hidden, cache = internlm2.llm_forward(
            llm, cfg.llm, inputs_embeds=embeds, rope_pos_ids=rope_pos_ids,
            segment_ids=seg, attn_impl=attn_impl, kv_cache=cache,
            kv_valid=kv_valid_at(0), return_hidden=True)
    last_hidden = jnp.take_along_axis(
        hidden, (prompt_lengths[:, None, None] - 1), axis=1)
    last_logits = internlm2.head_logits(last_hidden,
                                        llm["output_kernel"])[:, 0]

    # decode-time integer position advance from the fractional prompt max
    last_pos = jnp.take_along_axis(rope_pos_ids,
                                   (prompt_lengths[:, None] - 1), axis=1)[:, 0]

    if speculative:
        from v2pe_tpu.infer.speculative import speculative_decode_from_logits

        ctx = jnp.zeros((B, max_len + 8), jnp.int32)
        ctx = jax.lax.dynamic_update_slice(ctx, input_ids, (0, 0))
        out, t, lens, _ = speculative_decode_from_logits(
            llm, cfg.llm, gc, cache, last_logits, last_pos, ctx,
            prompt_lengths, attn_impl=attn_impl)
        return out, t, lens

    out, t, lens, _ = decode_from_logits(
        llm, cfg.llm, gc, cache, last_logits, last_pos, rng,
        attn_impl=attn_impl, kv_valid_at=None if cache_mode == "paged"
        else kv_valid_at)
    return out, t, lens


def decode_from_logits(llm, lcfg, gc: GenerationConfig, cache, last_logits,
                       last_pos, rng, *, attn_impl: str = "auto",
                       kv_valid_at=None):
    """The shared decode while-loop: sample token 0 from ``last_logits``
    (the prefill's last-position logits), then decode token-by-token over
    ``cache`` — a PagedKVCache (paged kernels; ``kv_valid_at=None``) or a
    dense KVCache (pass its ``kv_valid_at(t)`` mask fn). Used by
    :func:`generate` and the persistent :class:`~v2pe_tpu.infer.session.
    ChatSession`; traced into the caller's jit. Returns
    (out (B, max_new), steps, lens (B,), cache)."""
    B = last_logits.shape[0]
    eos = jnp.asarray(gc.eos_token_ids, jnp.int32) if gc.eos_token_ids \
        else jnp.zeros((0,), jnp.int32)
    paged = kv_valid_at is None

    def cond(state):
        t, _, _, _, done, _, _, _ = state
        return (t < gc.max_new_tokens) & ~jnp.all(done)

    def body(state):
        t, tok, pos, cache, done, out, lens, key = state
        key, sub = jax.random.split(key)
        emb = llm["tok_embeddings"][tok][:, None, :]
        if paged:
            from v2pe_tpu.infer import paged_kv as pk

            cache = pk.allocate_rows(cache, jnp.ones((B,), jnp.int32))
            # write-then-attend: llm_forward writes the fresh k/v into the
            # pages in place and returns the updated cache
            logits, cache = internlm2.llm_forward(
                llm, lcfg, inputs_embeds=emb, rope_pos_ids=pos[:, None],
                attn_impl=attn_impl, paged_cache=cache)
            cache = pk.advance_lengths(cache, 1)
        else:
            logits, cache = internlm2.llm_forward(
                llm, lcfg, inputs_embeds=emb,
                rope_pos_ids=pos[:, None],
                attn_impl=attn_impl, kv_cache=cache,
                kv_valid=kv_valid_at(t))
        nxt = _sample(logits[:, -1], gc, sub).astype(jnp.int32)
        nxt = jnp.where(done, 0, nxt)
        out = out.at[:, t].set(nxt)
        lens = lens + jnp.where(done, 0, 1)  # token t valid iff not done yet
        done = done | jnp.isin(nxt, eos) if eos.size else done
        return (t + 1, nxt, pos + 1.0, cache, done, out, lens, key)

    tok0 = _sample(last_logits, gc, rng).astype(jnp.int32)
    out0 = jnp.zeros((B, gc.max_new_tokens), jnp.int32).at[:, 0].set(tok0)
    done0 = jnp.isin(tok0, eos) if eos.size else jnp.zeros((B,), bool)
    lens0 = jnp.ones((B,), jnp.int32)
    state = (jnp.int32(1), tok0, last_pos + 1.0, cache, done0, out0, lens0,
             rng)
    t, _, _, cache, _, out, lens, _ = jax.lax.while_loop(cond, body, state)
    return out, t, lens, cache
