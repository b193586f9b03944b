"""Prompt-lookup speculative decoding over the paged KV cache.

Beyond-reference (the reference decodes strictly one token per forward via
HF ``generate``, modeling_internvl_chat.py:310-345): single-stream decode
on TPU is weight-bandwidth-bound, so a forward over K+1 tokens costs almost
the same HBM traffic as one token — if K drafted tokens can be *verified*
in that forward, decode runs up to (K+1)x faster with **token-exact greedy
output** (acceptance only keeps tokens the plain greedy loop would have
produced; this is lossless speculation, not approximation).

Drafts come from prompt lookup (n-gram continuation): find the most recent
earlier occurrence of the last ``g`` generated/prompt tokens and propose
its continuation. Long-context multimodal workloads are exactly where this
shines — MM-NIAH-style retrieval answers, document QA, and multi-turn chat
all copy spans from the context.

Everything runs inside one jitted ``lax.while_loop`` (no host round-trips —
essential on this high-latency device tunnel):

1. draft K tokens by vectorized n-gram matching over the token buffer;
2. run ONE (K+1)-token forward through the paged multi-token path
   (``llm_forward`` S<=16: page-sweep attention + causal fresh fold,
   ops/paged_attention.py) which also writes all K+1 fresh k/v into pages;
3. accept the longest prefix where draft == greedy argmax; advance
   ``lengths`` by the accepted count only — rejected slots are simply
   overwritten by the next iteration's writes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def prompt_lookup_draft(ctx_ids: jnp.ndarray, n_ctx: jnp.ndarray,
                        k: int, g: int) -> jnp.ndarray:
    """Draft ``k`` continuation tokens per row by matching the row's last
    ``g`` tokens against its earlier context.

    ctx_ids (B, Lbuf) int32 (prompt + generated so far, garbage beyond
    ``n_ctx``); n_ctx (B,) int32. Returns (B, k) int32. When no match
    exists the draft is garbage from the buffer tail — harmless, since
    verification rejects anything the greedy loop wouldn't emit."""
    B, Lbuf = ctx_ids.shape
    npos = Lbuf - g + 1                      # candidate match starts
    gram = jnp.take_along_axis(
        ctx_ids, n_ctx[:, None] - g + jnp.arange(g)[None, :], axis=1)
    match = jnp.ones((B, npos), bool)
    for j in range(g):
        match &= ctx_ids[:, j:j + npos] == gram[:, j:j + 1]
    # exclude the suffix itself (i == n_ctx - g) and anything past it
    match &= jnp.arange(npos)[None, :] <= (n_ctx - g - 1)[:, None]
    idx = (npos - 1) - jnp.argmax(match[:, ::-1], axis=1)      # most recent
    take = jnp.clip(idx[:, None] + g + jnp.arange(k)[None, :], 0, Lbuf - 1)
    return jnp.take_along_axis(ctx_ids, take, axis=1)


def speculative_decode_from_logits(
    llm, lcfg, gc, cache, last_logits, last_pos, ctx_ids, n_ctx,
    *, attn_impl: str = "auto",
):
    """Greedy decode with prompt-lookup speculation — the speculative
    counterpart of :func:`v2pe_tpu.infer.generate.decode_from_logits`
    (token-exact against it by construction).

    ``ctx_ids`` (B, Lbuf) holds the prompt tokens (right-padded rows fine —
    matching is bounded by ``n_ctx``); Lbuf must have room for
    max_new_tokens more. ``cache`` is a PagedKVCache whose pool leaves
    room for ``lengths + max_new + K + 1`` tokens. Returns
    (out (B, max_new), steps_taken, lens (B,), cache)."""
    from v2pe_tpu.infer import paged_kv as pk
    from v2pe_tpu.models import internlm2

    assert not gc.do_sample, "speculative decoding is greedy-only"
    K = int(gc.speculative_k)
    g = int(gc.speculative_ngram)
    assert 1 <= K <= 15, "K+1 must ride the <=16-token paged path"
    B = last_logits.shape[0]
    max_new = gc.max_new_tokens
    eos = jnp.asarray(gc.eos_token_ids, jnp.int32) if gc.eos_token_ids \
        else jnp.zeros((0,), jnp.int32)

    def _isin(x):
        return jnp.isin(x, eos) if eos.size else jnp.zeros(x.shape, bool)

    # first output token from the prefill logits (== decode_from_logits)
    tok0 = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
    out0 = jnp.zeros((B, max_new + K + 1), jnp.int32).at[:, 0].set(tok0)
    ctx_ids = ctx_ids.at[jnp.arange(B), n_ctx].set(tok0)
    n_ctx = n_ctx + 1
    n_out0 = jnp.ones((B,), jnp.int32)
    done0 = _isin(tok0) | (n_out0 >= max_new)
    steps0 = jnp.zeros((), jnp.int32)

    def cond(state):
        _, _, _, _, _, done, _, _ = state
        return ~jnp.all(done)

    def body(state):
        cache, ctx, n_ctx, tok, pos, done, out, (n_out, steps) = state
        draft = prompt_lookup_draft(ctx, n_ctx, K, g)
        x = jnp.concatenate([tok[:, None], draft], axis=1)     # (B, K+1)
        cache = pk.allocate_rows(
            cache, jnp.where(done, 0, K + 1).astype(jnp.int32))
        emb = llm["tok_embeddings"][x]
        seg = jnp.broadcast_to(jnp.where(done, 0, 1)[:, None], (B, K + 1))
        logits, cache = internlm2.llm_forward(
            llm, lcfg, inputs_embeds=emb,
            rope_pos_ids=pos[:, None] + jnp.arange(K + 1, dtype=jnp.float32),
            segment_ids=seg, attn_impl=attn_impl, paged_cache=cache)
        y = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # (B, K+1)

        # keep[i]: y_i is a real output — all drafts before it verified,
        # no eos emitted earlier this block, row alive, under the cap.
        # Each factor is prefix-monotone, so keep is a prefix mask.
        verified = jnp.cumprod(
            jnp.concatenate([jnp.ones((B, 1), jnp.int32),
                             (x[:, 1:] == y[:, :-1]).astype(jnp.int32)],
                            axis=1), axis=1)
        no_eos_before = jnp.cumprod(jnp.concatenate(
            [jnp.ones((B, 1), jnp.int32),
             (~_isin(y[:, :-1])).astype(jnp.int32)], axis=1), axis=1)
        under_cap = (n_out[:, None] + jnp.arange(K + 1)[None, :]) < max_new
        keep = (verified * no_eos_before).astype(bool) & under_cap \
            & ~done[:, None]
        m = jnp.sum(keep.astype(jnp.int32), axis=1)            # (B,)

        rows = jnp.arange(B)[:, None]
        off = jnp.arange(K + 1)[None, :]
        sentinel = out.shape[1]                                 # mode=drop
        out = out.at[rows, jnp.where(keep, n_out[:, None] + off, sentinel)
                     ].set(y, mode="drop")
        ctx = ctx.at[rows, jnp.where(keep, n_ctx[:, None] + off,
                                     ctx.shape[1])].set(y, mode="drop")
        # lengths advance by the accepted INPUT count (x_0..x_{m-1}); the
        # k/v of rejected slots are overwritten by the next block's writes
        cache = pk.advance_lengths(cache, jnp.where(done, 0, m))
        last_kept = jnp.take_along_axis(
            y, jnp.maximum(m - 1, 0)[:, None], axis=1)[:, 0]
        tok = jnp.where(done, tok, last_kept)
        emitted_eos = jnp.any(keep & _isin(y), axis=1)
        n_out = n_out + m
        n_ctx = n_ctx + m
        pos = pos + m.astype(jnp.float32)
        done = done | emitted_eos | (n_out >= max_new)
        return cache, ctx, n_ctx, tok, pos, done, out, (n_out, steps + 1)

    state = (cache, ctx_ids, n_ctx, tok0, last_pos + 1.0, done0, out0,
             (n_out0, steps0))
    cache, _, _, _, _, _, out, (lens, steps) = jax.lax.while_loop(
        cond, body, state)
    return out[:, :max_new], steps, jnp.minimum(lens, max_new), cache
