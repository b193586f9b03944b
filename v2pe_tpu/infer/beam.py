"""Beam-search decoding, fully inside jit.

Semantics-parity with HF ``generate(num_beams=K)`` as the reference uses it
(``eval/seed/evaluate_seed.py:142,264`` exposes ``--num-beams``; decoding
inherits transformers' ``BeamSearchScorer``):

* per step: expand each live beam over the vocab, take the top ``2K``
  candidates of ``cum_logprob``; EOS candidates ranked below ``K`` retire
  into the hypothesis pool (score ``sum_logprobs / len**length_penalty``
  with ``len`` counting prompt + generated tokens, eos excluded — the HF
  ``BeamHypotheses.add`` contract); the first ``K`` non-EOS candidates
  (in rank order) become the next beams;
* termination per row: all ``K`` hypothesis slots filled AND (unless
  ``early_stopping``) the worst kept score is at least the best still
  reachable ``max_cum / cur_len**length_penalty`` (``BeamHypotheses.is_done``);
* finalize: still-open beams join the pool; the best-scoring hypothesis is
  returned.

V2PE beam safety: the reference's 2.5 fork guards against per-beam rotary
position divergence by forcing the first beam's pos_ids
(``internvl2_5/model/internlm2/modeling_internlm2.py:293-305``). Here the
guard is structural — positions are carried per ROW (shape (B,)) and every
beam of a row shares them by construction, continuing at integer stride
from the fractional prompt maximum exactly like greedy decode.

The KV cache is the dense preallocated cache tiled to ``B*K`` rows and
gathered by parent beam each step (HF ``_reorder_cache`` analogue — a
device-side gather on the batch axis, no host sync).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from v2pe_tpu.models import internlm2, internvl_chat
from v2pe_tpu.models.internlm2 import KVCache

NEG = -1e9


@partial(jax.jit, static_argnames=("cfg", "gc", "img_context_token_id",
                                   "attn_impl"))
def beam_generate(
    params,
    cfg,
    gc,                            # GenerationConfig with num_beams > 1
    input_ids: jnp.ndarray,        # (B, S) int32, right-padded
    prompt_lengths: jnp.ndarray,   # (B,) int32
    rope_pos_ids: jnp.ndarray,     # (B, S) float32 V2PE prompt positions
    pixel_values: jnp.ndarray,     # (T, 3, sz, sz)
    image_flags: jnp.ndarray,      # (T,)
    img_context_token_id: int,
    attn_impl: str = "auto",
):
    """Returns (tokens (B, max_new), lengths (B,)) — the best hypothesis
    per row (num_return_sequences=1), eos excluded from the returned
    length like generate()'s gen_lens counts it INcluded... see below.

    Matches greedy generate() token-for-token at num_beams=1."""
    K = gc.num_beams
    lp = gc.length_penalty
    B, S = input_ids.shape
    llm = params["llm"]
    dtype = llm["tok_embeddings"].dtype
    max_new = gc.max_new_tokens
    max_len = S + max_new
    V = cfg.llm.vocab_size

    eos = jnp.asarray(gc.eos_token_ids, jnp.int32) if gc.eos_token_ids \
        else jnp.zeros((0,), jnp.int32)

    # ---- prefill (identical to generate())
    embeds = llm["tok_embeddings"][input_ids]
    vit_embeds = internvl_chat.extract_feature(params, cfg, pixel_values,
                                               attn_impl=attn_impl)
    embeds = internvl_chat.scatter_image_embeds(
        embeds, input_ids, vit_embeds, image_flags, img_context_token_id)
    arange = jnp.arange(S, dtype=jnp.int32)[None, :]
    seg = jnp.where(arange < prompt_lengths[:, None], 1, 0)
    slot = jnp.arange(max_len, dtype=jnp.int32)[None, :]

    cache = KVCache.zeros(cfg.llm, B, max_len, dtype=dtype)
    hidden, cache = internlm2.llm_forward(
        llm, cfg.llm, inputs_embeds=embeds, rope_pos_ids=rope_pos_ids,
        segment_ids=seg, attn_impl=attn_impl, kv_cache=cache,
        kv_valid=(slot < prompt_lengths[:, None]), return_hidden=True)
    last_hidden = jnp.take_along_axis(
        hidden, (prompt_lengths[:, None, None] - 1), axis=1)
    last_logits = internlm2.head_logits(
        last_hidden, llm["output_kernel"])[:, 0]  # (B,V)
    last_pos = jnp.take_along_axis(
        rope_pos_ids, (prompt_lengths[:, None] - 1), axis=1)[:, 0]  # (B,)

    # tile the cache to B*K beam rows (row b beam k -> b*K + k)
    cache = cache._replace(k=jnp.repeat(cache.k, K, axis=1),
                           v=jnp.repeat(cache.v, K, axis=1))
    plens_bk = jnp.repeat(prompt_lengths, K)

    def kv_valid_at(t):
        return ((slot < plens_bk[:, None]) |
                ((slot >= S) & (slot < S + t)))

    def process(t, logp, scores, hyp_s, hyp_t, hyp_l, out):
        """One HF BeamSearchScorer.process step. logp (B,K,V) fresh token
        log-probs; t = tokens generated so far (before this step)."""
        cand = (scores[:, :, None] + logp).reshape(B, K * V)
        top_s, top_i = jax.lax.top_k(cand, 2 * K)           # (B, 2K)
        tok = (top_i % V).astype(jnp.int32)
        parent = (top_i // V).astype(jnp.int32)
        is_eos = jnp.isin(tok, eos) if eos.size else \
            jnp.zeros_like(tok, dtype=bool)
        rank = jnp.broadcast_to(jnp.arange(2 * K), (B, 2 * K))

        # ---- retire EOS candidates ranked < K into the hypothesis pool.
        # HF normalizes by GENERATED length only (BeamHypotheses.add gets
        # generated_len = cur_len - decoder_prompt_len = t + 1, counting
        # the eos; the prompt never enters the denominator) — normalizing
        # by prompt+generated flattens the length penalty and lets
        # short/empty hypotheses win (caught by an adversarial sweep vs
        # transformers: 49/144 seeds diverged, some to EMPTY answers).
        offer = is_eos & (rank < K)
        hyp_len = jnp.float32(t + 1)
        offer_score = jnp.where(offer, top_s / hyp_len ** lp, -jnp.inf)

        def add_one(i, st):
            hyp_s, hyp_t, hyp_l = st
            sc = offer_score[:, i]                          # (B,)
            par = parent[:, i]
            worst = jnp.argmin(hyp_s, axis=1)               # (B,)
            better = sc > jnp.min(hyp_s, axis=1)
            new_tokens = jnp.take_along_axis(
                out, par[:, None, None], axis=1)[:, 0]      # (B, max_new)
            rowi = jnp.arange(B)
            hyp_s = hyp_s.at[rowi, worst].set(
                jnp.where(better, sc, hyp_s[rowi, worst]))
            upd_t = hyp_t.at[rowi, worst].set(new_tokens)
            hyp_t = jnp.where(better[:, None, None], upd_t, hyp_t)
            upd_l = hyp_l.at[rowi, worst].set(jnp.int32(t))
            hyp_l = jnp.where(better[:, None], upd_l, hyp_l)
            return hyp_s, hyp_t, hyp_l

        hyp_s, hyp_t, hyp_l = jax.lax.fori_loop(
            0, K, add_one, (hyp_s, hyp_t, hyp_l))

        # ---- next K beams: first K non-EOS candidates in rank order
        live = ~is_eos
        order = jnp.argsort(jnp.where(live, rank, 2 * K + rank), axis=1)
        pick = order[:, :K]                                  # (B, K)
        new_scores = jnp.take_along_axis(top_s, pick, axis=1)
        new_tok = jnp.take_along_axis(tok, pick, axis=1)
        new_parent = jnp.take_along_axis(parent, pick, axis=1)

        # reorder output buffers by parent, then append the new token
        # (t is always < max_new inside the loop — cond guards it)
        out = jnp.take_along_axis(out, new_parent[:, :, None], axis=1)
        out = out.at[:, :, t].set(new_tok)
        return (new_scores, new_tok, new_parent, out, hyp_s, hyp_t, hyp_l,
                jnp.max(top_s, axis=1))

    # ---- step 0 from the prefill logits
    logp0 = jax.nn.log_softmax(last_logits, axis=-1)         # (B, V)
    init_scores = jnp.full((B, K), NEG, jnp.float32).at[:, 0].set(0.0)
    hyp_s0 = jnp.full((B, K), -jnp.inf, jnp.float32)
    hyp_t0 = jnp.zeros((B, K, max_new), jnp.int32)
    hyp_l0 = jnp.zeros((B, K), jnp.int32)
    out0 = jnp.zeros((B, K, max_new), jnp.int32)
    (scores, tok, parent, out, hyp_s, hyp_t, hyp_l, best_cum) = process(
        0, jnp.broadcast_to(logp0[:, None], (B, K, V)), init_scores,
        hyp_s0, hyp_t0, hyp_l0, out0)

    def row_done(hyp_s, best_cum, t):
        full = jnp.all(jnp.isfinite(hyp_s), axis=1)
        if gc.early_stopping:
            return full
        # BeamHypotheses.is_done: generated length only in the denominator
        best_possible = best_cum / jnp.float32(t) ** lp
        return full & (jnp.min(hyp_s, axis=1) >= best_possible)

    def cond(state):
        t = state[0]
        hyp_s, best_cum = state[6], state[9]
        return (t < max_new) & ~jnp.all(row_done(hyp_s, best_cum, t))

    def body(state):
        (t, tok, parent, scores, cache, out, hyp_s, hyp_t, hyp_l,
         best_cum, pos) = state
        flat_parent = (jnp.arange(B)[:, None] * K + parent).reshape(-1)
        cache = cache._replace(k=cache.k[:, flat_parent],
                               v=cache.v[:, flat_parent])
        emb = llm["tok_embeddings"][tok.reshape(-1)][:, None, :]
        # the token fed here was generated at step t-1; its position is
        # pos + (t-1) (pos = last prompt position + 1)
        pos_bk = jnp.repeat(pos, K)[:, None] + (t - 1).astype(jnp.float32)
        logits, cache = internlm2.llm_forward(
            llm, cfg.llm, inputs_embeds=emb, rope_pos_ids=pos_bk,
            attn_impl=attn_impl, kv_cache=cache, kv_valid=kv_valid_at(t))
        logp = jax.nn.log_softmax(logits[:, -1], axis=-1).reshape(B, K, V)
        (scores, tok, parent, out, hyp_s, hyp_t, hyp_l, best_cum) = process(
            t, logp, scores, hyp_s, hyp_t, hyp_l, out)
        return (t + 1, tok, parent, scores, cache, out, hyp_s, hyp_t,
                hyp_l, best_cum, pos)

    state = (jnp.int32(1), tok, parent, scores, cache, out, hyp_s, hyp_t,
             hyp_l, best_cum, last_pos + 1.0)
    (t_end, tok, parent, scores, cache, out, hyp_s, hyp_t, hyp_l, best_cum,
     _) = jax.lax.while_loop(cond, body, state)

    # ---- finalize: open beams join the pool (HF finalize: generated_len
    # = final length - prompt = t_end), best wins
    open_score = scores / t_end.astype(jnp.float32) ** lp
    rowi = jnp.arange(B)[:, None]

    def add_open(i, st):
        hyp_s, hyp_t, hyp_l = st
        sc = open_score[:, i]
        worst = jnp.argmin(hyp_s, axis=1)
        better = sc > jnp.min(hyp_s, axis=1)
        r = jnp.arange(B)
        hyp_s2 = hyp_s.at[r, worst].set(jnp.where(better, sc,
                                                  hyp_s[r, worst]))
        upd_t = hyp_t.at[r, worst].set(out[:, i])
        hyp_t2 = jnp.where(better[:, None, None], upd_t, hyp_t)
        upd_l = hyp_l.at[r, worst].set(t_end)
        hyp_l2 = jnp.where(better[:, None], upd_l, hyp_l)
        return hyp_s2, hyp_t2, hyp_l2

    hyp_s, hyp_t, hyp_l = jax.lax.fori_loop(0, K, add_open,
                                            (hyp_s, hyp_t, hyp_l))
    best = jnp.argmax(hyp_s, axis=1)                         # (B,)
    tokens = jnp.take_along_axis(hyp_t, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(hyp_l, best[:, None], axis=1)[:, 0]
    return tokens, lens
