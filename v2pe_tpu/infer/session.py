"""Stateful multi-turn chat session over a persistent paged KV cache.

The reference's multi-turn ``chat(history=...)`` rebuilds the FULL prompt
and re-prefills every token of every previous turn each time
(modeling_internvl_chat.py:386-563). A :class:`ChatSession` keeps the
page pool alive across turns: each ``send()`` tokenizes the whole
conversation, slices off the already-consumed prefix, and runs only the
NEW suffix through :func:`v2pe_tpu.infer.chunked_prefill.chunked_prefill`
(page-sweep attention over the history + causal self-attention), then
decodes in-session through the paged decode kernels. Measured on one
v5e: a 2k-token turn over a 32k history prefills in ~0.2 s vs ~2.2 s for
the reference-style full re-prefill.

Generated tokens are rolled back from the cache after each turn (lengths
reset to the prompt end): the next turn re-embeds the response text from
the template, so tokenizer roundtrip differences between generated ids
and retokenized text can never desynchronize the cache — the cache
always holds exactly the tokenization of the running template prefix.

Suffix lengths are padded up to ``chunk_multiple`` (segment-0 padding,
handled by the ragged chunked-prefill path) so the number of compiled
chunk programs stays bounded.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax

from v2pe_tpu.infer.generate import GenerationConfig, decode_from_logits
from v2pe_tpu.models import internlm2


@partial(jax.jit, static_argnames=("cfg", "gc"), donate_argnums=(1,))
def _decode_loop(llm, cache, last_logits, last_pos, cfg, gc, rng):
    # the shared decode loop (infer/generate.py) jitted with the session's
    # cache donated so the pool updates in place across the turn
    out, _, lens, cache = decode_from_logits(
        llm, cfg, gc, cache, last_logits, last_pos, rng)
    return cache, out, lens


@partial(jax.jit, static_argnames=("cfg", "gc"), donate_argnums=(1,))
def _spec_decode_loop(llm, cache, last_logits, last_pos, ctx, n_ctx, cfg,
                      gc):
    # prompt-lookup speculative turn (infer/speculative.py): the whole
    # conversation rides ``ctx`` so drafts can copy from ANY earlier turn
    from v2pe_tpu.infer.speculative import speculative_decode_from_logits

    out, steps, lens, cache = speculative_decode_from_logits(
        llm, cfg, gc, cache, last_logits, last_pos, ctx, n_ctx)
    return cache, out, lens, steps


class ChatSession:
    """One conversation bound to one persistent paged cache (batch 1)."""

    def __init__(self, chat_model, max_len: int = 32768,
                 page_size: int = 512, kv_dtype=None,
                 chunk_multiple: int = 256):
        import jax.numpy as jnp

        from v2pe_tpu.infer import paged_kv as pk

        self.m = chat_model
        self.cfg = chat_model.cfg
        self.max_len = max_len
        self.chunk_multiple = chunk_multiple
        MP = -(-max_len // page_size)
        self.cache = pk.PagedKVCache.zeros(
            self.cfg.llm, 1, MP + 1, page_size, MP,
            dtype=chat_model.params["llm"]["tok_embeddings"].dtype,
            kv_dtype=kv_dtype)
        self.consumed = 0          # tokens of the template prefix in cache
        self.history = []
        self.num_patches_list = []
        # adaptive speculation (mirrors serve/engine.py): a turn whose
        # drafts don't hit pays ~2x plain decode (one (K+1)-token verify
        # per ~1 accepted token), so when the EMA of accepted-per-forward
        # drops below ``spec_min_accept`` the next ``spec_reprobe_turns``
        # turns decode plain, then one speculative turn re-probes.
        self.spec_min_accept = 1.5
        self.spec_reprobe_turns = 4
        self._spec_accept_ema = None
        self._spec_suspended_for = 0

    def send(self, pixel_values: Optional[np.ndarray], question: str,
             generation_config: Optional[GenerationConfig] = None) -> str:
        """One turn: ``pixel_values`` are the NEW image's tiles (from
        ``chat_model.load_pixels``) or None for text-only."""
        import jax
        import jax.numpy as jnp

        from v2pe_tpu.infer import paged_kv as pk
        from v2pe_tpu.infer.chunked_prefill import chunked_prefill
        from v2pe_tpu.models import internvl_chat
        from v2pe_tpu.positional import build_v2pe_pos_ids

        m = self.m
        new_patches = [pixel_values.shape[0]] if pixel_values is not None \
            else []
        if pixel_values is not None and "<image>" not in question:
            question = "<image>\n" + question
        npl = self.num_patches_list + new_patches
        query = m.build_query(question, npl, self.history)
        ids = np.asarray(m.tokenizer(query)["input_ids"], np.int64)
        version = self.cfg.rope_pos_id_version
        if npl and version != "default":
            pos = build_v2pe_pos_ids(
                ids, np.ones_like(ids), npl,
                img_start_id=m.img_start_id, img_end_id=m.img_end_id,
                num_image_token=self.cfg.num_image_token,
                version=version, stride=self.cfg.rope_pos_id_stride)
        else:
            pos = np.arange(len(ids), dtype=np.float32)
        gc0 = generation_config or GenerationConfig()
        spec_slack = gc0.speculative_k + 1 if gc0.speculative_k else 0
        assert len(ids) + gc0.max_new_tokens + spec_slack <= self.max_len, \
            "session max_len exceeded (prompt + max_new_tokens (+K+1 when " \
            "speculative) must fit the pool: decode writes its kv at " \
            "slots past the prompt)"
        # tokenizers are not guaranteed prefix-stable: a BPE merge across
        # the previous-prompt/response boundary can retokenize the shared
        # prefix differently. Roll the consumed pointer (and the cache)
        # back to the longest common prefix — correctness is preserved,
        # only the divergent tail re-prefills.
        prev = getattr(self, "_prev_ids", np.zeros(0, np.int64))
        n = min(self.consumed, len(ids), len(prev))
        eq = np.asarray(ids[:n]) == prev[:n]
        common = int(eq.argmin()) if not eq.all() else n
        if common < self.consumed:
            import jax.numpy as jnp

            self.consumed = common
            self.cache = self.cache._replace(
                lengths=jnp.full((1,), common, jnp.int32))
        suf_ids = ids[self.consumed:]
        suf_pos = pos[self.consumed:].astype(np.float32)
        S = len(suf_ids)
        Sp = -(-max(S, 1) // self.chunk_multiple) * self.chunk_multiple
        pad = Sp - S
        llm = m.params["llm"]
        dtype = llm["tok_embeddings"].dtype

        sids = jnp.asarray(np.pad(suf_ids, (0, pad))[None], jnp.int32)
        spos = jnp.asarray(np.pad(suf_pos, (0, pad))[None])
        seg = jnp.asarray(
            np.pad(np.ones(S, np.int32), (0, pad))[None])
        embeds = llm["tok_embeddings"][sids]
        if pixel_values is not None:
            vit = internvl_chat.extract_feature(
                m.params, self.cfg,
                jnp.asarray(pixel_values, dtype), attn_impl=m.attn_impl)
            embeds = internvl_chat.scatter_image_embeds(
                embeds, sids, vit,
                jnp.ones((pixel_values.shape[0],), jnp.int32),
                m.img_context_token_id)

        hidden, self.cache = chunked_prefill(
            llm, self.cfg.llm, self.cache, inputs_embeds=embeds,
            rope_pos_ids=spos, segment_ids=seg, attn_impl=m.attn_impl,
            return_hidden=True)
        last_hidden = hidden[:, S - 1]
        last_logits = internlm2.head_logits(last_hidden,
                                            llm["output_kernel"])

        gc = generation_config or GenerationConfig()
        stop_ids = tuple(m.conv_template.stop_token_ids) or \
            (self.cfg.llm.eos_token_id,)
        gc = dataclasses.replace(gc, eos_token_ids=stop_ids)
        last_pos = jnp.asarray([float(suf_pos[-1])], jnp.float32)
        want_spec = gc.speculative_k > 0 and not gc.do_sample
        if want_spec and self._spec_suspended_for > 0:
            self._spec_suspended_for -= 1
            if self._spec_suspended_for == 0:
                self._spec_accept_ema = None  # fresh estimate on re-probe
            want_spec = False
        if want_spec:
            # ctx buffer: whole conversation + room for the turn's output,
            # padded to chunk_multiple so compiled shapes stay bounded
            need = len(ids) + gc.max_new_tokens + gc.speculative_k + 9
            width = -(-need // self.chunk_multiple) * self.chunk_multiple
            ctx = np.zeros((1, width), np.int32)
            ctx[0, :len(ids)] = ids
            self.cache, out, lens, steps = _spec_decode_loop(
                llm, self.cache, last_logits, last_pos, jnp.asarray(ctx),
                jnp.asarray([len(ids)], jnp.int32), self.cfg.llm, gc)
            accept = float(np.asarray(lens).sum()) / max(int(steps), 1)
            ema = self._spec_accept_ema
            self._spec_accept_ema = accept if ema is None \
                else 0.5 * ema + 0.5 * accept
            if self._spec_accept_ema < self.spec_min_accept:
                self._spec_suspended_for = self.spec_reprobe_turns
        else:
            self.cache, out, lens = _decode_loop(
                llm, self.cache, last_logits, last_pos, self.cfg.llm, gc,
                jax.random.PRNGKey(0))
        # roll the generated tokens back out of the cache: the next turn
        # re-embeds the response from the template text (see module doc)
        self.cache = self.cache._replace(
            lengths=jnp.full((1,), len(ids), jnp.int32))

        response = m._decode(np.asarray(out[0]), int(np.asarray(lens)[0]))
        self.history.append((question, response))
        self.num_patches_list = npl
        self.consumed = len(ids)
        self._prev_ids = ids
        return response
