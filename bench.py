"""Benchmark: InternVL2-2B long-context performance on one TPU chip.

Headline metric (vs_baseline continuity with round 1): packed-prefill
forward throughput at 8k / 8 tiles — ViT tile encode + V2PE pos-id rotary +
decoder with the Pallas flash kernel + full logits head.

`extras` carries the long-context story the headline can't (BASELINE.json
north star): TTFT-path prefill (hidden states + last-position logits only)
at 8k and 32k, TTFT seconds at 32k, and steady-state decode tok/s at 8k
(dense cache) and 32k (paged cache through the Pallas paged-attention
kernel, ops/paged_attention.py).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}
"""

import glob
import json
import os
import sys
import time

SEQ_LEN = 8192
TILES = 8  # 8 x 448x448 tiles -> 2048 visual tokens in the 8k context
RTT = 0.030  # TPU tunnel round trip to subtract from single-fetch timings


def _prev_value(metric: str):
    vals = []
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".",
                                           "BENCH_r*.json"))):
        try:
            d = json.load(open(f))
            d = d.get("parsed", d)  # driver wraps the line under 'parsed'
            if d.get("metric") == metric and isinstance(d.get("value"),
                                                        (int, float)):
                vals.append(float(d["value"]))
        except Exception:
            pass
    return vals[-1] if vals else None


def _headline_prefill(jax, jnp, cfg, params, batch, internvl_chat,
                      IMG_CONTEXT_ID):
    ITERS = 8

    def fwd(params, batch, pixel_values):
        out = internvl_chat.forward(
            params, cfg,
            input_ids=batch["input_ids"],
            pixel_values=pixel_values,
            image_flags=batch["image_flags"],
            rope_pos_ids=batch["rope_pos_ids"],
            img_context_token_id=IMG_CONTEXT_ID,
            segment_ids=batch["segment_ids"],
            token_positions=batch["token_positions"],
            vit_gather_idx=batch["vit_gather_idx"],
        )
        return out.logits[:, -1, :8].astype(jnp.float32).sum()

    # The TPU is reached through a tunnel whose per-call round trip is
    # ~30 ms and where block_until_ready does not synchronize, so the timed
    # loop runs INSIDE one jit; a data dependency through `acc` stops XLA
    # from hoisting the loop-invariant body.
    @jax.jit
    def timed(params, batch):
        def body(i, acc):
            pv = batch["pixel_values"] + acc.astype(jnp.bfloat16) * 1e-12
            return fwd(params, batch, pv)

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    float(timed(params, batch))  # warmup/compile
    t0 = time.perf_counter()
    float(timed(params, batch))  # device-synchronous scalar fetch
    dt = (time.perf_counter() - t0 - RTT) / ITERS
    return SEQ_LEN / dt


def _ttft_prefill(jax, jnp, cfg, params, batch, internvl_chat, internlm2):
    """Prefill the way generate() does: hidden states + last-position
    logits only (the full-seq fp32 logits head is pure TTFT waste)."""
    S = batch["input_ids"].shape[1]

    def prefill(params, batch, pixel_values):
        llm = params["llm"]
        embeds = llm["tok_embeddings"][batch["input_ids"]]
        vit = internvl_chat.extract_feature(params, cfg, pixel_values)
        embeds = internvl_chat.scatter_image_embeds_by_index(
            embeds, vit, batch["vit_gather_idx"])
        hidden, _ = internlm2.llm_forward(
            llm, cfg.llm, inputs_embeds=embeds,
            rope_pos_ids=batch["rope_pos_ids"],
            segment_ids=batch["segment_ids"], return_hidden=True)
        return jnp.dot(hidden[:, -1:], llm["output_kernel"],
                       preferred_element_type=jnp.float32)[:, 0, :8].sum()

    jf = jax.jit(prefill)
    float(jf(params, batch, batch["pixel_values"]))  # compile
    ITERS = 4
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = jf(params, batch, batch["pixel_values"])
    float(r)
    dt = (time.perf_counter() - t0 - RTT) / ITERS
    return S / dt, dt


def _decode_bench(jax, jnp, cfg, params, ctx_len: int, paged: bool,
                  n_tokens: int = 32, page_size: int = 1024):
    """Steady-state decode tok/s at a given context (text-only row; the
    cache dominates, the prompt content doesn't matter)."""
    from v2pe_tpu.models import internlm2
    from v2pe_tpu.models.internlm2 import KVCache

    llm = params["llm"]
    dtype = llm["tok_embeddings"].dtype
    B = 1
    max_len = ctx_len + n_tokens + 8

    ids = jnp.zeros((B, ctx_len), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(ctx_len, dtype=jnp.float32),
                           (B, ctx_len))

    if paged:
        from v2pe_tpu.infer import paged_kv as pk
        MP = -(-max_len // page_size)

        @jax.jit
        def prefill(params, ids, pos):
            # pool created INSIDE jit: a host-side zeros pool would be
            # captured as a multi-GB lowering constant
            cache = pk.PagedKVCache.zeros(cfg.llm, B, B * MP + 1, page_size,
                                          MP, dtype=dtype)
            cache = pk.allocate_rows(
                cache, jnp.full((B,), ctx_len, jnp.int32))
            hidden, cache = internlm2.llm_forward(
                params["llm"], cfg.llm, input_ids=ids, rope_pos_ids=pos,
                paged_cache=cache, return_hidden=True)
            cache = cache._replace(
                lengths=jnp.full((B,), ctx_len, jnp.int32))
            return cache

        @jax.jit
        def decode_n(params, cache, tok):
            def body(i, state):
                cache, tok = state
                cache = pk.allocate_rows(cache, jnp.ones((B,), jnp.int32))
                emb = params["llm"]["tok_embeddings"][tok][:, None, :]
                logits, cache = internlm2.llm_forward(
                    params["llm"], cfg.llm, inputs_embeds=emb,
                    rope_pos_ids=(cache.lengths.astype(jnp.float32))[:, None],
                    paged_cache=cache)
                cache = pk.advance_lengths(cache, 1)
                return cache, jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

            cache, tok = jax.lax.fori_loop(0, n_tokens, body, (cache, tok))
            return tok

        cache = prefill(params, ids, pos)
        tok = jnp.zeros((B,), jnp.int32)
        int(decode_n(params, cache, tok)[0])  # compile
        t0 = time.perf_counter()
        int(decode_n(params, cache, tok)[0])
        dt = time.perf_counter() - t0 - RTT
        return n_tokens / dt

    @jax.jit
    def prefill(params, ids, pos):
        cache = KVCache.zeros(cfg.llm, B, max_len, dtype=dtype)
        _, cache = internlm2.llm_forward(
            params["llm"], cfg.llm, input_ids=ids, rope_pos_ids=pos,
            kv_cache=cache, return_hidden=True)
        return cache

    @jax.jit
    def decode_n(params, cache, tok):
        def body(i, state):
            cache, tok = state
            emb = params["llm"]["tok_embeddings"][tok][:, None, :]
            logits, cache = internlm2.llm_forward(
                params["llm"], cfg.llm, inputs_embeds=emb,
                rope_pos_ids=cache.length.astype(jnp.float32)[None, None],
                kv_cache=cache)
            return cache, jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

        cache, tok = jax.lax.fori_loop(0, n_tokens, body, (cache, tok))
        return tok

    cache = prefill(params, ids, pos)
    tok = jnp.zeros((B,), jnp.int32)
    int(decode_n(params, cache, tok)[0])  # compile
    t0 = time.perf_counter()
    int(decode_n(params, cache, tok)[0])
    dt = time.perf_counter() - t0 - RTT
    return n_tokens / dt


def main():
    import jax
    import jax.numpy as jnp

    from v2pe_tpu.core.config import internvl2_2b
    from v2pe_tpu.models import internlm2, internvl_chat
    from v2pe_tpu.models.params import init_vlm_params
    from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch

    cfg = internvl2_2b()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    def mkbatch(seq, tiles):
        b = make_synthetic_batch(cfg, 1, seq, tiles_per_row=tiles, stride=64)
        b = {k: jnp.asarray(v) for k, v in b.items()}
        b["pixel_values"] = b["pixel_values"].astype(jnp.bfloat16)
        return b

    batch8k = mkbatch(SEQ_LEN, TILES)
    tok_per_s = _headline_prefill(jax, jnp, cfg, params, batch8k,
                                  internvl_chat, IMG_CONTEXT_ID)

    extras = {}
    try:
        tp8, _ = _ttft_prefill(jax, jnp, cfg, params, batch8k,
                               internvl_chat, internlm2)
        extras["prefill_ttftpath_tok_s_8k_8tiles"] = round(tp8, 1)
        batch32k = mkbatch(32768, 32)
        tp32, ttft32 = _ttft_prefill(jax, jnp, cfg, params, batch32k,
                                     internvl_chat, internlm2)
        extras["prefill_ttftpath_tok_s_32k_32tiles"] = round(tp32, 1)
        extras["ttft_s_32k_32tiles"] = round(ttft32, 3)
        del batch32k
        if os.environ.get("V2PE_BENCH_128K"):
            # opt-in: the 128k compile alone takes ~15+ min on this box
            # (measured 2026-08-17: 5,366 tok/s, TTFT 24.4 s, 5.1 GB temp)
            b128 = mkbatch(131072, 64)
            tp128, ttft128 = _ttft_prefill(jax, jnp, cfg, params, b128,
                                           internvl_chat, internlm2)
            extras["prefill_ttftpath_tok_s_128k_64tiles"] = round(tp128, 1)
            extras["ttft_s_128k_64tiles"] = round(ttft128, 3)
            del b128
    except Exception as e:  # never lose the headline to an extra
        extras["prefill_32k_error"] = repr(e)[:200]
    try:
        extras["decode_tok_s_8k_dense"] = round(
            _decode_bench(jax, jnp, cfg, params, 8192, paged=False), 1)
        extras["decode_tok_s_32k_paged"] = round(
            _decode_bench(jax, jnp, cfg, params, 32768, paged=True), 1)
    except Exception as e:
        extras["decode_error"] = repr(e)[:200]

    metric = f"prefill_tokens_per_sec_{SEQ_LEN // 1024}k_{TILES}tiles"
    prev = _prev_value(metric)
    vs = tok_per_s / prev if prev else 1.0
    print(json.dumps({
        "metric": metric,
        "value": round(tok_per_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(vs, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
