#!/usr/bin/env python
"""Secondary benchmark: TTFT + decode throughput on one TPU chip.

Measures the two halves of the BASELINE.json north-star metric on the
flagship InternVL2-2B at a given context length:
  * TTFT — prefill (ViT + LLM with KV cache + last-position logits),
  * decode — steady-state tokens/sec through the in-jit chunked decoder.

Timing uses the in-jit loop pattern required by this box's TPU tunnel
(see bench.py). Prints one JSON line per metric.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq-len", type=int, default=8192)
    p.add_argument("--tiles", type=int, default=8)
    p.add_argument("--decode-tokens", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from v2pe_tpu.core.config import internvl2_2b
    from v2pe_tpu.infer.generate import GenerationConfig
    from v2pe_tpu.infer.streaming import _decode_chunk, _prefill
    from v2pe_tpu.models.params import init_vlm_params
    from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch

    cfg = internvl2_2b()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    batch = make_synthetic_batch(cfg, 1, args.seq_len,
                                 tiles_per_row=args.tiles, stride=64)
    ids = jnp.asarray(batch["input_ids"])
    pos = jnp.asarray(batch["rope_pos_ids"])
    pv = jnp.asarray(batch["pixel_values"]).astype(jnp.bfloat16)
    flags = jnp.asarray(batch["image_flags"])
    gc = GenerationConfig(max_new_tokens=args.decode_tokens)
    rng = jax.random.PRNGKey(0)
    max_total = args.seq_len + gc.max_new_tokens

    # ---- TTFT (prefill): time the jitted prefill via scalar fetch
    tok, cache = _prefill(params, cfg, gc, ids, pos, pv, flags,
                          IMG_CONTEXT_ID, max_total, rng)  # compile
    int(tok[0])
    t0 = time.perf_counter()
    tok, cache = _prefill(params, cfg, gc, ids, pos, pv, flags,
                          IMG_CONTEXT_ID, max_total, rng)
    int(tok[0])  # forces completion through the tunnel
    ttft = time.perf_counter() - t0 - 0.030
    print(json.dumps({"metric": f"ttft_{args.seq_len // 1024}k_ms",
                      "value": round(ttft * 1e3, 1), "unit": "ms",
                      "vs_baseline": 1.0}))

    # ---- decode: one chunked call of N tokens, in-jit fori loop
    done = jnp.zeros((1,), bool)
    pos_last = pos[:, -1] + 1.0
    out = _decode_chunk(params, cfg, gc, cache, tok, pos_last, done, rng,
                        chunk=args.decode_tokens)  # compile
    int(out[4][0, -1])
    t0 = time.perf_counter()
    out = _decode_chunk(params, cfg, gc, cache, tok, pos_last, done, rng,
                        chunk=args.decode_tokens)
    int(out[4][0, -1])
    dt = time.perf_counter() - t0 - 0.030
    print(json.dumps({
        "metric": f"decode_tok_per_sec_{args.seq_len // 1024}k",
        "value": round(args.decode_tokens / dt, 1), "unit": "tok/s",
        "vs_baseline": 1.0}))


if __name__ == "__main__":
    main()
