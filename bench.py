"""Benchmark: InternVL2-2B packed prefill throughput on one TPU chip.

Measures end-to-end forward throughput (ViT tile encode + V2PE pos-id rotary
+ decoder w/ Pallas flash attention) in tokens/sec on a packed multimodal
sequence — the framework's hot path and the precursor of the north-star
metric (visual tokens/sec/chip, BASELINE.json).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: ratio against the previous recorded round (BENCH_r*.json in the
repo root) so the driver sees round-over-round movement; 1.0 on first run
(the reference publishes no throughput numbers — BASELINE.md).
"""

import glob
import json
import os
import sys
import time

SEQ_LEN = 8192
TILES = 8  # 8 x 448x448 tiles -> 2048 visual tokens in the 8k context


def _prev_value(metric: str):
    vals = []
    for f in sorted(glob.glob(os.path.join(os.path.dirname(__file__) or ".",
                                           "BENCH_r*.json"))):
        try:
            d = json.load(open(f))
            if d.get("metric") == metric and isinstance(d.get("value"),
                                                        (int, float)):
                vals.append(float(d["value"]))
        except Exception:
            pass
    return vals[-1] if vals else None


def main():
    import jax
    import jax.numpy as jnp

    from v2pe_tpu.core.config import internvl2_2b
    from v2pe_tpu.models import internvl_chat
    from v2pe_tpu.models.params import init_vlm_params
    from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch

    cfg = internvl2_2b()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    batch = make_synthetic_batch(cfg, 1, SEQ_LEN, tiles_per_row=TILES,
                                 stride=64)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["pixel_values"] = batch["pixel_values"].astype(jnp.bfloat16)

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
    dt = (time.perf_counter() - t0 - 0.030) / ITERS  # subtract tunnel RTT

    tok_per_s = SEQ_LEN / dt
    metric = f"prefill_tokens_per_sec_{SEQ_LEN // 1024}k_{TILES}tiles"
    prev = _prev_value(metric)
    vs = tok_per_s / prev if prev else 1.0
    print(json.dumps({
        "metric": metric,
        "value": round(tok_per_s, 1),
        "unit": "tok/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
