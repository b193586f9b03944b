#!/usr/bin/env python
"""Measure (don't argue) the flash-forward softmax-bound alternatives.

VERDICT r3 #6: the parity kernel casts both matmul operand pairs to fp32,
which the MXU executes as a multi-pass emulation; the declined-by-reasoning
alternatives are measured here instead:

  fp32    parity kernel (QK^T and P.V in fp32, fp32 softmax state)
  bf16qk  QK^T operands bf16 (MXU-native), scores/softmax/P.V fp32
  bf16all bf16qk + the exp'd probabilities rounded to bf16 for P.V
          (a genuine-fp32 MXU operand XLA cannot auto-demote)
  bf16exp bf16all + exp evaluated on a bf16 argument (the VERDICT's
          "bf16 exp": halved-width VPU transcendental)

For each mode, at the production LLM dims (InternVL2-2B decoder: 8k causal
GQA, with and without the fused V2PE q-rope), prints effective TFLOP/s and
two deviation measures on random bf16 inputs:

  dev_vs_fp32   max-abs vs the parity kernel's output (same inputs)
  dev_vs_dense  max-abs vs a dense fp32-softmax reference — the yardstick:
                if a mode's dev_vs_dense matches the parity kernel's own,
                the speed is free accuracy-wise.

Results + keep/kill decision recorded in docs/perf_analysis.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import internvl2_2b
from v2pe_tpu.ops.flash_pallas import flash_attention_fwd_pallas

ITERS = 16
RTT = 0.030  # TPU tunnel round trip (same constant bench.py subtracts)


def dense_ref(q, k, v, scale, rope_q=None, rope_k=None, theta=0.0):
    """fp32 dense causal softmax reference (GQA via head folding)."""
    if theta:
        from v2pe_tpu.ops.rope import apply_rotary, compute_rope_cos_sin

        cq, sq = compute_rope_cos_sin(rope_q, q.shape[-1], theta)
        q = apply_rotary(q, cq, sq)
        ck, sk = compute_rope_cos_sin(rope_k, k.shape[-1], theta)
        k = apply_rotary(k, ck, sk)
    B, S, Hq, D = q.shape
    G = Hq // k.shape[2]
    kf = jnp.repeat(k.astype(jnp.float32), G, axis=2)
    vf = jnp.repeat(v.astype(jnp.float32), G, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), kf) * scale
    mask = jnp.tril(jnp.ones((S, S), bool))
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vf)


def main():
    lcfg = internvl2_2b().llm
    S, Hq, Hkv, D = 8192, lcfg.num_attention_heads, \
        lcfg.num_key_value_heads, lcfg.head_dim
    scale = D ** -0.5
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, S, Hq, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, S, Hkv, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, S, Hkv, D), jnp.bfloat16)
    seg = jnp.ones((1, S), jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]
    ropef = pos.astype(jnp.float32)
    theta = lcfg.rope_theta

    flops = 2 * 2 * (S * S / 2) * D * Hq

    print(f"dims: S={S} Hq={Hq} Hkv={Hkv} D={D} "
          f"(InternVL2-2B decoder), {ITERS}-iter in-jit loop")
    for fused_rope in (False, True):
        rq = ropef if fused_rope else None
        rk = ropef if fused_rope else None
        th = theta if fused_rope else 0.0
        ref = np.asarray(dense_ref(q, k, v, scale, rq, rk, th)[0],
                         np.float32)
        outs = {}
        for prec in ("fp32", "bf16qk", "bf16all", "bf16exp"):
            def fwd(q, k, v, _p=prec):
                o, _ = flash_attention_fwd_pallas(
                    q, k, v, seg, seg, pos, pos, causal=True, scale=scale,
                    rope_q=rq, rope_k=rk, rope_theta=th, precision=_p)
                return o

            @jax.jit
            def loop(q, k, v):
                def body(i, acc):
                    o = fwd(q + acc * 1e-12, k, v)
                    return o[0, -1, 0, 0].astype(jnp.float32)

                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

            float(loop(q, k, v))  # compile
            t0 = time.perf_counter()
            float(loop(q, k, v))
            dt = (time.perf_counter() - t0 - RTT) / ITERS
            out = np.asarray(fwd(q, k, v)[0], np.float32)
            outs[prec] = out
            dev_dense = float(np.abs(out - ref).max())
            dev_fp32 = float(np.abs(out - outs["fp32"]).max())
            print(f"rope={'fused' if fused_rope else 'none '} "
                  f"{prec:8s} {flops / dt / 1e12:7.1f} TF/s   "
                  f"dev_vs_fp32={dev_fp32:.2e}  dev_vs_dense={dev_dense:.2e}")


if __name__ == "__main__":
    main()
