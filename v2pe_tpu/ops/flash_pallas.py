"""Pallas TPU flash-attention forward kernel.

TPU-native replacement for the reference's CUDA ``flash_attn_varlen_func``
(modeling_internlm2.py:729-821) and the qkv-packed ViT kernel
(flash_attention.py:15-76). Differences by design:

* varlen/cu_seqlens is replaced by **segment ids** (static shapes; padding is
  segment 0) — the packed-training path's attention_mask-as-cu_seqlens trick
  (dataset_packed.py:623) becomes a (B, S) int32 array;
* GQA is native: the kv block index map folds q-head -> kv-head (h // G), so
  K/V are never materialized per-q-head (the reference calls repeat_kv);
* fp32 accumulation with online softmax; returns the logsumexp so the
  (currently jnp) analytic backward and ring-attention merges can consume it.

Grid: (B, Hq, num_q_blocks, num_kv_blocks) — the kv axis is innermost and
sequential on TPU, with VMEM scratch carrying (acc, m, l) across kv steps.
Causal block skip: when positions are plain arange (``ordered=True``), dead
kv blocks are clamped in the index maps (no DMA) and skipped via pl.when.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _cdiv(a, b):
    return -(-a // b)


def pick_block(S: int, max_block: int) -> int:
    """Largest multiple-of-128 block <= max_block that minimizes grid
    padding (e.g. the ViT's 1025-token tiles pad to 1152 with block 384
    instead of 1536 with block 512 — 25% less attention work)."""
    best_pad, best_b = None, None
    for b in range(128, max_block + 1, 128):
        padded = _cdiv(S, b) * b
        if best_pad is None or padded < best_pad or \
                (padded == best_pad and b > best_b):
            best_pad, best_b = padded, b
    return best_b if best_b is not None else min(S, max_block)


def _rope_block(x, rope_vec, theta: float, sign: float = 1.0):
    """Rotate a (rows, D) fp32 block by the V2PE rotary at the float32 ids
    ``rope_vec`` (rows, 1). sign=-1 applies the transpose rotation."""
    rows, D = x.shape
    half = D // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, D), 1)
    exp = (jax.lax.rem(lane, half).astype(jnp.float32) * (2.0 / D))
    inv = jnp.exp(exp * (-float(np.log(theta))))       # theta^(-2i/D)
    ang = rope_vec * inv                               # (rows, D)
    cos = jnp.cos(ang)
    sin = jnp.sin(ang) * sign
    rot = jnp.concatenate([-x[:, half:], x[:, :half]], axis=1)
    return x * cos + rot * sin


def _kernel(seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref,
            *refs,
            causal: bool, ordered: bool, scale: float,
            block_q: int, block_k: int, num_k_blocks: int,
            rope_theta: float, has_rope_k: bool, precision: str):
    # precision experiment (docs/perf_analysis.md "softmax-bound
    # alternatives"): 'fp32' is the parity kernel; 'bf16qk' feeds the QK^T
    # matmul bf16 operands; 'bf16all' additionally rounds the exp'd
    # probabilities to bf16 for the P.V matmul (a genuine-fp32 operand XLA
    # cannot demote); 'bf16exp' additionally evaluates exp itself on a
    # bf16 argument (halved-width VPU transcendental). Softmax state
    # (m, l, acc) stays fp32 in every mode.
    bf16_qk = precision in ("bf16qk", "bf16all", "bf16exp")
    bf16_pv = precision in ("bf16all", "bf16exp")
    bf16_exp = precision == "bf16exp"
    if rope_theta and has_rope_k:
        (ropeq_ref, ropek_ref, q_ref, k_ref, v_ref, out_ref, lse_ref,
         acc_ref, m_ref, l_ref, qrot_ref) = refs
    elif rope_theta:
        (ropeq_ref, q_ref, k_ref, v_ref, out_ref, lse_ref,
         acc_ref, m_ref, l_ref, qrot_ref) = refs
        ropek_ref = None
    else:
        (q_ref, k_ref, v_ref, out_ref, lse_ref,
         acc_ref, m_ref, l_ref) = refs
    i = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        if rope_theta:
            # rotate q ONCE per q block; the scratch copy rides the kv sweep
            qf = q_ref[0, 0].astype(jnp.float32)
            rq = jnp.swapaxes(ropeq_ref[0], 0, 1)      # (bq, 1)
            qs = _rope_block(qf, rq, rope_theta) * scale
            qrot_ref[...] = qs.astype(qrot_ref.dtype)

    # Static-shape causal block skip (only valid when positions are arange).
    if causal and ordered:
        run = j * block_k <= i * block_q + (block_q - 1)
    else:
        run = True

    @pl.when(run)
    def _compute():
        mm_dtype = jnp.bfloat16 if bf16_qk else jnp.float32
        if rope_theta:
            q = qrot_ref[...]                            # (bq, D) pre-scaled
            k = k_ref[0, 0].astype(jnp.float32)
            if has_rope_k:
                rk = jnp.swapaxes(ropek_ref[0], 0, 1)    # (bk, 1)
                k = _rope_block(k, rk, rope_theta)
            k = k.astype(mm_dtype)
        else:
            # scale in fp32, round once: equivalent error to rounding q
            # then scaling (constant multiply), one (bq, D) pass
            q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(mm_dtype)
            k = k_ref[0, 0].astype(mm_dtype)             # (bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, bk)

        # Full/boundary block split: the per-element mask build + its two
        # selects cost ~as much VPU time as the (bq, bk) matmul costs MXU
        # time, but an interior block of a causal sweep (or any ViT tile
        # block) needs none of it. Classify the block from O(bq + bk)
        # scalar reduces of the segment vectors (padding is segment 0, so
        # ragged tail blocks classify as boundary automatically) plus a
        # causal bound — program-id arithmetic when positions are arange,
        # position-vector reduces otherwise (ring shards).
        seg_qv = seg_q_ref[0]                          # (1, bq)
        seg_kv = seg_k_ref[0]                          # (1, bk)
        sq_min, sq_max = jnp.min(seg_qv), jnp.max(seg_qv)
        sk_min, sk_max = jnp.min(seg_kv), jnp.max(seg_kv)
        full = (sq_min == sq_max) & (sk_min == sk_max) \
            & (sq_min == sk_min) & (sq_min != 0)
        if causal and ordered:
            full &= i * block_q >= j * block_k + (block_k - 1)
        elif causal:
            full &= jnp.min(pos_q_ref[0]) >= jnp.max(pos_k_ref[0])

        m_prev = m_ref[:, :1]                          # (bq, 1)
        l_prev = l_ref[:, :1]
        v = v_ref[0, 0].astype(
            jnp.bfloat16 if bf16_pv else jnp.float32)  # (bk, D)

        def _update(sm):
            # m_new is clamped above NEG_INF/2, so masked scores (NEG_INF)
            # underflow exp to exactly 0 — no masked select on e needed
            # anywhere (the all-masked-row case yields e=0, l=0, and
            # _finalize's l>0 guard emits lse=NEG_INF/out=0 as before)
            m_new = jnp.maximum(jnp.maximum(
                m_prev, jnp.max(sm, axis=-1, keepdims=True)), NEG_INF / 2)
            corr = jnp.exp(m_prev - m_new)
            if bf16_exp:
                e = jnp.exp((sm - m_new).astype(jnp.bfloat16))  # (bq, bk)
                esum = jnp.sum(e.astype(jnp.float32), axis=-1,
                               keepdims=True)
            else:
                e = jnp.exp(sm - m_new)                # (bq, bk)
                esum = jnp.sum(e, axis=-1, keepdims=True)
            # l sums e at fp32 even when the P.V operand is the bf16
            # rounding, so the normalizer stays exact w.r.t. the weights
            l_new = l_prev * corr + esum
            pv = jax.lax.dot_general(
                e if bf16_exp else
                (e.astype(jnp.bfloat16) if bf16_pv else e),
                v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (bq, D)
            acc_ref[...] = acc_ref[...] * corr + pv
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(full)
        def _full_block():
            _update(s)

        if causal:
            @pl.when(jnp.logical_not(full))
            def _boundary_block():
                # 2D index math (TPU Mosaic prefers >=2D iota/broadcasts)
                seg_q = jnp.swapaxes(seg_qv, 0, 1)     # (bq, 1)
                mask = (seg_q == seg_kv) & (seg_q != 0)
                pos_q = jnp.swapaxes(pos_q_ref[0], 0, 1)
                mask &= pos_q >= pos_k_ref[0]
                _update(jnp.where(mask, s, NEG_INF))
        else:
            # non-causal (ViT tiles): when live q and k share ONE segment
            # and the only other value is padding (segment 0), q-side
            # masking is unnecessary — padded q rows' outputs are sliced
            # away by the caller and their cotangents are zero in the
            # backward — so the 2-D mask collapses to a (1, bk) k-padding
            # select. This is every 1025-token tile block (padded to 1152).
            kq = (sq_max == sk_max) & (sq_max != 0) \
                & jnp.all((seg_qv == 0) | (seg_qv == sq_max)) \
                & jnp.all((seg_kv == 0) | (seg_kv == sk_max))

            @pl.when(jnp.logical_not(full) & kq)
            def _k_padding_block():
                _update(jnp.where(seg_kv != 0, s, NEG_INF))

            @pl.when(jnp.logical_not(full) & jnp.logical_not(kq))
            def _boundary_block():
                seg_q = jnp.swapaxes(seg_qv, 0, 1)     # (bq, 1)
                mask = (seg_q == seg_kv) & (seg_q != 0)
                _update(jnp.where(mask, s, NEG_INF))

    @pl.when(j == num_k_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l > 0, l, 1.0)
        out_ref[0, 0] = (acc_ref[...] / l_safe).astype(out_ref.dtype)
        m = m_ref[:, :1]
        lse = jnp.where(l > 0, m + jnp.log(l_safe), NEG_INF)  # (bq, 1)
        # lse output is (B, Hq, Sq_p) with Sq on the LANE dim: a trailing
        # singleton gets lane-padded 128x by the (8,128) HBM tiling —
        # 256 MB instead of 2 MB at 32k, 2.1 GB at 256k (the round-5 32k
        # train-step OOM). One (bq,1)->(1,bq) relayout per block is noise.
        lse_ref[0] = jnp.swapaxes(lse, 0, 1)


def flash_attention_fwd_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    seg_q: jnp.ndarray,
    seg_k: jnp.ndarray,
    pos_q: jnp.ndarray,
    pos_k: jnp.ndarray,
    *,
    causal: bool,
    scale: float,
    block_q: int = 512,   # tuned on v5e: (512,1024) reaches ~100 TFLOPs at 8k
    block_k: int = 1024,
    ordered: bool = True,
    interpret: bool = False,
    rope_q=None,
    rope_k=None,
    rope_theta: float = 0.0,
    precision: str = "fp32",
):
    """Forward flash attention. Layout/contract matches attention.py:
    q (B,Sq,Hq,D), k/v (B,Sk,Hkv,D) -> out (B,Sq,Hq,D), lse (B,Hq,Sq) fp32.

    rope_theta > 0: q/k arrive unrotated; the V2PE rotary is applied inside
    the kernel from the (B, S) float32 ``rope_q``/``rope_k`` id vectors (q
    rotated once per block into scratch; k per visit).
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = Hq // Hkv

    bq = pick_block(Sq, block_q) if Sq >= 128 else min(block_q, Sq)
    bk = pick_block(Sk, block_k) if Sk >= 128 else min(block_k, Sk)
    nq, nk = _cdiv(Sq, bq), _cdiv(Sk, bk)
    Sq_p, Sk_p = nq * bq, nk * bk

    def padax(x, axis, target, value=0):
        pad = target - x.shape[axis]
        if pad == 0:
            return x
        w = [(0, 0)] * x.ndim
        w[axis] = (0, pad)
        return jnp.pad(x, w, constant_values=value)

    # BHSD layout for efficient (bq, D) VMEM tiles.
    qt = padax(jnp.swapaxes(q, 1, 2), 2, Sq_p)          # (B,Hq,Sq,D)
    kt = padax(jnp.swapaxes(k, 1, 2), 2, Sk_p)          # (B,Hkv,Sk,D)
    vt = padax(jnp.swapaxes(v, 1, 2), 2, Sk_p)
    # (B, 1, S) layout: Mosaic requires the last-two block dims to divide
    # (8, 128) or equal the array dims — (1, bq) blocks of a (B, S) array
    # are rejected on hardware, (1, 1, bq) blocks of (B, 1, S) are fine.
    seg_q = padax(seg_q, 1, Sq_p)[:, None, :]           # pad -> segment 0
    seg_k = padax(seg_k, 1, Sk_p)[:, None, :]
    pos_q = padax(pos_q, 1, Sq_p, value=-1)[:, None, :]
    pos_k = padax(pos_k, 1, Sk_p, value=2**30)[:, None, :]

    if causal and ordered:
        # Clamp dead kv blocks onto the diagonal block: no extra DMA.
        def kv_index(b, h, i, j):
            jc = jnp.minimum(j, jax.lax.div(i * bq + bq - 1, bk))
            return (b, jax.lax.div(h, G), jc, 0)

        def kv_vec_index(b, h, i, j):
            jc = jnp.minimum(j, jax.lax.div(i * bq + bq - 1, bk))
            return (b, 0, jc)
    else:
        def kv_index(b, h, i, j):
            return (b, jax.lax.div(h, G), j, 0)

        def kv_vec_index(b, h, i, j):
            return (b, 0, j)

    grid = (B, Hq, nq, nk)
    kernel = functools.partial(
        _kernel, causal=causal, ordered=ordered, scale=scale,
        block_q=bq, block_k=bk, num_k_blocks=nk,
        rope_theta=float(rope_theta), has_rope_k=rope_k is not None,
        precision=precision)

    operands = [seg_q, seg_k, pos_q, pos_k]
    in_specs = [
        pl.BlockSpec((1, 1, bq), lambda b, h, i, j: (b, 0, i)),    # seg_q
        pl.BlockSpec((1, 1, bk), kv_vec_index),                     # seg_k
        pl.BlockSpec((1, 1, bq), lambda b, h, i, j: (b, 0, i)),    # pos_q
        pl.BlockSpec((1, 1, bk), kv_vec_index),                     # pos_k
    ]
    scratch = [
        pltpu.VMEM((bq, D), jnp.float32),
        pltpu.VMEM((bq, LANES), jnp.float32),
        pltpu.VMEM((bq, LANES), jnp.float32),
    ]
    if rope_theta:
        ropeq = padax(rope_q.astype(jnp.float32), 1, Sq_p)[:, None, :]
        operands += [ropeq]
        in_specs += [pl.BlockSpec((1, 1, bq), lambda b, h, i, j: (b, 0, i))]
        if rope_k is not None:
            ropek = padax(rope_k.astype(jnp.float32), 1, Sk_p)[:, None, :]
            operands += [ropek]
            in_specs += [pl.BlockSpec((1, 1, bk), kv_vec_index)]
        scratch.append(pltpu.VMEM(
            (bq, D),
            jnp.float32 if precision == "fp32"
            else jnp.bfloat16))  # rotated pre-scaled q
    operands += [qt, kt, vt]
    in_specs += [
        pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),
        pl.BlockSpec((1, 1, bk, D), kv_index),
        pl.BlockSpec((1, 1, bk, D), kv_index),
    ]

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),
            # (B*Hq, 1, Sq_p): Mosaic wants the block's second-to-last dim
            # to divide 8 or equal the array dim — fold heads into the
            # leading dim so the middle dim is exactly 1 (the same shape
            # contract the seg/pos vector operands use)
            pl.BlockSpec((1, 1, bq), lambda b, h, i, j: (b * Hq + h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B * Hq, 1, Sq_p), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # the full/boundary branch split duplicates the softmax-update
            # body; the ViT's single-block (1152, 1152) tile shape then
            # peaks at 16.34M scoped vmem — just over the 16M default
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)

    out = jnp.swapaxes(out[:, :, :Sq], 1, 2)  # (B,Sq,Hq,D)
    lse = lse.reshape(B, Hq, Sq_p)[:, :, :Sq]  # (B,Hq,Sq)
    return out, lse
