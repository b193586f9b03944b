"""Flash attention for v2pe_tpu.

Replaces the reference's CUDA flash-attn dependency
(``flash_attn_varlen_func`` / qkv-packed variants, modeling_internlm2.py:52-63,
flash_attention.py:6-12, patch/internlm2_packed_training_patch.py:19-75) with:

* a Pallas TPU forward kernel (``v2pe_tpu.ops.flash_pallas``) — causal /
  bidirectional, segment-id block masking (the cu_seqlens replacement), GQA,
  fp32 accumulation; and
* a doubly-blocked pure-jnp fallback (runs anywhere, O(S) memory); the
  backward dispatches to the Pallas dq/dkv kernels on TPU
  (``flash_pallas_bwd``) and the analytic jnp blocked backward elsewhere —
  both locally and per ring rotation (``parallel/ring.py``).

Layout: q (B, Sq, Hq, D); k/v (B, Sk, Hkv, D); segment ids (B, S) int32 with
0 = padding; positions (B, S) int32 global token indices used for causality
(ring-attention shards pass their global offsets through these).

The public entry is :func:`flash_attention`. It is differentiable via
``jax.custom_vjp`` (analytic flash backward, recomputing probabilities
blockwise from the saved logsumexp).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class AttnStatics(NamedTuple):
    """Hashable per-call statics (custom_vjp nondiff argument)."""

    causal: bool
    scale: float
    block_q: int
    block_k: int
    impl: str  # 'jnp' | 'pallas'
    ordered: bool = True  # positions are plain arange (enables block skip)
    interpret: bool = False
    rope_theta: float = 0.0  # >0: rotary fused INTO the kernel from the
    # rope_q/rope_k fp32 id vectors (saves the q/k HBM round trips of a
    # jnp-level apply_rotary — measured ~8% of LLM prefill). Note: mask
    # skipping does NOT need a static dense flag — both the jnp fallback
    # and the Pallas kernel classify each block dead/full/boundary at
    # runtime from O(block) segment/position min-max summaries.


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_axis(x: jnp.ndarray, axis: int, target: int, value=0):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _block_mask(seg_q, seg_k, pos_q, pos_k, causal: bool):
    """(bq, bk) boolean mask for one (q block, k block) pair."""
    m = (seg_q[:, None] == seg_k[None, :]) & (seg_q[:, None] != 0)
    if causal:
        m = m & (pos_q[:, None] >= pos_k[None, :])
    return m


# ---------------------------------------------------------------------------
# Doubly-blocked jnp forward (per batch row; vmapped over B)
# ---------------------------------------------------------------------------


def _fwd_jnp_1b(q, k, v, seg_q, seg_k, pos_q, pos_k, statics: AttnStatics):
    """q (Sq,Hq,D), k/v (Sk,Hkv,D). Returns out (Sq,Hq,D), lse (Hq,Sq) fp32."""
    Sq, Hq, D = q.shape
    Sk, Hkv, _ = k.shape
    G = Hq // Hkv
    bq, bk = min(statics.block_q, Sq), min(statics.block_k, Sk)
    nq, nk = _cdiv(Sq, bq), _cdiv(Sk, bk)
    Sq_p, Sk_p = nq * bq, nk * bk
    q = _pad_axis(q, 0, Sq_p)
    seg_q = _pad_axis(seg_q, 0, Sq_p)
    pos_q = _pad_axis(pos_q, 0, Sq_p, value=-1)
    k = _pad_axis(k, 0, Sk_p)
    v = _pad_axis(v, 0, Sk_p)
    seg_k = _pad_axis(seg_k, 0, Sk_p)
    pos_k = _pad_axis(pos_k, 0, Sk_p, value=2**30)

    kr = jnp.reshape(k, (nk, bk, Hkv, D))
    vr = jnp.reshape(v, (nk, bk, Hkv, D))
    seg_kr = jnp.reshape(seg_k, (nk, bk))
    pos_kr = jnp.reshape(pos_k, (nk, bk))
    # per-block segment/position summaries — O(S) — classify every (q, k)
    # block pair as dead / fully-live / partial from scalars alone, so the
    # O(bq*bk) element mask is built ONLY for boundary blocks. Without this
    # the mask iota-compares dominate the jnp impl (they are O(S^2) memory
    # traffic regardless of sparsity) and, with constant segment inputs,
    # got constant-folded at trace time into full-S^2 reduce-windows.
    sk_mins, sk_maxs = seg_kr.min(axis=1), seg_kr.max(axis=1)
    pk_mins, pk_maxs = pos_kr.min(axis=1), pos_kr.max(axis=1)

    def q_block(qi):
        qb = jax.lax.dynamic_slice_in_dim(q, qi * bq, bq, 0)  # (bq,Hq,D)
        sqb = jax.lax.dynamic_slice_in_dim(seg_q, qi * bq, bq, 0)
        pqb = jax.lax.dynamic_slice_in_dim(pos_q, qi * bq, bq, 0)
        qf = qb.astype(jnp.float32) * statics.scale
        sq_min, sq_max = jnp.min(sqb), jnp.max(sqb)
        pq_min, pq_max = jnp.min(pqb), jnp.max(pqb)

        def kv_step(carry, inp):
            kb, vb, skb, pkb, sk_min, sk_max, pk_min, pk_max = inp

            def compute(carry, mask):
                acc, m, l = carry
                kf = kb.astype(jnp.float32)
                if G > 1:
                    kf = jnp.repeat(kf, G, axis=1)
                s = jnp.einsum("qhd,khd->hqk", qf, kf,
                               preferred_element_type=jnp.float32)
                if mask is not None:
                    s = jnp.where(mask[None, :, :], s, NEG_INF)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1))  # (Hq,bq)
                e = jnp.exp(s - m_new[..., None])
                if mask is not None:
                    e = jnp.where(mask[None], e, 0.0)
                corr = jnp.exp(m - m_new)  # (Hq,bq)
                l_new = l * corr + jnp.sum(e, axis=-1)
                vf = vb.astype(jnp.float32)
                if G > 1:
                    vf = jnp.repeat(vf, G, axis=1)
                pv = jnp.einsum("hqk,khd->hqd", e, vf,
                                preferred_element_type=jnp.float32)
                acc = acc * corr[..., None] + pv
                return acc, m_new, l_new

            def masked(carry):
                return compute(carry, _block_mask(sqb, skb, pqb, pkb,
                                                  statics.causal))

            # dead: segment ranges disjoint, all-padding, or (causal)
            # strictly-future keys. fully-live: both blocks one identical
            # non-padding segment and (causal) keys entirely <= queries.
            dead = (sq_max < sk_min) | (sk_max < sq_min) \
                | (sk_max == 0) | (sq_max == 0)
            full = (sq_min == sq_max) & (sk_min == sk_max) \
                & (sq_min == sk_min) & (sq_min != 0)
            if statics.causal:
                dead = dead | (pq_max < pk_min)
                full = full & (pq_min >= pk_max)
            idx = jnp.where(dead, 0, jnp.where(full, 2, 1))
            return jax.lax.switch(
                idx, [lambda c: c, masked, lambda c: compute(c, None)],
                carry), None

        init = (
            jnp.zeros((Hq, bq, D), jnp.float32),
            jnp.full((Hq, bq), NEG_INF, jnp.float32),
            jnp.zeros((Hq, bq), jnp.float32),
        )
        (acc, m, l), _ = jax.lax.scan(
            kv_step, init,
            (kr, vr, seg_kr, pos_kr, sk_mins, sk_maxs, pk_mins, pk_maxs))
        l_safe = jnp.where(l > 0, l, 1.0)
        out = (acc / l_safe[..., None]).astype(q.dtype)  # (Hq,bq,D)
        lse = jnp.where(l > 0, m + jnp.log(l_safe), NEG_INF)  # (Hq,bq)
        return jnp.swapaxes(out, 0, 1), lse  # (bq,Hq,D), (Hq,bq)

    outs, lses = jax.lax.map(q_block, jnp.arange(nq))
    out = jnp.reshape(outs, (Sq_p, Hq, D))[:Sq]
    lse = jnp.reshape(jnp.swapaxes(lses, 0, 1).reshape(Hq, Sq_p), (Hq, Sq_p))[:, :Sq]
    return out, lse


# ---------------------------------------------------------------------------
# Analytic flash backward (jnp, doubly blocked, per batch row)
# ---------------------------------------------------------------------------


def _bwd_jnp_1b(q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse, do,
                statics: AttnStatics):
    Sq, Hq, D = q.shape
    Sk, Hkv, _ = k.shape
    G = Hq // Hkv
    bq, bk = min(statics.block_q, Sq), min(statics.block_k, Sk)
    nq, nk = _cdiv(Sq, bq), _cdiv(Sk, bk)
    Sq_p, Sk_p = nq * bq, nk * bk

    # di = rowsum(dO * O) per (Hq, Sq)
    di = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.swapaxes(di, 0, 1)  # (Hq, Sq)

    q = _pad_axis(q, 0, Sq_p)
    do_p = _pad_axis(do, 0, Sq_p)
    seg_q = _pad_axis(seg_q, 0, Sq_p)
    pos_q = _pad_axis(pos_q, 0, Sq_p, value=-1)
    lse_p = _pad_axis(lse, 1, Sq_p, value=NEG_INF)
    di_p = _pad_axis(di, 1, Sq_p)
    k = _pad_axis(k, 0, Sk_p)
    v = _pad_axis(v, 0, Sk_p)
    seg_k = _pad_axis(seg_k, 0, Sk_p)
    pos_k = _pad_axis(pos_k, 0, Sk_p, value=2**30)

    qr = jnp.reshape(q, (nq, bq, Hq, D))
    dor = jnp.reshape(do_p, (nq, bq, Hq, D))
    seg_qr = jnp.reshape(seg_q, (nq, bq))
    pos_qr = jnp.reshape(pos_q, (nq, bq))
    lser = jnp.reshape(lse_p, (Hq, nq, bq))
    dir_ = jnp.reshape(di_p, (Hq, nq, bq))

    kr = jnp.reshape(k, (nk, bk, Hkv, D))
    vr = jnp.reshape(v, (nk, bk, Hkv, D))
    seg_kr = jnp.reshape(seg_k, (nk, bk))
    pos_kr = jnp.reshape(pos_k, (nk, bk))

    # block-level liveness summaries (see _fwd_jnp_1b): classify each pair
    # dead/full/partial from scalars; element masks only at boundaries
    sq_mins, sq_maxs = seg_qr.min(axis=1), seg_qr.max(axis=1)
    pq_mins, pq_maxs = pos_qr.min(axis=1), pos_qr.max(axis=1)
    sk_mins, sk_maxs = seg_kr.min(axis=1), seg_kr.max(axis=1)
    pk_mins, pk_maxs = pos_kr.min(axis=1), pos_kr.max(axis=1)

    def _liveness(sq_min, sq_max, pq_min, pq_max,
                  sk_min, sk_max, pk_min, pk_max):
        dead = (sq_max < sk_min) | (sk_max < sq_min) \
            | (sk_max == 0) | (sq_max == 0)
        full = (sq_min == sq_max) & (sk_min == sk_max) \
            & (sq_min == sk_min) & (sq_min != 0)
        if statics.causal:
            dead = dead | (pq_max < pk_min)
            full = full & (pq_min >= pk_max)
        return jnp.where(dead, 0, jnp.where(full, 2, 1))

    def _p_ds(qb, kb, lse_b, di_b, dob, vb, mask):
        """Recompute probabilities and dS for one (q,k) block pair."""
        kf = kb.astype(jnp.float32)
        vf = vb.astype(jnp.float32)
        if G > 1:
            kf = jnp.repeat(kf, G, axis=1)
            vf = jnp.repeat(vf, G, axis=1)
        qf = qb.astype(jnp.float32) * statics.scale
        s = jnp.einsum("qhd,khd->hqk", qf, kf,
                       preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse_b[..., None])
        if mask is not None:
            p = jnp.where(mask[None], p, 0.0)
        dp = jnp.einsum("qhd,khd->hqk", dob.astype(jnp.float32), vf,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - di_b[..., None])  # (Hq,bq,bk)
        return p, ds, kf

    # Pass 1: dk, dv — scan over kv blocks, inner scan over q blocks.
    def kv_block(_, ki):
        kb, vb = kr[ki], vr[ki]
        skb, pkb = seg_kr[ki], pos_kr[ki]
        sk_min, sk_max = sk_mins[ki], sk_maxs[ki]
        pk_min, pk_max = pk_mins[ki], pk_maxs[ki]

        def q_step(carry, inp):
            (qb, dob, sqb, pqb, lse_b, di_b,
             sq_min, sq_max, pq_min, pq_max) = inp

            def compute(carry, mask):
                dk_acc, dv_acc = carry
                p, ds, _ = _p_ds(qb, kb, lse_b, di_b, dob, vb, mask)
                dv_b = jnp.einsum("hqk,qhd->khd", p, dob.astype(jnp.float32),
                                  preferred_element_type=jnp.float32)
                dk_b = jnp.einsum("hqk,qhd->khd", ds,
                                  qb.astype(jnp.float32) * statics.scale,
                                  preferred_element_type=jnp.float32)
                if G > 1:  # fold Hq back onto Hkv groups
                    dv_b = dv_b.reshape(bk, Hkv, G, D).sum(axis=2)
                    dk_b = dk_b.reshape(bk, Hkv, G, D).sum(axis=2)
                return dk_acc + dk_b, dv_acc + dv_b

            def masked(carry):
                return compute(carry, _block_mask(sqb, skb, pqb, pkb,
                                                  statics.causal))

            idx = _liveness(sq_min, sq_max, pq_min, pq_max,
                            sk_min, sk_max, pk_min, pk_max)
            return jax.lax.switch(
                idx, [lambda c: c, masked, lambda c: compute(c, None)],
                carry), None

        init = (jnp.zeros((bk, Hkv, D), jnp.float32),
                jnp.zeros((bk, Hkv, D), jnp.float32))
        (dk_b, dv_b), _ = jax.lax.scan(
            q_step, init,
            (qr, dor, seg_qr, pos_qr,
             jnp.swapaxes(lser, 0, 1), jnp.swapaxes(dir_, 0, 1),
             sq_mins, sq_maxs, pq_mins, pq_maxs))
        return None, (dk_b, dv_b)

    _, (dk_blocks, dv_blocks) = jax.lax.scan(kv_block, None, jnp.arange(nk))
    dk = jnp.reshape(dk_blocks, (Sk_p, Hkv, D))[:Sk].astype(k.dtype)
    dv = jnp.reshape(dv_blocks, (Sk_p, Hkv, D))[:Sk].astype(v.dtype)

    # Pass 2: dq — scan over q blocks, inner scan over kv blocks.
    def q_block(_, qi):
        qb, dob = qr[qi], dor[qi]
        sqb, pqb = seg_qr[qi], pos_qr[qi]
        lse_b, di_b = lser[:, qi], dir_[:, qi]
        sq_min, sq_max = sq_mins[qi], sq_maxs[qi]
        pq_min, pq_max = pq_mins[qi], pq_maxs[qi]

        def kv_step(dq_acc, inp):
            kb, vb, skb, pkb, sk_min, sk_max, pk_min, pk_max = inp

            def compute(dq_acc, mask):
                _, ds, kf = _p_ds(qb, kb, lse_b, di_b, dob, vb, mask)
                dq_b = jnp.einsum("hqk,khd->qhd", ds, kf,
                                  preferred_element_type=jnp.float32)
                return dq_acc + dq_b * statics.scale

            def masked(dq_acc):
                return compute(dq_acc, _block_mask(sqb, skb, pqb, pkb,
                                                   statics.causal))

            idx = _liveness(sq_min, sq_max, pq_min, pq_max,
                            sk_min, sk_max, pk_min, pk_max)
            return jax.lax.switch(
                idx, [lambda c: c, masked, lambda c: compute(c, None)],
                dq_acc), None

        dq_b, _ = jax.lax.scan(
            kv_step, jnp.zeros((bq, Hq, D), jnp.float32),
            (kr, vr, seg_kr, pos_kr, sk_mins, sk_maxs, pk_mins, pk_maxs))
        return None, dq_b

    _, dq_blocks = jax.lax.scan(q_block, None, jnp.arange(nq))
    dq = jnp.reshape(dq_blocks, (Sq_p, Hq, D))[:Sq].astype(q.dtype)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp plumbing
# ---------------------------------------------------------------------------


def _apply_rope_jnp(q, k, rope_q, rope_k, theta):
    """rope_k=None means only q is (still) unrotated (q-only fusion)."""
    from v2pe_tpu.ops.rope import apply_rotary, compute_rope_cos_sin

    cos_q, sin_q = compute_rope_cos_sin(rope_q, q.shape[-1], theta)
    q = apply_rotary(q, cos_q, sin_q)
    if rope_k is not None:
        cos_k, sin_k = compute_rope_cos_sin(rope_k, k.shape[-1], theta)
        k = apply_rotary(k, cos_k, sin_k)
    return q, k


def _rope_transpose(g, rope, theta):
    """R^T for the rotation R = cos*I + sin*rot_half (rot_half^T =
    -rot_half): maps a gradient w.r.t. rotated states back to the
    pre-rotation states."""
    from v2pe_tpu.ops.rope import _rotate_half, compute_rope_cos_sin

    cos, sin = compute_rope_cos_sin(rope, g.shape[-1], theta)
    cos, sin = cos[..., None, :], sin[..., None, :]
    gf = g.astype(jnp.float32)
    return (gf * cos - _rotate_half(gf) * sin).astype(g.dtype)


def _fwd_dispatch(statics: AttnStatics, q, k, v, seg_q, seg_k, pos_q, pos_k,
                  rope_q=None, rope_k=None):
    if statics.impl == "pallas":
        from v2pe_tpu.ops import flash_pallas

        return flash_pallas.flash_attention_fwd_pallas(
            q, k, v, seg_q, seg_k, pos_q, pos_k,
            causal=statics.causal, scale=statics.scale,
            block_q=statics.block_q, block_k=statics.block_k,
            ordered=statics.ordered, interpret=statics.interpret,
            rope_q=rope_q, rope_k=rope_k, rope_theta=statics.rope_theta,
            # experiment gate (docs/perf_analysis.md): fp32 (parity,
            # default) | bf16qk | bf16all — forward matmul operand dtypes
            precision=os.environ.get("V2PE_FLASH_PRECISION", "fp32"))
    if statics.rope_theta:
        q, k = _apply_rope_jnp(q, k, rope_q, rope_k, statics.rope_theta)
    if q.shape[0] == 1:
        # no vmap for a single row: vmap rewrites the liveness
        # cond/switch into compute-all-branches selects (batched
        # predicate), which defeats block skipping — the difference
        # between O(S*segment) and 3x O(S^2) at long context
        out, lse = _fwd_jnp_1b(q[0], k[0], v[0], seg_q[0], seg_k[0],
                               pos_q[0], pos_k[0], statics)
        return out[None], lse[None]
    out, lse = jax.vmap(
        lambda *a: _fwd_jnp_1b(*a, statics))(q, k, v, seg_q, seg_k,
                                             pos_q, pos_k)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(statics: AttnStatics, q, k, v, seg_q, seg_k, pos_q, pos_k,
           rope_q=None, rope_k=None):
    out, _ = _fwd_dispatch(statics, q, k, v, seg_q, seg_k, pos_q, pos_k,
                           rope_q, rope_k)
    return out


def _flash_fwd(statics, q, k, v, seg_q, seg_k, pos_q, pos_k,
               rope_q=None, rope_k=None):
    out, lse = _fwd_dispatch(statics, q, k, v, seg_q, seg_k, pos_q, pos_k,
                             rope_q, rope_k)
    return out, (q, k, v, seg_q, seg_k, pos_q, pos_k, rope_q, rope_k, out,
                 lse)


def _bwd_dispatch(statics: AttnStatics, q, k, v, seg_q, seg_k, pos_q, pos_k,
                  out, lse, do, rope_q=None, rope_k=None):
    """Backward kernel dispatch shared by the local custom_vjp and the ring
    backward (parallel/ring.py uses it per rotation step)."""
    if statics.impl == "pallas":
        from v2pe_tpu.ops import flash_pallas_bwd

        return flash_pallas_bwd.flash_attention_bwd_pallas(
            q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse, do,
            causal=statics.causal, scale=statics.scale,
            block_q=statics.block_q, block_k=statics.block_k,
            ordered=statics.ordered, interpret=statics.interpret,
            rope_q=rope_q, rope_k=rope_k, rope_theta=statics.rope_theta)
    def bwd_rows(q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse, do):
        if q.shape[0] == 1:  # see _fwd_dispatch: vmap defeats block skip
            dq, dk, dv = _bwd_jnp_1b(q[0], k[0], v[0], seg_q[0], seg_k[0],
                                     pos_q[0], pos_k[0], out[0], lse[0],
                                     do[0], statics)
            return dq[None], dk[None], dv[None]
        return jax.vmap(
            lambda *a: _bwd_jnp_1b(*a, statics))(q, k, v, seg_q, seg_k,
                                                 pos_q, pos_k, out, lse, do)

    if statics.rope_theta:
        # residuals hold PRE-rotation q/k: rotate for the recomputation,
        # then rotate the resulting dq/dk back (R is orthogonal)
        q_r, k_r = _apply_rope_jnp(q, k, rope_q, rope_k, statics.rope_theta)
        dq, dk, dv = bwd_rows(q_r, k_r, v, seg_q, seg_k, pos_q, pos_k,
                              out, lse, do)
        dq = _rope_transpose(dq, rope_q, statics.rope_theta)
        if rope_k is not None:
            dk = _rope_transpose(dk, rope_k, statics.rope_theta)
        return dq, dk, dv
    return bwd_rows(q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse, do)


def _flash_bwd(statics, res, do):
    q, k, v, seg_q, seg_k, pos_q, pos_k, rope_q, rope_k, out, lse = res
    dq, dk, dv = _bwd_dispatch(statics, q, k, v, seg_q, seg_k, pos_q, pos_k,
                               out, lse, do, rope_q, rope_k)
    return dq, dk, dv, None, None, None, None, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,  # default 512 — tuned on v5e: (512,1024)
    block_k: Optional[int] = None,  # reaches ~100 TFLOPs at 8k. Overridable
    # via V2PE_ATTN_BLOCK_Q/K (CPU-backend runs want much bigger blocks:
    # the per-block mask/liveness overhead dominates at jnp-impl speeds)
    impl: str = "auto",
    rope_positions=None,  # (rope_q (B,Sq) f32, rope_k (B,Sk) f32, theta)
) -> jnp.ndarray:
    """Segment-aware flash attention.

    Args:
      q: (B, Sq, Hq, D); k/v: (B, Sk, Hkv, D) with Hq % Hkv == 0 (GQA).
      q_segment_ids / kv_segment_ids: (B, S) int32, 0 = padding. None means
        one segment covering the whole sequence.
      q_positions / kv_positions: (B, S) int32 global indices for causality;
        default arange. Ring shards / KV-cache decode pass real offsets.
      causal: causal masking (decoder) or bidirectional (ViT).
      impl: 'auto' (pallas on TPU, jnp elsewhere) | 'pallas' | 'jnp'.
      rope_positions: when given, q/k arrive UNROTATED and the V2PE rotary
        (fp32) is applied inside the kernel from these float32 id vectors —
        avoiding the q/k HBM round trips of a jnp-level apply_rotary.

    Returns: (B, Sq, Hq, D) in q.dtype.
    """
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    assert k.shape == v.shape and Hq % Hkv == 0
    if scale is None:
        scale = D ** -0.5
    if block_q is None:
        block_q = int(os.environ.get("V2PE_ATTN_BLOCK_Q", 512))
    if block_k is None:
        block_k = int(os.environ.get("V2PE_ATTN_BLOCK_K", 1024))
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    interpret = impl == "pallas" and jax.default_backend() != "tpu"
    ordered = q_positions is None and kv_positions is None

    if q_segment_ids is None:
        q_segment_ids = jnp.ones((B, Sq), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((B, Sk), jnp.int32)
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(Sq, dtype=jnp.int32), (B, Sq))
    if kv_positions is None:
        kv_positions = jnp.broadcast_to(jnp.arange(Sk, dtype=jnp.int32), (B, Sk))

    rope_q = rope_k = None
    rope_theta = 0.0
    if rope_positions is not None:
        # rope_k may be None: q-only fusion (k arrives pre-rotated — the
        # kernel would recompute k's cos/sin per (q-block, k-block) visit,
        # which measured SLOWER than the jnp rotary; q is rotated once per
        # block into scratch, which is effectively free)
        rope_q, rope_k, rope_theta = rope_positions
        rope_q = rope_q.astype(jnp.float32)
        if rope_k is not None:
            rope_k = rope_k.astype(jnp.float32)

    # decode fast path: a <=16-token query block starves the MXU kernel
    # (1-row blocks); a dense einsum is bandwidth-bound and optimal there
    if Sq <= 16 and Sk > Sq:
        from v2pe_tpu.ops.attention_ref import attention_reference

        if rope_theta:
            q, k = _apply_rope_jnp(q, k, rope_q, rope_k, rope_theta)
        return attention_reference(
            q, k, v, q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids, causal=causal, scale=scale,
            q_positions=q_positions, kv_positions=kv_positions)

    statics = AttnStatics(causal=causal, scale=float(scale),
                          block_q=block_q, block_k=block_k, impl=impl,
                          ordered=ordered, interpret=interpret,
                          rope_theta=float(rope_theta))
    args = (q, k, v,
            q_segment_ids.astype(jnp.int32),
            kv_segment_ids.astype(jnp.int32),
            q_positions.astype(jnp.int32),
            kv_positions.astype(jnp.int32),
            rope_q, rope_k)

    from v2pe_tpu.parallel import context as parallel_context

    ctx = parallel_context.current()
    if ctx is not None:
        from v2pe_tpu.parallel.shard_attn import sharded_flash_attention

        return sharded_flash_attention(ctx, statics, *args)
    return _flash(statics, *args)


def flash_attention_with_lse(
    q, k, v, *,
    q_segment_ids=None, kv_segment_ids=None, causal=True,
    scale=None, impl: str = "auto",
):
    """Forward-only flash attention returning (out, lse (B, Hq, Sq) fp32) —
    the chunked-prefill merge needs the logsumexp to combine the chunk's
    self-attention with its page-pool attention
    (ops/paged_attention.py:paged_prefill_attention). Inference path: no
    custom_vjp, no sharding-context routing."""
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    if scale is None:
        scale = D ** -0.5
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    interpret = impl == "pallas" and jax.default_backend() != "tpu"
    if q_segment_ids is None:
        q_segment_ids = jnp.ones((B, Sq), jnp.int32)
    if kv_segment_ids is None:
        kv_segment_ids = jnp.ones((B, Sk), jnp.int32)
    pos_q = jnp.broadcast_to(jnp.arange(Sq, dtype=jnp.int32), (B, Sq))
    pos_k = jnp.broadcast_to(jnp.arange(Sk, dtype=jnp.int32), (B, Sk))
    statics = AttnStatics(causal=causal, scale=float(scale),
                          block_q=int(os.environ.get("V2PE_ATTN_BLOCK_Q",
                                                     512)),
                          block_k=int(os.environ.get("V2PE_ATTN_BLOCK_K",
                                                     1024)),
                          impl=impl, ordered=True, interpret=interpret)
    return _fwd_dispatch(statics, q, k, v,
                         q_segment_ids.astype(jnp.int32),
                         kv_segment_ids.astype(jnp.int32), pos_q, pos_k)
