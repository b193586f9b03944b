"""Ring attention over the ``seq`` mesh axis (context parallelism).

TPU-native replacement for the reference's CUDA+NCCL
``zigzag_ring_flash_attn_varlen_func`` (ring-flash-attn 0.1.3;
patch/internlm2_packed_training_patch.py:76-128): KV chunks rotate around the
ring via ``jax.lax.ppermute`` (XLA collective-permute over ICI) while each
device accumulates its queries' online-softmax state; partial results merge
through the logsumexp contract returned by the flash kernel.

Causality is positional: every token carries its **global** index, so any
host-side shard layout works. :func:`zigzag_shard` reproduces the reference's
zigzag load-balancing layout (rank r takes chunks [r, 2W-1-r] of 2W chunks —
modeling_internvl_chat.py:36-41 ``extract_local``), and
:func:`zigzag_unshard` its eval-side inverse
(eval/mm_niah/eval_mm_niah_long.py:337-352 ``undo_extract_local``).

Differentiable via custom_vjp: the backward runs a second ring pass, rotating
(k, v, dk, dv) together so each chunk accumulates gradient contributions from
every device and arrives home after a full cycle (the strategy of the
reference's ring-flash-attn backward, re-derived for the lse contract).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.ops.attention import AttnStatics, NEG_INF, _bwd_dispatch, \
    _fwd_dispatch


# --------------------------------------------------------------------------
# Zigzag shard layout helpers (host/jnp level)
# --------------------------------------------------------------------------


def zigzag_shard(x: jnp.ndarray, rank: int, world: int, axis: int = 1):
    """Take chunks [rank, 2*world-1-rank] of 2*world chunks along ``axis``."""
    chunks = jnp.split(x, 2 * world, axis=axis)
    return jnp.concatenate([chunks[rank], chunks[2 * world - 1 - rank]],
                           axis=axis)


def zigzag_unshard(x_gathered: jnp.ndarray, world: int, axis: int = 1):
    """Inverse of zigzag_shard applied to the all-gathered (world, ...) stack
    concatenated along ``axis`` (device-major)."""
    parts = jnp.split(x_gathered, 2 * world, axis=axis)
    first, second = parts[0::2], parts[1::2]
    ordered = list(first) + list(second[::-1])
    return jnp.concatenate(ordered, axis=axis)


def zigzag_global_positions(seq_len_global: int, rank: int, world: int):
    """Global token indices held by ``rank`` under the zigzag layout."""
    idx = np.arange(seq_len_global).reshape(2 * world, -1)
    return np.concatenate([idx[rank], idx[2 * world - 1 - rank]])


# --------------------------------------------------------------------------
# Ring attention (runs inside shard_map over axis_name)
# --------------------------------------------------------------------------


def _merge(out_a, lse_a, out_b, lse_b):
    """Combine two (out, lse) partial attention results."""
    lse_c = jnp.logaddexp(lse_a, lse_b)  # (B, H, S)
    wa = jnp.exp(lse_a - lse_c)[..., None]  # (B, H, S, 1)
    wb = jnp.exp(lse_b - lse_c)[..., None]
    # out is (B, S, H, D); weights indexed (B, H, S) -> transpose
    wa = jnp.swapaxes(wa, 1, 2)
    wb = jnp.swapaxes(wb, 1, 2)
    out_c = out_a.astype(jnp.float32) * wa + out_b.astype(jnp.float32) * wb
    return out_c, lse_c


def _rotate(xs, axis_name: str):
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.tree.map(lambda x: jax.lax.ppermute(x, axis_name, perm), xs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def ring_flash_attention(axis_name: str, statics: AttnStatics,
                         q, k, v, seg_q, seg_k, pos_q, pos_k):
    out, _ = _ring_fwd_impl(axis_name, statics, q, k, v, seg_q, seg_k,
                            pos_q, pos_k)
    return out


def _chunk_has_work(statics: AttnStatics, seg_q, seg_k, pos_q, pos_k):
    """Cheap O(S) predicate: does this (q-shard, kv-chunk) pair contain ANY
    unmasked pair? Causal chunk skip — the wall-clock win of the reference's
    zigzag layout (each rank's two half-chunks keep per-rotation work
    balanced while half the rotations are fully masked and skipped)."""
    q_valid, k_valid = seg_q != 0, seg_k != 0
    any_pair = jnp.any(q_valid) & jnp.any(k_valid)
    if not statics.causal:
        return any_pair
    q_max = jnp.max(jnp.where(q_valid, pos_q, -1))
    k_min = jnp.min(jnp.where(k_valid, pos_k, 2**30))
    return any_pair & (q_max >= k_min)


def _halves(x, axis):
    h = x.shape[axis] // 2
    lo = jax.lax.slice_in_dim(x, 0, h, axis=axis)
    hi = jax.lax.slice_in_dim(x, h, 2 * h, axis=axis)
    return lo, hi


def _branch_index(statics, seg_q, seg_k, pos_q, pos_k):
    """Pick the minimal rectangle of work for this rotation, exploiting the
    zigzag layout's half-chunk structure (each shard's first half holds
    strictly lower global positions than its second half — packing.py
    zigzag_permutation). Branches:

      0: nothing live (fully-masked rotation)           -> skip
      1: general case                                   -> q_full x k_full
      2: live pairs within {(lo,lo),(hi,lo)}            -> q_full x k_lo
      3: live pairs within {(hi,hi),(hi,lo)}            -> q_hi  x k_full
      4: only the (q_hi, k_lo) cross rectangle live     -> q_hi  x k_lo

    Correctness holds for ANY layout (zigzag or contiguous): a reduced
    rectangle is chosen only when every live quadrant — all four are
    probed, (q_lo, k_hi) included — is inside it; anything else falls back
    to the full rectangle (masking inside the kernel does the rest).
    Under zigzag this halves ring-attention FLOPs with work balanced across
    ranks — the TPU rendering of the reference's zigzag_ring_flash_attn
    load balancing (patch/internlm2_packed_training_patch.py:76-128)."""
    sq_lo, sq_hi = _halves(seg_q, 1)
    sk_lo, sk_hi = _halves(seg_k, 1)
    pq_lo, pq_hi = _halves(pos_q, 1)
    pk_lo, pk_hi = _halves(pos_k, 1)
    w_ll = _chunk_has_work(statics, sq_lo, sk_lo, pq_lo, pk_lo)
    w_hh = _chunk_has_work(statics, sq_hi, sk_hi, pq_hi, pk_hi)
    w_hl = _chunk_has_work(statics, sq_hi, sk_lo, pq_hi, pk_lo)
    w_lh = _chunk_has_work(statics, sq_lo, sk_hi, pq_lo, pk_hi)
    any_w = w_ll | w_hh | w_hl | w_lh
    fits2 = ~(w_lh | w_hh)          # q_full x k_lo covers {ll, hl}
    fits3 = ~(w_ll | w_lh)          # q_hi x k_full covers {hl, hh}
    fits4 = w_hl & ~(w_ll | w_lh | w_hh)
    return jnp.where(
        ~any_w, 0,
        jnp.where(fits4, 4, jnp.where(fits2, 2, jnp.where(fits3, 3, 1))))


def _ring_fwd_impl(axis_name, statics, q, k, v, seg_q, seg_k, pos_q, pos_k):
    n = jax.lax.psum(1, axis_name)
    B, Sq, Hq, D = q.shape
    Hs = Sq // 2
    # half-chunk skipping needs even halves big enough to feed full kernel
    # blocks; always safe to fall back to the full-rectangle path
    use_halves = Sq % 2 == 0 and Hs % 8 == 0 and Hs >= statics.block_q

    def step(carry, _):
        out, lse, kc, vc, segc, posc = carry
        # Issue the rotation BEFORE the compute: the next chunk's
        # collective-permute has no data dependency on this step's attention,
        # so XLA's latency-hiding scheduler can run it concurrently with the
        # kernel (async collective-permute over ICI). Same values, same
        # collective count — only the schedule changes.
        kc_n, vc_n, segc_n, posc_n = _rotate((kc, vc, segc, posc), axis_name)

        def skip(args):
            return args

        def run(q_, kc_, vc_, sq_, sk_, pq_, pk_, q_off):
            """Compute a sub-rectangle and merge it at q offset q_off."""
            def impl(args):
                out, lse = args
                o_i, lse_i = _fwd_dispatch(statics, q_, kc_, vc_, sq_, sk_,
                                           pq_, pk_)
                if q_.shape[1] != Sq:  # pad partial-q results to full
                    o_i = jnp.pad(o_i.astype(jnp.float32),
                                  ((0, 0), (q_off, Sq - q_off - q_.shape[1]),
                                   (0, 0), (0, 0)))
                    lse_i = jnp.pad(lse_i,
                                    ((0, 0), (0, 0),
                                     (q_off, Sq - q_off - q_.shape[1])),
                                    constant_values=NEG_INF)
                return _merge(out, lse, o_i, lse_i)
            return impl

        pred_args = (out, lse)
        if use_halves:
            kc_lo, _ = _halves(kc, 1)
            vc_lo, _ = _halves(vc, 1)
            sk_lo, _ = _halves(segc, 1)
            pk_lo, _ = _halves(posc, 1)
            _, q_hi = _halves(q, 1)
            _, sq_hi = _halves(seg_q, 1)
            _, pq_hi = _halves(pos_q, 1)
            out, lse = jax.lax.switch(
                _branch_index(statics, seg_q, segc, pos_q, posc),
                [skip,
                 run(q, kc, vc, seg_q, segc, pos_q, posc, 0),
                 run(q, kc_lo, vc_lo, seg_q, sk_lo, pos_q, pk_lo, 0),
                 run(q_hi, kc, vc, sq_hi, segc, pq_hi, posc, Hs),
                 run(q_hi, kc_lo, vc_lo, sq_hi, sk_lo, pq_hi, pk_lo, Hs)],
                pred_args)
        else:
            out, lse = jax.lax.cond(
                _chunk_has_work(statics, seg_q, segc, pos_q, posc),
                run(q, kc, vc, seg_q, segc, pos_q, posc, 0), skip, pred_args)
        return (out, lse, kc_n, vc_n, segc_n, posc_n), None

    init = (jnp.zeros((B, Sq, Hq, D), jnp.float32),
            jnp.full((B, Hq, Sq), NEG_INF, jnp.float32),
            k, v, seg_k, pos_k)
    (out, lse, *_), _ = jax.lax.scan(step, init, None, length=n)
    return out.astype(q.dtype), lse


def _ring_fwd(axis_name, statics, q, k, v, seg_q, seg_k, pos_q, pos_k):
    out, lse = _ring_fwd_impl(axis_name, statics, q, k, v, seg_q, seg_k,
                              pos_q, pos_k)
    return out, (q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse)


def _ring_bwd(axis_name, statics, res, do):
    q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse = res
    n = jax.lax.psum(1, axis_name)
    B, Sq = q.shape[:2]
    Hs = Sq // 2
    use_halves = Sq % 2 == 0 and Hs % 8 == 0 and Hs >= statics.block_q

    def step(carry, _):
        dq_acc, kc, vc, segc, posc, dkc, dvc = carry
        # Pre-issue the k/v/seg/pos rotation (no dependency on this step's
        # kernels -> overlaps with compute). dk/dv are produced by the
        # compute, so their rotation stays on the critical path below.
        kc_n, vc_n, segc_n, posc_n = _rotate((kc, vc, segc, posc), axis_name)

        def skip(args):
            return args

        def run(q_slc, k_slc, q_off, k_off):
            """Backward over a (q rows, kv cols) sub-rectangle; gradients
            land zero-padded at their offsets."""
            def impl(args):
                dq_acc, dkc, dvc = args
                nq = Sq if q_slc is None else Hs
                nk = kc.shape[1] if k_slc is None else Hs
                q_ = q if q_slc is None else \
                    jax.lax.slice_in_dim(q, q_off, q_off + nq, axis=1)
                sq_ = seg_q if q_slc is None else \
                    jax.lax.slice_in_dim(seg_q, q_off, q_off + nq, axis=1)
                pq_ = pos_q if q_slc is None else \
                    jax.lax.slice_in_dim(pos_q, q_off, q_off + nq, axis=1)
                out_ = out if q_slc is None else \
                    jax.lax.slice_in_dim(out, q_off, q_off + nq, axis=1)
                do_ = do if q_slc is None else \
                    jax.lax.slice_in_dim(do, q_off, q_off + nq, axis=1)
                lse_ = lse if q_slc is None else \
                    jax.lax.slice_in_dim(lse, q_off, q_off + nq, axis=2)
                kc_ = kc if k_slc is None else \
                    jax.lax.slice_in_dim(kc, k_off, k_off + nk, axis=1)
                vc_ = vc if k_slc is None else \
                    jax.lax.slice_in_dim(vc, k_off, k_off + nk, axis=1)
                sk_ = segc if k_slc is None else \
                    jax.lax.slice_in_dim(segc, k_off, k_off + nk, axis=1)
                pk_ = posc if k_slc is None else \
                    jax.lax.slice_in_dim(posc, k_off, k_off + nk, axis=1)
                dq_i, dk_i, dv_i = _bwd_dispatch(
                    statics, q_, kc_, vc_, sq_, sk_, pq_, pk_, out_, lse_,
                    do_)
                dq_i = dq_i.astype(jnp.float32)
                dk_i = dk_i.astype(jnp.float32)
                dv_i = dv_i.astype(jnp.float32)
                if q_slc is not None:
                    pad = ((0, 0), (q_off, Sq - q_off - nq), (0, 0), (0, 0))
                    dq_i = jnp.pad(dq_i, pad)
                if k_slc is not None:
                    Sk = kc.shape[1]
                    pad = ((0, 0), (k_off, Sk - k_off - nk), (0, 0), (0, 0))
                    dk_i = jnp.pad(dk_i, pad)
                    dv_i = jnp.pad(dv_i, pad)
                return dq_acc + dq_i, dkc + dk_i, dvc + dv_i
            return impl

        args = (dq_acc, dkc, dvc)
        if use_halves:
            dq_acc, dkc, dvc = jax.lax.switch(
                _branch_index(statics, seg_q, segc, pos_q, posc),
                [skip,
                 run(None, None, 0, 0),      # full x full
                 run(None, "lo", 0, 0),      # q_full x k_lo
                 run("hi", None, Hs, 0),     # q_hi x k_full
                 run("hi", "lo", Hs, 0)],    # q_hi x k_lo
                args)
        else:
            dq_acc, dkc, dvc = jax.lax.cond(
                _chunk_has_work(statics, seg_q, segc, pos_q, posc),
                run(None, None, 0, 0), skip, args)
        dkc, dvc = _rotate((dkc, dvc), axis_name)
        return (dq_acc, kc_n, vc_n, segc_n, posc_n, dkc, dvc), None

    init = (jnp.zeros(q.shape, jnp.float32), k, v, seg_k, pos_k,
            jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    (dq, _, _, _, _, dk, dv), _ = jax.lax.scan(step, init, None, length=n)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None, None, None)


ring_flash_attention.defvjp(_ring_fwd, _ring_bwd)


def ring_attention(
    q, k, v, *,
    axis_name: str,
    q_segment_ids, kv_segment_ids, q_positions, kv_positions,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 512,   # tuned on v5e: (512,1024) reaches ~100 TFLOPs at 8k
    block_k: int = 1024,
    impl: str = "auto",
):
    """Public per-device entry (call inside shard_map over ``axis_name``).

    All arguments are the device-local shards; positions must be GLOBAL token
    indices (zigzag or contiguous layouts both work).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    statics = AttnStatics(
        causal=causal, scale=float(scale), block_q=block_q, block_k=block_k,
        impl=impl, ordered=False,
        interpret=impl == "pallas" and jax.default_backend() != "tpu")
    return ring_flash_attention(axis_name, statics, q, k, v,
                                q_segment_ids.astype(jnp.int32),
                                kv_segment_ids.astype(jnp.int32),
                                q_positions.astype(jnp.int32),
                                kv_positions.astype(jnp.int32))
