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

from v2pe_tpu.ops.attention import AttnStatics, NEG_INF, _bwd_jnp_1b, \
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


def _ring_fwd_impl(axis_name, statics, q, k, v, seg_q, seg_k, pos_q, pos_k):
    n = jax.lax.psum(1, axis_name)
    B, Sq, Hq, D = q.shape

    def step(carry, _):
        out, lse, kc, vc, segc, posc = carry
        o_i, lse_i = _fwd_dispatch(statics, q, kc, vc, seg_q, segc,
                                   pos_q, posc)
        out, lse = _merge(out, lse, o_i, lse_i)
        kc, vc, segc, posc = _rotate((kc, vc, segc, posc), axis_name)
        return (out, lse, kc, vc, segc, posc), None

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

    def step(carry, _):
        dq_acc, kc, vc, segc, posc, dkc, dvc = carry
        dq_i, dk_i, dv_i = jax.vmap(
            lambda *a: _bwd_jnp_1b(*a, statics)
        )(q, kc, vc, seg_q, segc, pos_q, posc, out, lse, do)
        dq_acc = dq_acc + dq_i.astype(jnp.float32)
        dkc = dkc + dk_i.astype(jnp.float32)
        dvc = dvc + dv_i.astype(jnp.float32)
        kc, vc, segc, posc, dkc, dvc = _rotate(
            (kc, vc, segc, posc, dkc, dvc), axis_name)
        return (dq_acc, kc, vc, segc, posc, dkc, dvc), None

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
