"""Pallas TPU flash-attention backward kernels.

Analytic flash backward (FlashAttention-2 style): probabilities are
recomputed blockwise from the saved logsumexp; two passes —

* dkv: grid (B, Hkv, num_k_blocks, num_q_blocks * G) — the innermost axis
  walks every (q-head-in-group, q-block) pair so dk/dv accumulate across the
  GQA group in VMEM scratch without write races;
* dq:  grid (B, Hq, num_q_blocks, num_k_blocks) with a dq accumulator.

Same segment-id + position masking contract as the forward
(v2pe_tpu/ops/flash_pallas.py); causal block skip via index-map clamping
when positions are plain arange."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _padax(x, axis, target, value=0):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    w = [(0, 0)] * x.ndim
    w[axis] = (0, pad)
    return jnp.pad(x, w, constant_values=value)


def _mask2d(seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref, causal):
    seg_q = jnp.swapaxes(seg_q_ref[0], 0, 1)  # (bq, 1)
    seg_k = seg_k_ref[0]                      # (1, bk)
    mask = (seg_q == seg_k) & (seg_q != 0)
    if causal:
        pos_q = jnp.swapaxes(pos_q_ref[0], 0, 1)
        pos_k = pos_k_ref[0]
        mask &= pos_q >= pos_k
    return mask


def _block_full(seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref, causal,
                causal_full_static=None):
    """Scalar block classification (see flash_pallas._kernel): fully-live
    blocks recompute p without the 2-D mask build or its select. The
    backward's extra constraint: the mask also guards exp(s - lse)
    OVERFLOW at padded q rows (lse = NEG_INF there), but a full block has
    no padded rows by construction (padding is segment 0)."""
    seg_qv, seg_kv = seg_q_ref[0], seg_k_ref[0]
    sq_min, sq_max = jnp.min(seg_qv), jnp.max(seg_qv)
    sk_min, sk_max = jnp.min(seg_kv), jnp.max(seg_kv)
    full = (sq_min == sq_max) & (sk_min == sk_max) \
        & (sq_min == sk_min) & (sq_min != 0)
    if causal:
        if causal_full_static is not None:
            full &= causal_full_static
        else:
            full &= jnp.min(pos_q_ref[0]) >= jnp.max(pos_k_ref[0])
    return full


# ---------------------------------------------------------------------- dkv
def _dkv_kernel(seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref,
                q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                dk_ref, dv_ref,
                dk_acc, dv_acc,
                *, causal, ordered, scale, block_q, block_k, inner_steps,
                num_q_blocks):
    j = pl.program_id(3)  # inner: (group member, q block)

    @pl.when(j == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    i = pl.program_id(2)  # k block
    qi = jax.lax.rem(j, num_q_blocks)
    if causal and ordered:
        run = qi * block_q + (block_q - 1) >= i * block_k
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale     # (bq, D)
        k = k_ref[0, 0].astype(jnp.float32)             # (bk, D)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)           # (bq, D)
        lse = jnp.swapaxes(lse_ref[0], 0, 1)            # (bq, 1)
        di = jnp.swapaxes(di_ref[0], 0, 1)              # (bq, 1)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

        def _accumulate(p):
            dv_acc[...] += jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bk, D)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - di)                           # (bq, bk)
            dk_acc[...] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bk, D)

        full = _block_full(
            seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref, causal,
            causal_full_static=(qi * block_q >= i * block_k + (block_k - 1))
            if (causal and ordered) else None)

        @pl.when(full)
        def _full_block():
            _accumulate(jnp.exp(s - lse))

        @pl.when(jnp.logical_not(full))
        def _boundary_block():
            mask = _mask2d(seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref,
                           causal)
            _accumulate(jnp.where(mask, jnp.exp(s - lse), 0.0))

    @pl.when(j == inner_steps - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# ----------------------------------------------------------------------- dq
def _dq_kernel(seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref,
               q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
               dq_ref,
               dq_acc,
               *, causal, ordered, scale, block_q, block_k, num_k_blocks):
    i = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    if causal and ordered:
        run = j * block_k <= i * block_q + (block_q - 1)
    else:
        run = True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        do = do_ref[0, 0].astype(jnp.float32)
        lse = jnp.swapaxes(lse_ref[0], 0, 1)            # (bq, 1)
        di = jnp.swapaxes(di_ref[0], 0, 1)              # (bq, 1)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)

        def _accumulate(p):
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - di)
            dq_acc[...] += jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

        full = _block_full(
            seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref, causal,
            causal_full_static=(i * block_q >= j * block_k + (block_k - 1))
            if (causal and ordered) else None)

        @pl.when(full)
        def _full_block():
            _accumulate(jnp.exp(s - lse))

        @pl.when(jnp.logical_not(full))
        def _boundary_block():
            mask = _mask2d(seg_q_ref, seg_k_ref, pos_q_ref, pos_k_ref,
                           causal)
            _accumulate(jnp.where(mask, jnp.exp(s - lse), 0.0))

    @pl.when(j == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def flash_attention_bwd_pallas(
    q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse, do,
    *, causal, scale, block_q=512, block_k=1024, ordered=True,
    interpret=False, rope_q=None, rope_k=None, rope_theta: float = 0.0,
):
    """dq, dk, dv. Layout contract matches attention.py (BSHD in/out).

    rope_theta > 0: q/k are the PRE-rotation residuals (the fwd kernel
    fuses the rotary). The backward rotates them here at the jnp level,
    runs the kernels, and maps dq/dk back through the transpose rotation —
    the rotation is orthogonal, so this is exact."""
    if rope_theta:
        from v2pe_tpu.ops.attention import _apply_rope_jnp, _rope_transpose

        q, k = _apply_rope_jnp(q, k, rope_q, rope_k, rope_theta)
        dq, dk, dv = flash_attention_bwd_pallas(
            q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse, do,
            causal=causal, scale=scale, block_q=block_q, block_k=block_k,
            ordered=ordered, interpret=interpret)
        dq = _rope_transpose(dq, rope_q, rope_theta)
        if rope_k is not None:
            dk = _rope_transpose(dk, rope_k, rope_theta)
        return dq, dk, dv
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = Hq // Hkv

    from v2pe_tpu.ops.flash_pallas import pick_block

    bq = pick_block(Sq, block_q) if Sq >= 128 else min(block_q, Sq)
    bk = pick_block(Sk, block_k) if Sk >= 128 else min(block_k, Sk)
    nq, nk = _cdiv(Sq, bq), _cdiv(Sk, bk)
    Sq_p, Sk_p = nq * bq, nk * bk

    # fp32 di = rowsum(do * out) (cheap elementwise, fused by XLA)
    di = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    di = jnp.swapaxes(di, 1, 2)  # (B, Hq, Sq)

    qt = _padax(jnp.swapaxes(q, 1, 2), 2, Sq_p)
    dot_ = _padax(jnp.swapaxes(do, 1, 2), 2, Sq_p)
    kt = _padax(jnp.swapaxes(k, 1, 2), 2, Sk_p)
    vt = _padax(jnp.swapaxes(v, 1, 2), 2, Sk_p)
    # lse/di stay Sq-on-the-LANE-dim, heads folded into the leading dim
    # ((B*Hq, 1, Sq_p) — the vector-operand shape contract, see
    # flash_pallas.py); a trailing singleton would lane-pad 128x in HBM
    # (256 MB each at 32k — the round-5 32k train-step OOM)
    lse_p = _padax(lse, 2, Sq_p, value=NEG_INF).reshape(B * Hq, 1, Sq_p)
    di_p = _padax(di, 2, Sq_p).reshape(B * Hq, 1, Sq_p)
    seg_q3 = _padax(seg_q, 1, Sq_p)[:, None, :]
    seg_k3 = _padax(seg_k, 1, Sk_p)[:, None, :]
    pos_q3 = _padax(pos_q, 1, Sq_p, value=-1)[:, None, :]
    pos_k3 = _padax(pos_k, 1, Sk_p, value=2**30)[:, None, :]

    # ------------------------------------------------------------- dkv pass
    inner = nq * G

    def qhead(h, j):
        return h * G + jax.lax.div(j, nq)

    def qblk(j):
        return jax.lax.rem(j, nq)

    dkv_specs = dict(
        grid=(B, Hkv, nk, inner),
        in_specs=[
            pl.BlockSpec((1, 1, bq), lambda b, h, i, j: (b, 0, qblk(j))),
            pl.BlockSpec((1, 1, bk), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, h, i, j: (b, 0, qblk(j))),
            pl.BlockSpec((1, 1, bk), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq, D),
                         lambda b, h, i, j: (b, qhead(h, j), qblk(j), 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, D),
                         lambda b, h, i, j: (b, qhead(h, j), qblk(j), 0)),
            pl.BlockSpec((1, 1, bq),
                         lambda b, h, i, j: (b * Hq + qhead(h, j), 0,
                                             qblk(j))),
            pl.BlockSpec((1, 1, bq),
                         lambda b, h, i, j: (b * Hq + qhead(h, j), 0,
                                             qblk(j))),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), lambda b, h, i, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, Sk_p, D), k.dtype),
            jax.ShapeDtypeStruct((B, Hkv, Sk_p, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, D), jnp.float32),
            pltpu.VMEM((bk, D), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, causal=causal, ordered=ordered,
                          scale=scale, block_q=bq, block_k=bk,
                          inner_steps=inner, num_q_blocks=nq),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # branch-split body duplication (see flash_pallas) pushes the
            # single-block ViT shapes past the 16M scoped-vmem default
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
        **dkv_specs,
    )(seg_q3, seg_k3, pos_q3, pos_k3, qt, kt, vt, dot_, lse_p, di_p)

    # -------------------------------------------------------------- dq pass
    if causal and ordered:
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

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, causal=causal, ordered=ordered,
                          scale=scale, block_q=bq, block_k=bk,
                          num_k_blocks=nk),
        grid=(B, Hq, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, bq), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bk), kv_vec_index),
            pl.BlockSpec((1, 1, bq), lambda b, h, i, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bk), kv_vec_index),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bk, D), kv_index),
            pl.BlockSpec((1, 1, bk, D), kv_index),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq),
                         lambda b, h, i, j: (b * Hq + h, 0, i)),
            pl.BlockSpec((1, 1, bq),
                         lambda b, h, i, j: (b * Hq + h, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, D),
                               lambda b, h, i, j: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # branch-split body duplication (see flash_pallas) pushes the
            # single-block ViT shapes past the 16M scoped-vmem default
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(seg_q3, seg_k3, pos_q3, pos_k3, qt, kt, vt, dot_, lse_p, di_p)

    dq = jnp.swapaxes(dq[:, :, :Sq], 1, 2)
    dk = jnp.swapaxes(dk[:, :, :Sk], 1, 2)
    dv = jnp.swapaxes(dv[:, :, :Sk], 1, 2)
    return dq, dk, dv
