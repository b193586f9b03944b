"""Pallas TPU paged-attention decode kernel.

Decode attention that reads the KV history directly from the paged pool
(``v2pe_tpu.infer.paged_kv.PagedKVCache``) via a scalar-prefetched page
table — nothing ever materializes a row's full (max_len, Hkv, hd) context
the way a jax-level gather would. Per (batch row, kv head) the kernel walks
the row's pages sequentially, accumulating the online-softmax state, and
folds the current step's fresh (not-yet-paged) k/v in at the final grid
step. Each cache byte is read exactly once, so the kernel runs at the HBM
roofline that bounds decode.

The reference has no analogue (its decode is a per-layer tuple-concat cache,
modeling_internlm2.py:599-604); this is the "beat the reference" axis for
long-context serving (BASELINE.md north star).

Layer indexing stays INSIDE the kernel's index maps (scalar-prefetched
``layer`` id): the caller passes the full (L, Hkv, n_pages, ps, hd) pool and
only the touched pages of the selected layer are DMA'd, so the per-layer
decode scan never slices (= copies) the pool at the jax level.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(pt_ref, len_ref, layer_ref,            # scalar prefetch (SMEM)
            q_ref, kn_ref, vn_ref, kp_ref, vp_ref,  # VMEM blocks
            out_ref,
            acc_ref, m_ref, l_ref,                  # VMEM scratch
            *, page_size: int, T: int, G: int, R: int, Tp: int,
            num_pages: int, scale: float):
    b = pl.program_id(0)
    j = pl.program_id(2)
    length = len_ref[b]          # cache tokens (EXCLUDING the T fresh ones)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # ---- cache pages: all slots < length are visible to every fresh token
    @pl.when(j * page_size < length)
    def _pages():
        q = q_ref[0, 0].astype(jnp.float32) * scale        # (R, hd)
        k = kp_ref[0, 0, 0].astype(jnp.float32)            # (ps, hd)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        slot = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (R, page_size), 1)
        mask = slot < length
        s = jnp.where(mask, s, NEG_INF)
        m_prev, l_prev = m_ref[:, :1], l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * corr + jnp.sum(e, axis=-1, keepdims=True), l_ref.shape)
        v = vp_ref[0, 0, 0].astype(jnp.float32)
        pv = jax.lax.dot_general(e, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    # ---- final step: fold the fresh tokens (causal among themselves), then
    # normalize and write out
    @pl.when(j == num_pages - 1)
    def _finalize():
        q = q_ref[0, 0].astype(jnp.float32) * scale        # (R, hd)
        kn = kn_ref[0, 0].astype(jnp.float32)              # (Tp, hd)
        s = jax.lax.dot_general(q, kn, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (R,Tp)
        # q row r is fresh token t = r // G; it sees fresh token u iff u <= t
        t_row = jax.lax.broadcasted_iota(jnp.int32, (R, Tp), 0) // G
        u_col = jax.lax.broadcasted_iota(jnp.int32, (R, Tp), 1)
        mask = (u_col <= t_row) & (u_col < T)
        s = jnp.where(mask, s, NEG_INF)
        m_prev, l_prev = m_ref[:, :1], l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l = l_prev * corr + jnp.sum(e, axis=-1, keepdims=True)
        vn = vn_ref[0, 0].astype(jnp.float32)
        pv = jax.lax.dot_general(e, vn, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc_ref[...] * corr + pv
        l_safe = jnp.where(l > 0, l, 1.0)
        out_ref[0, 0] = (acc / l_safe).astype(out_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,        # (B, T, Hq, hd) — T fresh tokens, rope applied
    k_new: jnp.ndarray,    # (B, T, Hkv, hd) — fresh k/v (NOT yet in pages)
    v_new: jnp.ndarray,
    k_pages: jnp.ndarray,  # (L, Hkv, NP, ps, hd) pool
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, MP) int32, -1 = unallocated
    lengths: jnp.ndarray,     # (B,) int32 cache tokens (excl. fresh)
    layer: jnp.ndarray,       # () int32 — which pool layer to read
    *,
    scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, T, Hq, hd): attention of the fresh queries over their
    row's paged history plus the fresh tokens themselves (causal)."""
    B, T, Hq, hd = q.shape
    Hkv = k_new.shape[2]
    G = Hq // Hkv
    MP = page_table.shape[1]
    ps = k_pages.shape[3]
    if scale is None:
        scale = hd ** -0.5

    # rows = fresh tokens x group heads, padded to a sublane multiple
    R = _round_up(T * G, 8)
    Tp = _round_up(T, 128) if T > 1 else 128  # lane-dim for fresh scores
    qr = jnp.swapaxes(q.reshape(B, T, Hkv, G, hd), 1, 2)  # (B,Hkv,T,G,hd)
    qr = qr.reshape(B, Hkv, T * G, hd)
    if R != T * G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, R - T * G), (0, 0)))
    knr = jnp.swapaxes(k_new, 1, 2)  # (B, Hkv, T, hd)
    vnr = jnp.swapaxes(v_new, 1, 2)
    if Tp != T:
        knr = jnp.pad(knr, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        vnr = jnp.pad(vnr, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))

    grid = (B, Hkv, MP)

    def page_index(b, h, j, pt, lens, lyr):
        return (lyr[0], h, jnp.maximum(pt[b, j], 0), 0, 0)

    kernel = functools.partial(
        _kernel, page_size=ps, T=T, G=G, R=R, Tp=Tp, num_pages=MP,
        scale=float(scale))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, R, hd), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Tp, hd),
                             lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Tp, hd),
                             lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, 1, ps, hd), page_index),
                pl.BlockSpec((1, 1, 1, ps, hd), page_index),
            ],
            out_specs=pl.BlockSpec((1, 1, R, hd),
                                   lambda b, h, j, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((R, hd), jnp.float32),
                pltpu.VMEM((R, LANES), jnp.float32),
                pltpu.VMEM((R, LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, lengths, layer.reshape(1), qr, knr, vnr, k_pages, v_pages)

    out = out[:, :, :T * G].reshape(B, Hkv, T, G, hd)
    return jnp.swapaxes(out, 1, 2).reshape(B, T, Hq, hd)
