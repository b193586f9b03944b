"""Pallas TPU paged-attention decode kernels.

Decode attention that reads the KV history directly from the paged pool
(``v2pe_tpu.infer.paged_kv.PagedKVCache``) via a scalar-prefetched page
table — nothing ever materializes a row's full (max_len, Hkv, hd) context
the way a jax-level gather would. Per batch row the kernel walks the row's
pages sequentially, processing ALL kv heads of a page in one grid step (one
large strided DMA per page instead of one small DMA per (head, page)),
accumulating the online-softmax state.

The decode hot path is store-then-attend, split across two kernels:

* :func:`store_fresh_token` — a tiny grid-(B,) kernel whose pool operands
  are ``input_output_aliases``-aliased to its outputs: it rewrites ONE page
  per row (masked select at slot ``lengths``) strictly in place. The pool
  must be passed to pallas exactly once here — passing it both as a read
  operand and an aliased operand makes XLA insert a full-pool copy per
  layer (measured: 2 tok/s instead of >100 at 32k).
* :func:`paged_decode_attention` with ``fresh_in_pages=True`` — pure-read
  attention over the pages, the fresh token included causally (fresh token
  t sits at slot lengths+t and sees slots <= lengths+t).

Each cache byte is then read exactly once per step and each token slot
written once, i.e. decode runs at the HBM roofline.

The reference has no analogue (its decode is a per-layer tuple-concat cache,
modeling_internlm2.py:599-604); this is the "beat the reference" axis for
long-context serving (BASELINE.md north star).

Layer indexing stays INSIDE the kernels' index maps (scalar-prefetched
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


# ---------------------------------------------------------------------------
# store kernel: write the fresh token's k/v into its page, in place
# ---------------------------------------------------------------------------


def _store_kernel(pt_ref, len_ref, layer_ref,
                  kn_ref, vn_ref, kfp_ref, vfp_ref,   # inputs
                  ko_ref, vo_ref,                      # outputs (aliased)
                  *, page_size: int, Hkv: int):
    b = pl.program_id(0)
    off = len_ref[b] % page_size
    # Mosaic can't vector-store at a dynamic sublane offset in this 5D
    # layout — rewrite the whole page with a select at `off`
    sl = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page_size, 1), 1)
    kn = kn_ref[0, :, :1].astype(ko_ref.dtype)          # (Hkv, 1, hd)
    vn = vn_ref[0, :, :1].astype(vo_ref.dtype)
    ko_ref[0, :, 0] = jnp.where(sl == off, kn, kfp_ref[0, :, 0])
    vo_ref[0, :, 0] = jnp.where(sl == off, vn, vfp_ref[0, :, 0])


def store_fresh_token(
    k_new: jnp.ndarray,   # (B, 1, Hkv, hd)
    v_new: jnp.ndarray,
    k_pages: jnp.ndarray,  # (L, Hkv, NP, ps, hd)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, MP)
    lengths: jnp.ndarray,     # (B,) EXCLUDING the fresh token
    layer: jnp.ndarray,       # () int32
    *,
    interpret: bool = False,
):
    """Returns (k_pages, v_pages) with the fresh token written at slot
    ``lengths`` of ``layer`` — in place via input_output_aliases."""
    B = k_new.shape[0]
    L, Hkv, NP, ps, hd = k_pages.shape
    MP = page_table.shape[1]

    knr = jnp.swapaxes(k_new, 1, 2)  # (B, Hkv, 1, hd)
    vnr = jnp.swapaxes(v_new, 1, 2)
    Tp = 8  # sublane-pad the token dim
    knr = jnp.pad(knr, ((0, 0), (0, 0), (0, Tp - 1), (0, 0)))
    vnr = jnp.pad(vnr, ((0, 0), (0, 0), (0, Tp - 1), (0, 0)))

    def vec_index(b, *_):
        return (b, 0, 0, 0)

    def fresh_page_index(b, pt, lens, lyr):
        slot = jnp.minimum(lens[b] // ps, MP - 1)
        return (lyr[0], 0, jnp.maximum(pt[b, slot], 0), 0, 0)

    fresh_spec = pl.BlockSpec((1, Hkv, 1, ps, hd), fresh_page_index)
    kernel = functools.partial(_store_kernel, page_size=ps, Hkv=Hkv)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, Tp, hd), vec_index),
                pl.BlockSpec((1, Hkv, Tp, hd), vec_index),
                fresh_spec, fresh_spec,
            ],
            out_specs=[fresh_spec, fresh_spec],
        ),
        out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)],
        # operand numbering includes the 3 scalar-prefetch args
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(page_table, lengths, layer.reshape(1), knr, vnr, k_pages, v_pages)


# ---------------------------------------------------------------------------
# attention kernel
# ---------------------------------------------------------------------------


def _attn_kernel(pt_ref, len_ref, layer_ref,        # scalar prefetch (SMEM)
                 *refs,                              # VMEM blocks + scratch
                 page_size: int, T: int, G: int, R: int, Tp: int,
                 Hkv: int, num_pages: int, scale: float,
                 fresh_in_pages: bool):
    if fresh_in_pages:
        q_ref, kp_ref, vp_ref, out_ref, acc_ref, m_ref, l_ref = refs
        kn_ref = vn_ref = None
    else:
        (q_ref, kn_ref, vn_ref, kp_ref, vp_ref, out_ref,
         acc_ref, m_ref, l_ref) = refs
    b = pl.program_id(0)
    j = pl.program_id(1)
    length = len_ref[b]          # cache tokens (EXCLUDING the T fresh ones)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    def _online(s, mask, v):
        """Fold (Hkv, R, cols) scores + (Hkv, cols, hd) values into the
        scratch online-softmax state."""
        s = jnp.where(mask, s, NEG_INF)
        m_prev, l_prev = m_ref[..., :1], l_ref[..., :1]     # (Hkv, R, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * corr + jnp.sum(e, axis=-1, keepdims=True), l_ref.shape)
        pv = jax.lax.dot_general(
            e, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (Hkv, R, hd)
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    # ---- cache page j. fresh_in_pages: the T fresh tokens sit at slots
    # length..length+T-1; fresh token t sees slots <= length+t. Otherwise
    # all slots < length are visible to every fresh token.
    page_end = length + (T if fresh_in_pages else 0)

    @pl.when(j * page_size < page_end)
    def _page():
        q = q_ref[0].astype(jnp.float32) * scale            # (Hkv, R, hd)
        k = kp_ref[0, :, 0].astype(jnp.float32)             # (Hkv, ps, hd)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (Hkv, R, ps)
        slot = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (Hkv, R, page_size), 2)
        if fresh_in_pages:
            t_row = jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, R, page_size), 1) // G
            mask = slot <= length + t_row
        else:
            mask = slot < length
        _online(s, mask, vp_ref[0, :, 0].astype(jnp.float32))

    # ---- final step: fold separate fresh tokens (when not paged yet),
    # then normalize and write out
    @pl.when(j == num_pages - 1)
    def _finalize():
        if not fresh_in_pages:
            q = q_ref[0].astype(jnp.float32) * scale        # (Hkv, R, hd)
            kn = kn_ref[0].astype(jnp.float32)              # (Hkv, Tp, hd)
            s = jax.lax.dot_general(
                q, kn, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)         # (Hkv, R, Tp)
            # q row r is fresh token t = r // G; sees fresh u iff u <= t
            t_row = jax.lax.broadcasted_iota(jnp.int32, (Hkv, R, Tp), 1) // G
            u_col = jax.lax.broadcasted_iota(jnp.int32, (Hkv, R, Tp), 2)
            _online(s, (u_col <= t_row) & (u_col < T),
                    vn_ref[0].astype(jnp.float32))
        l = l_ref[..., :1]
        l_safe = jnp.where(l > 0, l, 1.0)
        out_ref[0] = (acc_ref[...] / l_safe).astype(out_ref.dtype)


def paged_decode_attention(
    q: jnp.ndarray,        # (B, T, Hq, hd) — T fresh tokens, rope applied
    k_new,                 # (B, T, Hkv, hd) fresh k/v, or None when
    v_new,                 #   fresh_in_pages (already stored)
    k_pages: jnp.ndarray,  # (L, Hkv, NP, ps, hd) pool
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,  # (B, MP) int32, -1 = unallocated
    lengths: jnp.ndarray,     # (B,) int32 cache tokens (excl. fresh)
    layer: jnp.ndarray,       # () int32 — which pool layer to read
    *,
    scale: float | None = None,
    interpret: bool = False,
    fresh_in_pages: bool = False,
) -> jnp.ndarray:
    """Returns (B, T, Hq, hd): attention of the fresh queries over their
    row's paged history plus the fresh tokens themselves (causal). With
    ``fresh_in_pages`` the fresh k/v were already stored at slots
    lengths..lengths+T-1 (see :func:`store_fresh_token`); ``lengths``
    always EXCLUDES the fresh tokens."""
    B, T, Hq, hd = q.shape
    Hkv = k_pages.shape[1]
    G = Hq // Hkv
    MP = page_table.shape[1]
    ps = k_pages.shape[3]
    if scale is None:
        scale = hd ** -0.5

    # rows per kv head = fresh tokens x group, padded to a sublane multiple
    R = _round_up(T * G, 8)
    Tp = _round_up(T, 128) if T > 1 else 128  # lane-dim for fresh scores
    qr = jnp.swapaxes(q.reshape(B, T, Hkv, G, hd), 1, 2)  # (B,Hkv,T,G,hd)
    qr = qr.reshape(B, Hkv, T * G, hd)
    if R != T * G:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, R - T * G), (0, 0)))

    grid = (B, MP)

    def vec_index(b, j, *_):
        return (b, 0, 0, 0)

    def page_index(b, j, pt, lens, lyr):
        return (lyr[0], 0, jnp.maximum(pt[b, j], 0), 0, 0)

    kernel = functools.partial(
        _attn_kernel, page_size=ps, T=T, G=G, R=R, Tp=Tp, Hkv=Hkv,
        num_pages=MP, scale=float(scale), fresh_in_pages=fresh_in_pages)

    page_spec = pl.BlockSpec((1, Hkv, 1, ps, hd), page_index)
    operands = [page_table, lengths, layer.reshape(1), qr]
    in_specs = [pl.BlockSpec((1, Hkv, R, hd), vec_index)]
    if not fresh_in_pages:
        knr = jnp.swapaxes(k_new, 1, 2)  # (B, Hkv, T, hd)
        vnr = jnp.swapaxes(v_new, 1, 2)
        if Tp != T:
            knr = jnp.pad(knr, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
            vnr = jnp.pad(vnr, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        operands += [knr, vnr]
        in_specs += [pl.BlockSpec((1, Hkv, Tp, hd), vec_index)] * 2
    operands += [k_pages, v_pages]
    in_specs += [page_spec, page_spec]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, Hkv, R, hd), vec_index),
            scratch_shapes=[
                pltpu.VMEM((Hkv, R, hd), jnp.float32),
                pltpu.VMEM((Hkv, R, LANES), jnp.float32),
                pltpu.VMEM((Hkv, R, LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, R, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)

    out = out[:, :, :T * G].reshape(B, Hkv, T, G, hd)
    return jnp.swapaxes(out, 1, 2).reshape(B, T, Hq, hd)


# ---------------------------------------------------------------------------
# shard_map wrappers (tensor-parallel decode)
# ---------------------------------------------------------------------------


def _tp_specs(tensor_axis):
    from jax.sharding import PartitionSpec as P

    hspec = P(None, None, tensor_axis, None)          # (B, T, H*, hd)
    pspec = P(None, tensor_axis, None, None, None)    # (L, Hkv, NP, ps, hd)
    return hspec, pspec, P(None, None), P(None), P()


def sharded_store_fresh_token(mesh, tensor_axis, k_new, v_new, k_pages,
                              v_pages, page_table, lengths, layer, *,
                              interpret=False):
    import functools as ft

    nt = mesh.shape[tensor_axis]
    Hkv = k_pages.shape[1]
    if nt == 1 or Hkv % nt != 0:
        return store_fresh_token(k_new, v_new, k_pages, v_pages, page_table,
                                 lengths, layer, interpret=interpret)
    hspec, pspec, tspec, lspec, sspec = _tp_specs(tensor_axis)
    fn = ft.partial(store_fresh_token, interpret=interpret)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(hspec, hspec, pspec, pspec, tspec, lspec, sspec),
        out_specs=(pspec, pspec),
        check_vma=False,
    )(k_new, v_new, k_pages, v_pages, page_table, lengths, layer)


def sharded_paged_decode_attention(
    mesh, tensor_axis: str,
    q, k_new, v_new, k_pages, v_pages, page_table, lengths, layer, *,
    scale: float | None = None, interpret: bool = False,
    fresh_in_pages: bool = False,
):
    """TP decode: pallas_call doesn't auto-partition under GSPMD, so the
    kernels run inside shard_map with the pool and heads sharded over the
    ``tensor`` mesh axis (kv-head dim — GQA groups stay intact per shard);
    page table and lengths are replicated. Embarrassingly parallel: no
    collectives — each shard holds its heads' full pages."""
    import functools as ft

    nt = mesh.shape[tensor_axis]
    Hkv = k_pages.shape[1]
    if nt == 1 or Hkv % nt != 0:
        return paged_decode_attention(q, k_new, v_new, k_pages, v_pages,
                                      page_table, lengths, layer,
                                      scale=scale, interpret=interpret,
                                      fresh_in_pages=fresh_in_pages)

    hspec, pspec, tspec, lspec, sspec = _tp_specs(tensor_axis)
    if fresh_in_pages:
        fn = ft.partial(paged_decode_attention, scale=scale,
                        interpret=interpret, fresh_in_pages=True)

        def call(q, kp, vp, pt, ln, lyr):
            return fn(q, None, None, kp, vp, pt, ln, lyr)

        return jax.shard_map(
            call, mesh=mesh,
            in_specs=(hspec, pspec, pspec, tspec, lspec, sspec),
            out_specs=hspec,
            check_vma=False,
        )(q, k_pages, v_pages, page_table, lengths, layer)

    fn = ft.partial(paged_decode_attention, scale=scale, interpret=interpret)
    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(hspec, hspec, hspec, pspec, pspec, tspec, lspec, sspec),
        out_specs=hspec,
        check_vma=False,
    )(q, k_new, v_new, k_pages, v_pages, page_table, lengths, layer)
