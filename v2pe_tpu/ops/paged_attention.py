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


def _store_kernel(fp_ref, len_ref, layer_ref,
                  *refs, page_size: int, Hkv: int, quantized: bool):
    if quantized:
        (kn_ref, vn_ref, ksn_ref, vsn_ref, kfp_ref, vfp_ref, ksfp_ref,
         vsfp_ref, ko_ref, vo_ref, kso_ref, vso_ref) = refs
    else:
        kn_ref, vn_ref, kfp_ref, vfp_ref, ko_ref, vo_ref = refs
    b = pl.program_id(0)
    off = len_ref[b] % page_size
    owned = fp_ref[b] >= 0  # seq sharding: another shard holds this page
    # Mosaic can't vector-store at a dynamic sublane offset in this 5D
    # layout — rewrite the whole page with a select at `off`
    sl = jax.lax.broadcasted_iota(jnp.int32, (Hkv, page_size, 1), 1)
    kn = kn_ref[0, :, :1].astype(ko_ref.dtype)          # (Hkv, 1, hd)
    vn = vn_ref[0, :, :1].astype(vo_ref.dtype)
    ko_ref[0, :, 0] = jnp.where((sl == off) & owned, kn, kfp_ref[0, :, 0])
    vo_ref[0, :, 0] = jnp.where((sl == off) & owned, vn, vfp_ref[0, :, 0])
    if quantized:
        # scale pages are (Hkv, 1, ps): the token slot is the LANE dim
        ksn = ksn_ref[0, :, :1]                          # (Hkv, 1, 1)
        vsn = vsn_ref[0, :, :1]
        ln = jax.lax.broadcasted_iota(jnp.int32, (Hkv, 1, page_size), 2)
        kso_ref[0, :, 0] = jnp.where((ln == off) & owned, ksn,
                                     ksfp_ref[0, :, 0])
        vso_ref[0, :, 0] = jnp.where((ln == off) & owned, vsn,
                                     vsfp_ref[0, :, 0])


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
    fresh_pages: jnp.ndarray | None = None,  # (B,) page id, -1 = not ours
    k_scales: jnp.ndarray | None = None,  # (L, Hkv, NP, ps, 1) int8 pools
    v_scales: jnp.ndarray | None = None,
):
    """Returns (k_pages, v_pages) — plus (k_scales, v_scales) when the pool
    is int8-quantized — with the fresh token written at slot ``lengths`` of
    ``layer``, in place via input_output_aliases. int8 mode quantizes the
    (bf16) fresh k/v here at the jnp level (a (B, Hkv, hd) tensor — trivial)
    and the kernel writes value page and scale page together.

    ``fresh_pages`` overrides the page lookup (sequence sharding passes the
    shard-LOCAL page id, -1 when another shard owns the token's page — the
    kernel then rewrites page 0 with itself, a no-op)."""
    B = k_new.shape[0]
    L, Hkv, NP, ps, hd = k_pages.shape
    MP = page_table.shape[1]
    quantized = k_scales is not None
    if fresh_pages is None:
        slot = jnp.minimum(lengths // ps, MP - 1)
        fresh_pages = jnp.take_along_axis(page_table, slot[:, None],
                                          axis=1)[:, 0]

    knr = jnp.swapaxes(k_new, 1, 2)  # (B, Hkv, 1, hd)
    vnr = jnp.swapaxes(v_new, 1, 2)
    Tp = 8  # sublane-pad the token dim
    pad_t = ((0, 0), (0, 0), (0, Tp - 1), (0, 0))
    scale_ops, scale_specs = [], []
    if quantized:
        from v2pe_tpu.infer.paged_kv import quantize_kv

        bits = 4 if k_pages.dtype == jnp.int4 else 8
        knr, ksn = quantize_kv(knr, bits)   # scales (B, Hkv, 1, 1)
        vnr, vsn = quantize_kv(vnr, bits)
        scale_ops = [jnp.pad(ksn, pad_t), jnp.pad(vsn, pad_t)]
    knr = jnp.pad(knr, pad_t)
    vnr = jnp.pad(vnr, pad_t)

    def vec_index(b, *_):
        return (b, 0, 0, 0)

    def fresh_page_index(b, fp, lens, lyr):
        return (lyr[0], 0, jnp.maximum(fp[b], 0), 0, 0)

    fresh_spec = pl.BlockSpec((1, Hkv, 1, ps, hd), fresh_page_index)
    sfresh_spec = pl.BlockSpec((1, Hkv, 1, 1, ps), fresh_page_index)
    if quantized:
        scale_specs = [pl.BlockSpec((1, Hkv, Tp, 1), vec_index)] * 2
    kernel = functools.partial(_store_kernel, page_size=ps, Hkv=Hkv,
                               quantized=quantized)
    pool_ops = [k_pages, v_pages] + ([k_scales, v_scales] if quantized
                                     else [])
    pool_specs = [fresh_spec, fresh_spec] + ([sfresh_spec, sfresh_spec]
                                             if quantized else [])
    out_shapes = [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pool_ops]
    # operand numbering includes the 3 scalar-prefetch args; the pool
    # operands start after [knr, vnr(, ksn, vsn)]
    first_pool = 3 + 2 + (2 if quantized else 0)
    aliases = {first_pool + i: i for i in range(len(pool_ops))}
    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, Tp, hd), vec_index),
                pl.BlockSpec((1, Hkv, Tp, hd), vec_index),
            ] + scale_specs + pool_specs,
            out_specs=pool_specs,
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the k/v page blocks are ~8 MB per grid step at ps=1024; with
            # B>1 the grid pipeline double-buffers them and the default
            # 16 MB scoped vmem overflows (measured 16.18 MB at B=8 bf16,
            # 21.5 MB quantized) — and the failed compile poisons the
            # remote-compile backend for the rest of the process
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fresh_pages.astype(jnp.int32), lengths, layer.reshape(1),
      knr, vnr, *scale_ops, *pool_ops)
    return tuple(res)


# ---------------------------------------------------------------------------
# attention kernel
# ---------------------------------------------------------------------------


def _attn_kernel(pt_ref, sb_ref, len_ref, fold_ref, layer_ref,  # SMEM
                 *refs,                              # VMEM blocks + scratch
                 page_size: int, T: int, G: int, R: int, Tp: int,
                 Hkv: int, num_pages: int, scale: float,
                 fresh_in_pages: bool, return_lse: bool,
                 quantized: bool = False):
    if fresh_in_pages:
        q_ref, kp_ref, vp_ref = refs[:3]
        kn_ref = vn_ref = None
        rest = refs[3:]
    else:
        q_ref, kn_ref, vn_ref, kp_ref, vp_ref = refs[:5]
        rest = refs[5:]
    if quantized:
        ksp_ref, vsp_ref = rest[:2]
        rest = rest[2:]
    else:
        ksp_ref = vsp_ref = None
    if return_lse:
        out_ref, lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        (out_ref, acc_ref, m_ref, l_ref) = rest
        lse_ref = None
    b = pl.program_id(0)
    j = pl.program_id(1)
    length = len_ref[b]          # cache tokens (EXCLUDING the T fresh ones)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    def _online(s, mask, v, v_scale=None):
        """Fold (Hkv, R, cols) scores + (Hkv, cols, hd) values into the
        scratch online-softmax state. ``v_scale`` (Hkv, 1, cols): int8-v
        dequant folded into e (softmax weights are per-kv-column, so the
        scale commutes into the pv matmul)."""
        s = jnp.where(mask, s, NEG_INF)
        m_prev, l_prev = m_ref[..., :1], l_ref[..., :1]     # (Hkv, R, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        e = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * corr + jnp.sum(e, axis=-1, keepdims=True), l_ref.shape)
        if v_scale is not None:
            e = e * v_scale
        pv = jax.lax.dot_general(
            e, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (Hkv, R, hd)
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    # ---- cache page at table slot j. Its first token's GLOBAL slot index
    # comes from the prefetched slot-base array (sb < 0 marks a dead entry:
    # unallocated, or owned by another shard under sequence sharding).
    # fresh_in_pages: the T fresh tokens sit at slots length..length+T-1;
    # fresh token t sees slots <= length+t. Otherwise all slots < length
    # are visible to every fresh token.
    page_end = length + (T if fresh_in_pages else 0)
    sb = sb_ref[b, j]

    @pl.when((sb >= 0) & (sb < page_end))
    def _page():
        q = q_ref[0].astype(jnp.float32) * scale            # (Hkv, R, hd)
        k = kp_ref[0, :, 0].astype(jnp.float32)             # (Hkv, ps, hd)
        v = vp_ref[0, :, 0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # (Hkv, R, ps)
        v_scale = None
        if quantized:
            # int8 dequant folded into the score matrix: scale pages are
            # (Hkv, 1, ps) — per-token scales already on the lane dim of s,
            # so both multiplies are O(R*ps) broadcasts (the page itself is
            # never dequantized; its DMA — the decode bottleneck — was
            # half-width int8). k's scale applies before the softmax, v's
            # rides into e inside _online.
            s = s * ksp_ref[0, :, 0]
            v_scale = vsp_ref[0, :, 0]
        slot = sb + jax.lax.broadcasted_iota(
            jnp.int32, (Hkv, R, page_size), 2)
        if fresh_in_pages:
            t_row = jax.lax.broadcasted_iota(
                jnp.int32, (Hkv, R, page_size), 1) // G
            mask = slot <= length + t_row
        else:
            mask = slot < length
        _online(s, mask, v, v_scale)

    # ---- final step: fold separate fresh tokens (when not paged yet and
    # this shard is the designated folder), then normalize and write out
    if not fresh_in_pages:
        @pl.when((j == num_pages - 1) & (fold_ref[0] == 1))
        def _fold_fresh():
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

    @pl.when(j == num_pages - 1)
    def _finalize():
        l = l_ref[..., :1]
        l_safe = jnp.where(l > 0, l, 1.0)
        out_ref[0] = (acc_ref[...] / l_safe).astype(out_ref.dtype)
        if return_lse:
            m = m_ref[..., :1]
            lse = jnp.where(l > 0, m + jnp.log(l_safe), NEG_INF)
            lse_ref[0] = lse


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
    slot_base: jnp.ndarray | None = None,  # (B, MP') global slot starts
    fold_fresh: jnp.ndarray | None = None,  # () int32 gate (default 1)
    return_lse: bool = False,
    k_scales: jnp.ndarray | None = None,  # (L, Hkv, NP, ps, 1): int8 pools
    v_scales: jnp.ndarray | None = None,
):
    """Returns (B, T, Hq, hd): attention of the fresh queries over their
    row's paged history plus the fresh tokens themselves (causal). With
    ``fresh_in_pages`` the fresh k/v were already stored at slots
    lengths..lengths+T-1 (see :func:`store_fresh_token`); ``lengths``
    always EXCLUDES the fresh tokens.

    Sequence sharding hooks: ``page_table`` may be a shard-LOCAL view (the
    entries index this shard's pool) with ``slot_base`` carrying each
    entry's global token offset (-1 = dead entry — skipped without
    corrupting the softmax); ``fold_fresh=0`` suppresses the separate-fresh
    fold so only one shard counts the fresh tokens; ``return_lse`` adds a
    (B, Hq, T) float32 logsumexp output for the cross-shard merge."""
    B, T, Hq, hd = q.shape
    Hkv = k_pages.shape[1]
    G = Hq // Hkv
    MP = page_table.shape[1]
    ps = k_pages.shape[3]
    if scale is None:
        scale = hd ** -0.5
    if slot_base is None:
        # dead entries (page -1) get slot_base -1; live ones their offset
        slot_base = jnp.where(
            page_table >= 0,
            jnp.arange(MP, dtype=jnp.int32)[None] * ps, -1)
    if fold_fresh is None:
        fold_fresh = jnp.ones((), jnp.int32)

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

    def page_index(b, j, pt, sb, lens, fold, lyr):
        return (lyr[0], 0, jnp.maximum(pt[b, j], 0), 0, 0)

    quantized = k_scales is not None
    kernel = functools.partial(
        _attn_kernel, page_size=ps, T=T, G=G, R=R, Tp=Tp, Hkv=Hkv,
        num_pages=MP, scale=float(scale), fresh_in_pages=fresh_in_pages,
        return_lse=return_lse, quantized=quantized)

    page_spec = pl.BlockSpec((1, Hkv, 1, ps, hd), page_index)
    operands = [page_table, slot_base.astype(jnp.int32), lengths,
                fold_fresh.reshape(1), layer.reshape(1), qr]
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
    if quantized:
        spage_spec = pl.BlockSpec((1, Hkv, 1, 1, ps), page_index)
        operands += [k_scales, v_scales]
        in_specs += [spage_spec, spage_spec]

    out_specs = [pl.BlockSpec((1, Hkv, R, hd), vec_index)]
    out_shapes = [jax.ShapeDtypeStruct((B, Hkv, R, hd), q.dtype)]
    if return_lse:
        out_specs += [pl.BlockSpec((1, Hkv, R, 1), vec_index)]
        out_shapes += [jax.ShapeDtypeStruct((B, Hkv, R, 1), jnp.float32)]

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((Hkv, R, hd), jnp.float32),
                pltpu.VMEM((Hkv, R, LANES), jnp.float32),
                pltpu.VMEM((Hkv, R, LANES), jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=(64 * 1024 * 1024) if quantized else None,
        ),
        interpret=interpret,
    )(*operands)

    out = res[0]
    out = out[:, :, :T * G].reshape(B, Hkv, T, G, hd)
    out = jnp.swapaxes(out, 1, 2).reshape(B, T, Hq, hd)
    if return_lse:
        lse = res[1][:, :, :T * G, 0].reshape(B, Hkv, T, G)
        lse = jnp.moveaxis(lse, 3, 2).reshape(B, Hq, T)
        return out, lse
    return out


# ---------------------------------------------------------------------------
# chunked-prefill attention: a fresh q CHUNK against the page pool
# ---------------------------------------------------------------------------


def _prefill_kernel(pt_ref, sb_ref, len_ref, layer_ref,          # SMEM
                    *refs, page_size: int, num_pages: int, G: int,
                    scale: float, quantized: bool):
    if quantized:
        q_ref, kp_ref, vp_ref, ksp_ref, vsp_ref = refs[:5]
        rest = refs[5:]
    else:
        q_ref, kp_ref, vp_ref = refs[:3]
        ksp_ref = vsp_ref = None
        rest = refs[3:]
    out_ref, lse_ref, acc_ref, m_ref, l_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(3)
    length = len_ref[b]                    # cache tokens (chunk excluded)
    sb = sb_ref[b, j]                      # entry's global slot start

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # every fresh token sees every cache slot (< length): the chunk sits
    # strictly after the cache, so there is no within-block causality here
    @pl.when((sb >= 0) & (sb < length))
    def _page():
        q = q_ref[0, 0].astype(jnp.float32) * scale       # (bq, hd)
        k = kp_ref[0, 0, 0].astype(jnp.float32)           # (ps, hd)
        v = vp_ref[0, 0, 0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quantized:
            s = s * ksp_ref[0, 0, 0]                      # (1, ps)
        bq = q.shape[0]
        slot = sb + jax.lax.broadcasted_iota(
            jnp.int32, (bq, page_size), 1)
        sm = jnp.where(slot < length, s, NEG_INF)
        m_prev, l_prev = m_ref[:, :1], l_ref[:, :1]
        m_new = jnp.maximum(jnp.maximum(
            m_prev, jnp.max(sm, axis=-1, keepdims=True)), NEG_INF / 2)
        corr = jnp.exp(m_prev - m_new)
        e = jnp.exp(sm - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * corr + jnp.sum(e, axis=-1, keepdims=True), l_ref.shape)
        if quantized:
            e = e * vsp_ref[0, 0, 0]
        pv = jax.lax.dot_general(e, v, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == num_pages - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l > 0, l, 1.0)
        out_ref[0, 0] = (acc_ref[...] / l_safe).astype(out_ref.dtype)
        m = m_ref[:, :1]
        lse_ref[0, 0] = jnp.where(l > 0, m + jnp.log(l_safe), NEG_INF)


def merge_lse(out1, lse1, out2, lse2):
    """Logsumexp-merge two attention partials over disjoint key sets
    (the ring-attention contract): out* (B, S, H, hd), lse* (B, H, S)
    fp32; all-masked partials carry lse = NEG_INF and contribute zero."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.where(lse1 <= NEG_INF / 2, 0.0, jnp.exp(lse1 - m))
    w2 = jnp.where(lse2 <= NEG_INF / 2, 0.0, jnp.exp(lse2 - m))
    den = jnp.maximum(w1 + w2, 1e-30)
    w1 = jnp.moveaxis(w1 / den, 1, 2)[..., None]       # (B, S, H, 1)
    w2 = jnp.moveaxis(w2 / den, 1, 2)[..., None]
    out = out1.astype(jnp.float32) * w1 + out2.astype(jnp.float32) * w2
    return out.astype(out1.dtype)


def paged_prefill_attention(
    q: jnp.ndarray,         # (B, S, Hq, hd) fresh CHUNK, rope applied
    k_pages: jnp.ndarray,   # (L, Hkv, NP, ps, hd)
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,   # (B, MP)
    lengths: jnp.ndarray,      # (B,) cache tokens (chunk NOT included)
    layer: jnp.ndarray,        # () int32
    *,
    scale: float | None = None,
    block_q: int = 512,
    interpret: bool = False,
    k_scales=None, v_scales=None,
    slot_base=None,  # (B, MP') global slot starts; -1 = dead entry
    # (sequence sharding passes a compacted LOCAL page view — see
    # seq_sharded_chunked_prefill_attention)
):
    """Chunked-prefill attention of a fresh multi-token chunk over the
    paged cache ONLY (slots < lengths): flash-style kernel whose kv blocks
    are pool pages resolved through the scalar-prefetched page table —
    the prompt never materializes the cache. Returns (out, lse) fp32-lse
    for the caller's logsumexp merge with the chunk's self-attention
    (infer/chunked_prefill.py). The serving pattern the reference lacks:
    multi-turn chat at long context re-prefills the whole history
    (modeling_internvl_chat.py chat() rebuilds the prompt); here the new
    turn attends to the existing pool directly."""
    B, S, Hq, hd = q.shape
    L, Hkv, NP, ps, _ = k_pages.shape
    G = Hq // Hkv
    MP = page_table.shape[1]
    if scale is None:
        scale = hd ** -0.5
    quantized = k_scales is not None
    if slot_base is None:
        slot_base = jnp.where(
            page_table >= 0,
            jnp.arange(MP, dtype=jnp.int32)[None] * ps, -1)

    from v2pe_tpu.ops.flash_pallas import pick_block

    bq = pick_block(S, block_q) if S >= 128 else S
    nq = _round_up(S, bq) // bq if S >= 128 else 1
    Sp = nq * bq
    qt = jnp.swapaxes(q, 1, 2)                       # (B, Hq, S, hd)
    if Sp != S:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))

    def q_index(b, h, i, j, *_):
        return (b, h, i, 0)

    def page_index(b, h, i, j, pt, sb, lens, lyr):
        return (lyr[0], jax.lax.div(h, G), jnp.maximum(pt[b, j], 0), 0, 0)

    spage_index = page_index

    operands = [page_table.astype(jnp.int32), slot_base.astype(jnp.int32),
                lengths, layer.reshape(1), qt]
    in_specs = [pl.BlockSpec((1, 1, bq, hd), q_index)]
    operands += [k_pages, v_pages]
    in_specs += [pl.BlockSpec((1, 1, 1, ps, hd), page_index)] * 2
    if quantized:
        operands += [k_scales, v_scales]
        in_specs += [pl.BlockSpec((1, 1, 1, 1, ps), spage_index)] * 2

    kernel = functools.partial(
        _prefill_kernel, page_size=ps, num_pages=MP, G=G,
        scale=float(scale), quantized=quantized)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B, Hq, nq, MP),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bq, hd), q_index),
                pl.BlockSpec((1, 1, bq, 1), q_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((bq, hd), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
                pltpu.VMEM((bq, LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sp, hd), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sp, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=(64 * 1024 * 1024) if quantized else None,
        ),
        interpret=interpret,
    )(*operands)
    out = jnp.swapaxes(out[:, :, :S], 1, 2)          # (B, S, Hq, hd)
    lse = lse[:, :, :S, 0]                           # (B, Hq, S)
    return out, lse


def sharded_chunked_prefill_attention(
        mesh, tensor_axis: str, q, k, v, segment_ids, k_pages, v_pages,
        page_table, lengths, layer, *, impl: str = "auto",
        interpret: bool = False, k_scales=None, v_scales=None):
    """Tensor-parallel chunked-prefill attention: q heads and the pool's
    kv heads shard over ``tensor`` (GQA groups intact per shard); each
    shard computes its heads' self-attention AND page sweep locally and
    merges — embarrassingly parallel, no collectives. Returns the merged
    (B, S, Hq, hd) with Hq sharded."""
    from jax.sharding import PartitionSpec as P

    from v2pe_tpu.ops.attention import flash_attention_with_lse

    B, S, Hq, hd = q.shape
    Hkv = k_pages.shape[1]
    nt = mesh.shape[tensor_axis] if tensor_axis else 1
    quantized = k_scales is not None

    def body(q, k, v, seg, kp, vp, pt, lens, lyr, *sc):
        out1, lse1 = flash_attention_with_lse(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
            impl=impl)
        out2, lse2 = paged_prefill_attention(
            q, kp, vp, pt, lens, lyr, interpret=interpret,
            k_scales=sc[0] if sc else None,
            v_scales=sc[1] if sc else None)
        return merge_lse(out1, lse1, out2, lse2)

    if nt == 1 or Hkv % nt != 0 or Hq % nt != 0:
        return body(q, k, v, segment_ids, k_pages, v_pages, page_table,
                    lengths, layer,
                    *((k_scales, v_scales) if quantized else ()))

    hspec = P(None, None, tensor_axis, None)
    pspec = P(None, tensor_axis, None, None, None)
    sc_args = (k_scales, v_scales) if quantized else ()
    sc_specs = (pspec, pspec) if quantized else ()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(hspec, hspec, hspec, P(None, None), pspec, pspec,
                  P(None, None), P(None), P()) + sc_specs,
        out_specs=hspec,
        check_vma=False,
    )(q, k, v, segment_ids, k_pages, v_pages, page_table, lengths, layer,
      *sc_args)


def seq_sharded_chunked_prefill_attention(
        mesh, seq_axis: str, tensor_axis, q, k, v, segment_ids, k_pages,
        v_pages, page_table, lengths, layer, *, impl: str = "auto",
        interpret: bool = False, k_scales=None, v_scales=None):
    """Chunked-prefill attention over a page pool sharded on the ``seq``
    mesh axis (composable with kv-head ``tensor`` sharding): every shard
    computes the chunk's causal self-attention locally (q replicated over
    ``seq`` — only shard 0's copy is counted in the merge) plus the page
    sweep over ITS pages (compacted local table with global slot bases),
    then the partials combine with the ring logsumexp contract via two
    psums over ICI. This is the multi-turn serving path on the 1M-context
    layout — a new chat turn prefills against a pool whose history is
    physically spread over the slice."""
    from jax.sharding import PartitionSpec as P

    from v2pe_tpu.ops.attention import flash_attention_with_lse

    n_seq = mesh.shape[seq_axis]
    if n_seq == 1:
        return sharded_chunked_prefill_attention(
            mesh, tensor_axis, q, k, v, segment_ids, k_pages, v_pages,
            page_table, lengths, layer, impl=impl, interpret=interpret,
            k_scales=k_scales, v_scales=v_scales)
    nt = mesh.shape[tensor_axis] if tensor_axis else 1
    Hkv = k_pages.shape[1]
    Hq = q.shape[2]
    head_ax = tensor_axis if (nt > 1 and Hkv % nt == 0
                              and Hq % nt == 0) else None
    NP = k_pages.shape[2]
    ps = k_pages.shape[3]
    quantized = k_scales is not None

    def body(q, k, v, seg, kp, vp, pt, lens, lyr, *sc):
        d = jax.lax.axis_index(seq_axis)
        pt_l, slot_idx, _ = _local_page_view(pt, seq_axis, n_seq, NP)
        sb = jnp.where(slot_idx >= 0, slot_idx * ps, -1)
        out2, lse2 = paged_prefill_attention(
            q, kp, vp, pt_l, lens, lyr, interpret=interpret, slot_base=sb,
            k_scales=sc[0] if sc else None,
            v_scales=sc[1] if sc else None)
        out1, lse1 = flash_attention_with_lse(
            q, k, v, q_segment_ids=seg, kv_segment_ids=seg, causal=True,
            impl=impl)
        # count the (replicated) self part exactly once
        lse1 = jnp.where(d == 0, lse1, NEG_INF)
        # local pairwise merge -> (out_loc, lse_loc), then the cross-shard
        # ring-contract combine
        m = jnp.maximum(jnp.maximum(lse1, lse2), NEG_INF / 2)
        w1 = jnp.where(lse1 <= NEG_INF / 2, 0.0, jnp.exp(lse1 - m))
        w2 = jnp.where(lse2 <= NEG_INF / 2, 0.0, jnp.exp(lse2 - m))
        wsum = w1 + w2
        num_loc = (out1.astype(jnp.float32)
                   * jnp.moveaxis(w1, 1, 2)[..., None]
                   + out2.astype(jnp.float32)
                   * jnp.moveaxis(w2, 1, 2)[..., None])
        lse_loc = jnp.where(wsum > 0, m + jnp.log(jnp.maximum(wsum, 1e-30)),
                            NEG_INF)
        out_loc = num_loc / jnp.moveaxis(jnp.maximum(wsum, 1e-30),
                                         1, 2)[..., None]
        mg = jax.lax.pmax(lse_loc, seq_axis)
        w = jnp.where(lse_loc <= NEG_INF / 2, 0.0, jnp.exp(lse_loc - mg))
        num = jax.lax.psum(out_loc * jnp.moveaxis(w, 1, 2)[..., None],
                           seq_axis)
        den = jnp.moveaxis(jnp.maximum(jax.lax.psum(w, seq_axis), 1e-30),
                           1, 2)[..., None]
        return (num / den).astype(q.dtype)

    hspec = P(None, None, head_ax, None)
    pspec = P(None, head_ax, seq_axis, None, None)
    sc_args = (k_scales, v_scales) if quantized else ()
    sc_specs = (pspec, pspec) if quantized else ()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(hspec, hspec, hspec, P(None, None), pspec, pspec,
                  P(None, None), P(None), P()) + sc_specs,
        out_specs=hspec,
        check_vma=False,
    )(q, k, v, segment_ids, k_pages, v_pages, page_table, lengths, layer,
      *sc_args)


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
                              interpret=False, k_scales=None, v_scales=None):
    import functools as ft

    nt = mesh.shape[tensor_axis]
    Hkv = k_pages.shape[1]
    quantized = k_scales is not None
    if nt == 1 or Hkv % nt != 0:
        return store_fresh_token(k_new, v_new, k_pages, v_pages, page_table,
                                 lengths, layer, interpret=interpret,
                                 k_scales=k_scales, v_scales=v_scales)
    hspec, pspec, tspec, lspec, sspec = _tp_specs(tensor_axis)
    if quantized:
        def fn(k_new, v_new, kp, vp, pt, lens, lyr, ks, vs):
            return store_fresh_token(k_new, v_new, kp, vp, pt, lens, lyr,
                                     interpret=interpret, k_scales=ks,
                                     v_scales=vs)

        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(hspec, hspec, pspec, pspec, tspec, lspec, sspec,
                      pspec, pspec),
            out_specs=(pspec, pspec, pspec, pspec),
            check_vma=False,
        )(k_new, v_new, k_pages, v_pages, page_table, lengths, layer,
          k_scales, v_scales)
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
    fresh_in_pages: bool = False, k_scales=None, v_scales=None,
):
    """TP decode: pallas_call doesn't auto-partition under GSPMD, so the
    kernels run inside shard_map with the pool and heads sharded over the
    ``tensor`` mesh axis (kv-head dim — GQA groups stay intact per shard);
    page table and lengths are replicated. Embarrassingly parallel: no
    collectives — each shard holds its heads' full pages."""
    nt = mesh.shape[tensor_axis]
    Hkv = k_pages.shape[1]
    quantized = k_scales is not None
    if nt == 1 or Hkv % nt != 0:
        return paged_decode_attention(q, k_new, v_new, k_pages, v_pages,
                                      page_table, lengths, layer,
                                      scale=scale, interpret=interpret,
                                      fresh_in_pages=fresh_in_pages,
                                      k_scales=k_scales, v_scales=v_scales)

    hspec, pspec, tspec, lspec, sspec = _tp_specs(tensor_axis)
    sc_args = (k_scales, v_scales) if quantized else ()
    sc_specs = (pspec, pspec) if quantized else ()
    if fresh_in_pages:
        def call(q, kp, vp, pt, ln, lyr, *sc):
            return paged_decode_attention(
                q, None, None, kp, vp, pt, ln, lyr, scale=scale,
                interpret=interpret, fresh_in_pages=True,
                k_scales=sc[0] if sc else None,
                v_scales=sc[1] if sc else None)

        return jax.shard_map(
            call, mesh=mesh,
            in_specs=(hspec, pspec, pspec, tspec, lspec, sspec) + sc_specs,
            out_specs=hspec,
            check_vma=False,
        )(q, k_pages, v_pages, page_table, lengths, layer, *sc_args)

    def call(q, k_new, v_new, kp, vp, pt, ln, lyr, *sc):
        return paged_decode_attention(
            q, k_new, v_new, kp, vp, pt, ln, lyr, scale=scale,
            interpret=interpret,
            k_scales=sc[0] if sc else None,
            v_scales=sc[1] if sc else None)

    return jax.shard_map(
        call, mesh=mesh,
        in_specs=(hspec, hspec, hspec, pspec, pspec, tspec, lspec,
                  sspec) + sc_specs,
        out_specs=hspec,
        check_vma=False,
    )(q, k_new, v_new, k_pages, v_pages, page_table, lengths, layer,
      *sc_args)


# ---------------------------------------------------------------------------
# sequence-sharded decode (page pool over the 'seq' axis, composable w/ TP)
# ---------------------------------------------------------------------------


def _local_page_view(page_table, seq_axis: str, n_seq: int, NP: int):
    """Per-shard view of a GLOBAL page table: this shard's pages resolved to
    local indices and compacted to the front (allocate_rows' round-robin
    placement bounds any row's per-shard page count by ceil(MP/n)+1, so the
    compacted table is sliced to that), with each entry's global token-slot
    start alongside (-1 = dead)."""
    B, MP = page_table.shape
    NPl = NP // n_seq
    d = jax.lax.axis_index(seq_axis)
    owned = (page_table >= d * NPl) & (page_table < (d + 1) * NPl)
    order = jnp.argsort(~owned, axis=1, stable=True)       # owned first
    MPl = min(MP, -(-MP // n_seq) + 1)
    order = order[:, :MPl]
    own_s = jnp.take_along_axis(owned, order, axis=1)
    pt_l = jnp.take_along_axis(page_table, order, axis=1) - d * NPl
    pt_l = jnp.where(own_s, pt_l, -1)
    slot_idx = jnp.where(own_s, order, -1)   # table slot of each local page
    return pt_l.astype(jnp.int32), slot_idx.astype(jnp.int32), d


def seq_sharded_store_fresh_token(
        mesh, seq_axis: str, tensor_axis, k_new, v_new, k_pages, v_pages,
        page_table, lengths, layer, *, interpret: bool = False,
        k_scales=None, v_scales=None):
    """Store the fresh token into whichever shard owns its page. The pool
    is sharded (NP over ``seq``; optionally Hkv over ``tensor``); only the
    owning shard's store kernel writes (others no-op on their page 0)."""
    from jax.sharding import PartitionSpec as P

    n_seq = mesh.shape[seq_axis]
    nt = mesh.shape[tensor_axis] if tensor_axis else 1
    Hkv = k_pages.shape[1]
    head_ax = tensor_axis if (nt > 1 and Hkv % nt == 0) else None
    NP = k_pages.shape[2]
    ps = k_pages.shape[3]
    NPl = NP // n_seq
    quantized = k_scales is not None

    def body(k_new, v_new, kp, vp, pt, lens, lyr, *sc):
        d = jax.lax.axis_index(seq_axis)
        slot = jnp.minimum(lens // ps, pt.shape[1] - 1)
        phys = jnp.take_along_axis(pt, slot[:, None], axis=1)[:, 0]
        owned = (phys >= d * NPl) & (phys < (d + 1) * NPl)
        fp = jnp.where(owned, phys - d * NPl, -1)
        return store_fresh_token(k_new, v_new, kp, vp, pt, lens, lyr,
                                 interpret=interpret, fresh_pages=fp,
                                 k_scales=sc[0] if sc else None,
                                 v_scales=sc[1] if sc else None)

    hspec = P(None, None, head_ax, None)
    pspec = P(None, head_ax, seq_axis, None, None)
    sc_args = (k_scales, v_scales) if quantized else ()
    sc_specs = (pspec, pspec) if quantized else ()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(hspec, hspec, pspec, pspec, P(None, None), P(None),
                  P()) + sc_specs,
        out_specs=(pspec, pspec) + sc_specs,
        check_vma=False,
    )(k_new, v_new, k_pages, v_pages, page_table, lengths, layer, *sc_args)


def seq_sharded_paged_decode_attention(
        mesh, seq_axis: str, tensor_axis, q, k_new, v_new, k_pages, v_pages,
        page_table, lengths, layer, *, scale: float | None = None,
        interpret: bool = False, fresh_in_pages: bool = False,
        k_scales=None, v_scales=None):
    """Decode attention over a page pool sharded on the ``seq`` mesh axis
    (each shard owns NP/n physical pages — the 1M-context serving layout,
    SURVEY §7's KV-cache north star), composable with kv-head ``tensor``
    sharding. Each shard attends over its own pages only (compacted local
    table: ~MP/n grid steps per shard) and the partial (out, lse) states
    merge with the ring-attention logsumexp contract via two psums over
    ICI. The separate-fresh fold (fresh_in_pages=False) runs on shard 0
    alone so fresh tokens are counted exactly once."""
    from jax.sharding import PartitionSpec as P

    n_seq = mesh.shape[seq_axis]
    if n_seq == 1:
        return sharded_paged_decode_attention(
            mesh, tensor_axis, q, k_new, v_new, k_pages, v_pages,
            page_table, lengths, layer, scale=scale, interpret=interpret,
            fresh_in_pages=fresh_in_pages, k_scales=k_scales,
            v_scales=v_scales)
    nt = mesh.shape[tensor_axis] if tensor_axis else 1
    Hkv = k_pages.shape[1]
    Hq = q.shape[2]
    head_ax = tensor_axis if (nt > 1 and Hkv % nt == 0
                              and Hq % nt == 0) else None
    NP = k_pages.shape[2]
    ps = k_pages.shape[3]
    quantized = k_scales is not None

    def body(q, k_new, v_new, kp, vp, pt, lens, lyr, *sc):
        pt_l, slot_idx, d = _local_page_view(pt, seq_axis, n_seq, NP)
        sb = jnp.where(slot_idx >= 0, slot_idx * ps, -1)
        fold = (d == 0).astype(jnp.int32)
        out, lse = paged_decode_attention(
            q, k_new, v_new, kp, vp, pt_l, lens, lyr, scale=scale,
            interpret=interpret, fresh_in_pages=fresh_in_pages,
            slot_base=sb, fold_fresh=fold, return_lse=True,
            k_scales=sc[0] if sc else None,
            v_scales=sc[1] if sc else None)
        # logsumexp merge across shards (all-masked shards carry -inf)
        m = jax.lax.pmax(lse, seq_axis)                     # (B, Hq, T)
        w = jnp.exp(lse - m)
        w = jnp.where(lse <= NEG_INF / 2, 0.0, w)
        num = jax.lax.psum(out.astype(jnp.float32)
                           * jnp.moveaxis(w, 1, 2)[..., None], seq_axis)
        den = jax.lax.psum(w, seq_axis)
        den = jnp.moveaxis(jnp.maximum(den, 1e-30), 1, 2)[..., None]
        return (num / den).astype(q.dtype)

    hspec = P(None, None, head_ax, None)
    pspec = P(None, head_ax, seq_axis, None, None)
    sc_args = (k_scales, v_scales) if quantized else ()
    sc_specs = (pspec, pspec) if quantized else ()
    if fresh_in_pages:
        def call(q, kp, vp, pt, lens, lyr, *sc):
            return body(q, None, None, kp, vp, pt, lens, lyr, *sc)

        return jax.shard_map(
            call, mesh=mesh,
            in_specs=(hspec, pspec, pspec, P(None, None), P(None),
                      P()) + sc_specs,
            out_specs=hspec,
            check_vma=False,
        )(q, k_pages, v_pages, page_table, lengths, layer, *sc_args)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(hspec, hspec, hspec, pspec, pspec, P(None, None), P(None),
                  P()) + sc_specs,
        out_specs=hspec,
        check_vma=False,
    )(q, k_new, v_new, k_pages, v_pages, page_table, lengths, layer,
      *sc_args)
