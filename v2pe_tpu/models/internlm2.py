"""InternLM2 decoder, functional JAX.

Behavior parity with ``internvl/model/internlm2/modeling_internlm2.py``:

* fused ``wqkv`` with the GQA **interleaved** layout: reshape ``(h gs d)``
  with ``gs = 2 + num_key_value_groups``; q = first gs-2 slots per kv head,
  k/v = last two (``:576-592``) — preserved exactly for checkpoint compat;
* V2PE rotary from a per-token float32 position vector (``:269-309``),
  applied in fp32 (``:416-441``);
* pre-RMSNorm decoder layers with SwiGLU MLP (``:1229-1465``, ``:444-458``);
* fp32 logits (``:1947-1949``).

TPU-first: layers are stacked and scanned; attention is the segment-aware
Pallas flash kernel; KV cache is a preallocated static-shape buffer updated
with dynamic_update_slice (the reference's tuple-concat cache, ``:599-604``,
is reshaped into decode-friendly form).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import LLMConfig
from v2pe_tpu.ops.attention import flash_attention
from v2pe_tpu.ops.norms import rms_norm
from v2pe_tpu.ops.quantized_matmul import (Int4Weight, QuantizedWeight,
                                           StackedQuantizedRef,
                                           quantized_dot,
                                           quantized_dot_stacked,
                                           split_stacked_quantized)
from v2pe_tpu.ops.rope import apply_rotary, compute_rope_cos_sin


class KVCache(NamedTuple):
    """Static-shape per-layer KV cache: (L, B, max_len, Hkv, hd)."""

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # () int32 — tokens filled so far

    @staticmethod
    def zeros(cfg: LLMConfig, batch: int, max_len: int, dtype=jnp.bfloat16):
        shape = (cfg.num_hidden_layers, batch, max_len,
                 cfg.num_key_value_heads, cfg.head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                       jnp.zeros((), jnp.int32))


@jax.custom_vjp
def embed_tokens(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding gather whose backward stages the cotangent reshard.

    The vjp of a plain ``table[ids]`` is a scatter-add into the grad of the
    tensor-sharded embedding table; GSPMD must reshard the batch-sharded
    (B,S,D) cotangent to the table's hidden-dim sharding and (for some
    mesh shapes, e.g. the compress-seq dryrun's data=2,fsdp=2,tensor=2)
    cannot find an efficient path — it falls back to "involuntary full
    rematerialization" (replicate-then-slice) with a spmd_partitioner.cc
    warning. Replicating the cotangent *explicitly* first is the identical
    data movement, minus the warning and minus the partitioner's pessimism:
    an all-gather over the batch axes, then a free local slice on D."""
    return table[ids]


def _embed_fwd(table, ids):
    # residual carries `table` for its STATIC shape/dtype only — the bwd
    # never reads its values, so XLA prunes the dependency
    return table[ids], (ids, table)


def _embed_bwd(res, ct):
    ids, table = res
    tshape, tdtype = table.shape, table.dtype
    from jax.sharding import NamedSharding, PartitionSpec as P

    from v2pe_tpu.parallel import context as pctx

    ctx = pctx.current()
    if ctx is not None:
        ct = jax.lax.with_sharding_constraint(
            ct, NamedSharding(ctx.mesh, P()))
    dtable = jnp.zeros(tshape, ct.dtype).at[ids].add(ct)
    return dtable.astype(tdtype), None


embed_tokens.defvjp(_embed_fwd, _embed_bwd)


def split_wqkv(qkv: jnp.ndarray, cfg: LLMConfig):
    """(B, S, (Hkv*(2+G))*hd) -> q (B,S,Hq,hd), k/v (B,S,Hkv,hd).

    Exact parity with the rearrange at modeling_internlm2.py:576-592.
    """
    B, S, _ = qkv.shape
    G = cfg.num_key_value_groups
    qkv = qkv.reshape(B, S, cfg.num_key_value_heads, 2 + G, cfg.head_dim)
    q = qkv[:, :, :, :G].reshape(B, S, cfg.num_attention_heads, cfg.head_dim)
    k = qkv[:, :, :, -2]
    v = qkv[:, :, :, -1]
    return q, k, v


def _dot(x, w, dtype=None):
    if isinstance(w, StackedQuantizedRef):  # layer-indexed stacked int8/int4
        return quantized_dot_stacked(x, w, dtype or x.dtype)
    if isinstance(w, (QuantizedWeight, Int4Weight)):  # weight-only serving
        return quantized_dot(x, w, dtype or x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32
                   ).astype(dtype or x.dtype)


def _layer_view(lp: dict, quant, li):
    """Merge per-layer stacked-quantized views into a scanned layer dict
    (see ``split_stacked_quantized``); no-op when the model is unquantized."""
    if quant is None:
        return lp
    lp = dict(lp)
    for n, w in quant.items():
        lp[n] = StackedQuantizedRef(w, li)
    return lp


def head_logits(x, output_kernel) -> jnp.ndarray:
    """fp32 vocab logits — dispatches the int8/int4-quantized head (the
    92k-vocab fp32 head is ~20% of the 2B model's decode HBM traffic)."""
    if isinstance(output_kernel, (QuantizedWeight, Int4Weight)):
        return quantized_dot(x, output_kernel, jnp.float32)
    return jnp.dot(x, output_kernel, preferred_element_type=jnp.float32)


def attention_forward(
    p: dict,
    cfg: LLMConfig,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    segment_ids: Optional[jnp.ndarray],
    positions: Optional[jnp.ndarray],
    attn_impl: str,
    kv_cache_layer: Optional[tuple] = None,
    cache_length: Optional[jnp.ndarray] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    cache_write_only_new: bool = False,
    paged: Optional[tuple] = None,
    rope_pack: Optional[tuple] = None,  # (scaled_pos (B,S) f32, theta)
):
    """One attention block. If kv_cache_layer=(k_buf, v_buf) is given,
    attention runs over cache + new tokens. With cache_write_only_new the
    function never copies the cache buffers: decode attention splits into a
    cache part and a fresh-token part (merged via one softmax) and only the
    new (k, v) are returned for the caller to write — the full-buffer
    update path rewrote ~1.6 GB per decoded token at 8k. kv_valid
    (B, max_len) masks cache slots (ragged right-padded prompts)."""
    B, S, D = x.shape
    # no-cache path: Q's rotary is FUSED into the flash kernel (rotated
    # once per block into VMEM scratch from the rope_pack float32 ids) —
    # skipping Q's jnp-level apply_rotary saves its HBM round trips. K
    # stays on the jnp path: the kernel revisits k blocks per q block, so
    # in-kernel k rotation recomputes cos/sin per visit (measured 36%
    # SLOWER than the jnp rotary at 8k). Cache/paged decode keeps the jnp
    # rotary for both (1-token, trivial).
    fused_rope = (rope_pack is not None and kv_cache_layer is None
                  and paged is None)
    if S >= MLP_CHUNK_THRESHOLD and S % MLP_CHUNK == 0 \
            and kv_cache_layer is None and paged is None:
        # long-context prefill: project + rotate in S-chunks scattered into
        # preallocated q/k/v — the fused (S, (G+2)*Hkv*hd) qkv temp alone
        # is ~2.1 GB at 256k for the 2B model; chunking the projections is
        # part of what fits a 256k single-chip prefill in HBM
        q, k, v = _qkv_chunked(p, cfg, x, cos, sin, fused_rope)
    else:
        qkv = _dot(x, p["wqkv_kernel"])
        if cfg.bias or cfg.qkv_bias:
            qkv = qkv + p["wqkv_bias"]
        q, k, v = split_wqkv(qkv, cfg)
        if not fused_rope:
            q = apply_rotary(q, cos, sin)
        k = apply_rotary(k, cos, sin)

    new_cache = None
    if paged is not None and S == 1:
        # paged decode: store-then-attend — a tiny aliased store kernel
        # writes the fresh k/v into the row's page strictly in place, then
        # the attention kernel reads the pages (fresh slot included); no
        # jax-level pool write ever happens
        from v2pe_tpu.ops.paged_attention import (
            paged_decode_attention, seq_sharded_paged_decode_attention,
            seq_sharded_store_fresh_token, sharded_paged_decode_attention,
            sharded_store_fresh_token, store_fresh_token)
        from v2pe_tpu.parallel import context as pctx

        cache, li, k_pages, v_pages = paged[:4]
        k_sc, v_sc = (paged[4], paged[5]) if len(paged) > 4 else (None, None)
        ctx = pctx.current()
        interp = jax.default_backend() != "tpu"
        if ctx is not None and ctx.seq_shards > 1:
            # page pool sharded over 'seq' (each device owns a page range —
            # the 1M-context layout) composed with kv-head TP
            stored = seq_sharded_store_fresh_token(
                ctx.mesh, ctx.seq_axis, ctx.tensor_axis, k, v, k_pages,
                v_pages, cache.page_table, cache.lengths, li,
                interpret=interp, k_scales=k_sc, v_scales=v_sc)
            k_pages, v_pages = stored[:2]
            if k_sc is not None:
                k_sc, v_sc = stored[2:]
            out = seq_sharded_paged_decode_attention(
                ctx.mesh, ctx.seq_axis, ctx.tensor_axis, q, None, None,
                k_pages, v_pages, cache.page_table, cache.lengths, li,
                interpret=interp, fresh_in_pages=True,
                k_scales=k_sc, v_scales=v_sc)
        elif ctx is not None:
            stored = sharded_store_fresh_token(
                ctx.mesh, ctx.tensor_axis, k, v, k_pages, v_pages,
                cache.page_table, cache.lengths, li, interpret=interp,
                k_scales=k_sc, v_scales=v_sc)
            k_pages, v_pages = stored[:2]
            if k_sc is not None:
                k_sc, v_sc = stored[2:]
            out = sharded_paged_decode_attention(
                ctx.mesh, ctx.tensor_axis, q, None, None, k_pages, v_pages,
                cache.page_table, cache.lengths, li, interpret=interp,
                fresh_in_pages=True, k_scales=k_sc, v_scales=v_sc)
        else:
            stored = store_fresh_token(
                k, v, k_pages, v_pages, cache.page_table, cache.lengths, li,
                interpret=interp, k_scales=k_sc, v_scales=v_sc)
            k_pages, v_pages = stored[:2]
            if k_sc is not None:
                k_sc, v_sc = stored[2:]
            out = paged_decode_attention(
                q, None, None, k_pages, v_pages, cache.page_table,
                cache.lengths, li, interpret=interp, fresh_in_pages=True,
                k_scales=k_sc, v_scales=v_sc)
        new_cache = (k_pages, v_pages, k_sc, v_sc)
    elif paged is not None and S <= 16:
        # small multi-token step: attention via the kernel's separate-fresh
        # fold; fresh (k, v) go back through ys for the caller's scatter
        from v2pe_tpu.ops.paged_attention import (
            paged_decode_attention, seq_sharded_paged_decode_attention,
            sharded_paged_decode_attention)
        from v2pe_tpu.parallel import context as pctx

        cache, li = paged[:2]
        new_cache = (k, v)
        ctx = pctx.current()
        interp = jax.default_backend() != "tpu"
        if ctx is not None and ctx.seq_shards > 1:
            out = seq_sharded_paged_decode_attention(
                ctx.mesh, ctx.seq_axis, ctx.tensor_axis, q, k, v,
                cache.k_pages, cache.v_pages, cache.page_table,
                cache.lengths, li, interpret=interp,
                k_scales=cache.k_scales, v_scales=cache.v_scales)
        elif ctx is not None:
            out = sharded_paged_decode_attention(
                ctx.mesh, ctx.tensor_axis, q, k, v, cache.k_pages,
                cache.v_pages, cache.page_table, cache.lengths, li,
                interpret=interp, k_scales=cache.k_scales,
                v_scales=cache.v_scales)
        else:
            out = paged_decode_attention(
                q, k, v, cache.k_pages, cache.v_pages, cache.page_table,
                cache.lengths, li, interpret=interp,
                k_scales=cache.k_scales, v_scales=cache.v_scales)
    elif paged is not None:
        # prefill into the paged cache. Empty cache: the prompt attends
        # only to itself — plain (segment-masked) flash over the fresh
        # k/v; the caller scatters the ys into pages once. Nonempty cache
        # (chunked prefill, paged[2] True): the chunk ALSO attends over
        # the existing pages via the page-sweep kernel, merged with its
        # self-attention by logsumexp — the multi-turn serving path that
        # avoids re-prefilling the history.
        cache, li = paged[:2]
        attend_cache = len(paged) > 2 and paged[2] is not None
        new_cache = (k, v)
        if attend_cache:
            from v2pe_tpu.ops.attention import flash_attention_with_lse
            from v2pe_tpu.ops.paged_attention import (
                merge_lse, paged_prefill_attention,
                seq_sharded_chunked_prefill_attention,
                sharded_chunked_prefill_attention)
            from v2pe_tpu.parallel import context as pctx

            ctx = pctx.current()
            # paged[2] holds THIS layer's pool slices taken from the scan's
            # CARRIED buffers (llm_forward slices per step): reading
            # cache.k_pages directly here would read the pre-scan buffers
            # while the carry scatters them in place — XLA then keeps two
            # full pools alive (+6.4 GB at 32k, an OOM)
            k5, v5, ks5, vs5 = paged[2]
            interp = jax.default_backend() != "tpu"
            impl = attn_impl if attn_impl != "auto" else (
                "jnp" if interp else "pallas")
            if ctx is not None and ctx.seq_shards > 1:
                seg = segment_ids if segment_ids is not None else \
                    jnp.ones(x.shape[:2], jnp.int32)
                out = seq_sharded_chunked_prefill_attention(
                    ctx.mesh, ctx.seq_axis, ctx.tensor_axis, q, k, v, seg,
                    k5, v5, cache.page_table, cache.lengths, jnp.int32(0),
                    impl=impl, interpret=interp, k_scales=ks5,
                    v_scales=vs5)
            elif ctx is not None:
                seg = segment_ids if segment_ids is not None else \
                    jnp.ones(x.shape[:2], jnp.int32)
                out = sharded_chunked_prefill_attention(
                    ctx.mesh, ctx.tensor_axis, q, k, v, seg, k5, v5,
                    cache.page_table, cache.lengths, jnp.int32(0),
                    impl=impl, interpret=interp, k_scales=ks5,
                    v_scales=vs5)
            else:
                out1, lse1 = flash_attention_with_lse(
                    q, k, v, q_segment_ids=segment_ids,
                    kv_segment_ids=segment_ids, causal=True, impl=impl)
                out2, lse2 = paged_prefill_attention(
                    q, k5, v5, cache.page_table, cache.lengths,
                    jnp.int32(0), interpret=interp, k_scales=ks5,
                    v_scales=vs5)
                out = merge_lse(out1, lse1, out2, lse2)
        else:
            out = flash_attention(
                q, k, v, q_segment_ids=segment_ids,
                kv_segment_ids=segment_ids, q_positions=positions,
                kv_positions=positions, causal=True, impl=attn_impl)
    elif kv_cache_layer is not None and S <= 16 and cache_write_only_new:
        k_buf, v_buf = kv_cache_layer
        out = _two_part_decode_attention(
            q, k, v, k_buf, v_buf, cache_length, kv_valid)
        new_cache = (k, v)
    elif kv_cache_layer is not None:
        k_buf, v_buf = kv_cache_layer
        k_buf = jax.lax.dynamic_update_slice_in_dim(
            k_buf, k.astype(k_buf.dtype), cache_length, axis=1)
        v_buf = jax.lax.dynamic_update_slice_in_dim(
            v_buf, v.astype(v_buf.dtype), cache_length, axis=1)
        new_cache = (k, v) if cache_write_only_new else (k_buf, v_buf)
        max_len = k_buf.shape[1]
        kv_pos = jnp.broadcast_to(jnp.arange(max_len, dtype=jnp.int32),
                                  (B, max_len))
        if kv_valid is not None:
            kv_seg = kv_valid.astype(jnp.int32)
        else:
            kv_seg = jnp.where(kv_pos < cache_length + S, 1, 0)
        q_pos = cache_length + jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32), (B, S))
        out = flash_attention(
            q, k_buf, v_buf,
            q_segment_ids=jnp.ones((B, S), jnp.int32),
            kv_segment_ids=kv_seg,
            q_positions=q_pos, kv_positions=kv_pos,
            causal=True, impl=attn_impl)
    else:
        out = flash_attention(
            q, k, v,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            q_positions=positions, kv_positions=positions,
            causal=True, impl=attn_impl,
            rope_positions=(rope_pack[0], None, rope_pack[1])
            if fused_rope else None)

    out = out.reshape(B, S, cfg.num_attention_heads * cfg.head_dim)
    out = _dot(out, p["wo_kernel"])
    if cfg.bias:
        out = out + p["wo_bias"]
    return out, new_cache


def _two_part_decode_attention(q, k_new, v_new, k_buf, v_buf, cache_length,
                               kv_valid):
    """Decode attention without touching the cache buffers: softmax over
    [cache scores | fresh-token scores], GQA grouped einsums, fp32 math.
    q/k_new/v_new (B, S<=16, H*, hd); k_buf/v_buf (B, max_len, Hkv, hd)."""
    B, S, Hq, hd = q.shape
    max_len = k_buf.shape[1]
    Hkv = k_buf.shape[2]
    G = Hq // Hkv
    scale = hd ** -0.5

    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qg = qf.reshape(B, S, Hkv, G, hd)

    # cache part: mask = valid slots strictly before cache_length
    slot = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    valid_old = slot < cache_length
    if kv_valid is not None:
        valid_old = valid_old & kv_valid
    s_old = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_buf,
                       preferred_element_type=jnp.float32)
    s_old = jnp.where(valid_old[:, None, None, None, :], s_old, -1e30)

    # fresh part: causal among the S new tokens
    s_new = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k_new,
                       preferred_element_type=jnp.float32)
    tri = (jnp.arange(S)[:, None] >= jnp.arange(S)[None, :])
    s_new = jnp.where(tri[None, None, None], s_new, -1e30)

    s = jnp.concatenate([s_old, s_new], axis=-1)  # (B,Hkv,G,S,L+S)
    w = jax.nn.softmax(s, axis=-1)
    w_old, w_new = w[..., :max_len], w[..., max_len:]
    out = jnp.einsum("bhgqk,bkhd->bqhgd", w_old.astype(v_buf.dtype), v_buf,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bhgqk,bkhd->bqhgd",
                           w_new.astype(v_new.dtype), v_new,
                           preferred_element_type=jnp.float32)
    return out.reshape(B, S, Hq, hd).astype(q.dtype)


MLP_CHUNK_THRESHOLD = 32768  # sequence length where SwiGLU goes chunked
MLP_CHUNK = 8192  # bounds the live (chunk, I) gate pair at 256 MB bf16


def _qkv_chunked(p, cfg: LLMConfig, x, cos, sin, fused_rope: bool):
    """Fused-qkv projection + rotary in S-chunks: each chunk's q/k/v are
    scattered (dynamic_update_slice on the scan carry — in place) into
    preallocated (B, S, H*, hd) buffers, so the (S, (G+2)*Hkv*hd) fused
    projection temp never materializes at full length."""
    B, S, D = x.shape
    c = MLP_CHUNK
    n = S // c
    Hq, Hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    q0 = jnp.zeros((B, S, Hq, hd), x.dtype)
    k0 = jnp.zeros((B, S, Hkv, hd), x.dtype)
    v0 = jnp.zeros((B, S, Hkv, hd), x.dtype)

    def body(carry, i):
        q_all, k_all, v_all = carry
        off = i * c
        xi = jax.lax.dynamic_slice(x, (0, off, 0), (B, c, D))
        ci = jax.lax.dynamic_slice(cos, (0, off, 0), (B, c, cos.shape[-1]))
        si = jax.lax.dynamic_slice(sin, (0, off, 0), (B, c, sin.shape[-1]))
        qkv = _dot(xi, p["wqkv_kernel"])
        if cfg.bias or cfg.qkv_bias:
            qkv = qkv + p["wqkv_bias"]
        qi, ki, vi = split_wqkv(qkv, cfg)
        if not fused_rope:
            qi = apply_rotary(qi, ci, si)
        ki = apply_rotary(ki, ci, si)
        q_all = jax.lax.dynamic_update_slice(q_all, qi, (0, off, 0, 0))
        k_all = jax.lax.dynamic_update_slice(k_all, ki, (0, off, 0, 0))
        v_all = jax.lax.dynamic_update_slice(v_all, vi, (0, off, 0, 0))
        return (q_all, k_all, v_all), None

    (q, k, v), _ = jax.lax.scan(body, (q0, k0, v0),
                                jnp.arange(n, dtype=jnp.int32))
    return q, k, v


def mlp_forward(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU: w2(silu(w1 x) * w3 x) — modeling_internlm2.py:444-458.

    Long sequences compute in S-chunks via lax.scan: at 256k the two
    (S, intermediate) bf16 gate buffers are ~8.6 GB live at once for the 2B
    model — the difference between fitting a 256k prefill on one v5e chip
    and crashing the worker. Chunking costs nothing (same FLOPs, 16k-row
    matmuls keep the MXU saturated).

    The chunk body is jax.checkpoint'd so that under TRAINING remat the
    backward holds only ONE chunk's gates at a time instead of the full
    (S, I) pair per in-flight layer — at 32k the unchunked gates were
    nine 512 MB buffers at the backward's peak, the 837 MB-over-HBM
    difference between the 32k recipe step fitting one 16 GB chip and
    OOM. Inference-only forwards are unaffected (checkpoint is identity
    without differentiation)."""
    B, S, D = x.shape
    if S < MLP_CHUNK_THRESHOLD or S % MLP_CHUNK != 0:
        return _dot(jax.nn.silu(_dot(x, p["w1_kernel"]))
                    * _dot(x, p["w3_kernel"]), p["w2_kernel"])
    n = S // MLP_CHUNK
    xc = jnp.moveaxis(x.reshape(B, n, MLP_CHUNK, D), 1, 0)

    @jax.checkpoint
    def chunk(xi):
        return _dot(jax.nn.silu(_dot(xi, p["w1_kernel"]))
                    * _dot(xi, p["w3_kernel"]), p["w2_kernel"])

    def body(_, xi):
        return None, chunk(xi)

    _, out = jax.lax.scan(body, None, xc)
    return jnp.moveaxis(out, 0, 1).reshape(B, S, D)


def layer_forward(p, cfg: LLMConfig, x, cos, sin, *, segment_ids, positions,
                  attn_impl, kv_cache_layer=None, cache_length=None,
                  kv_valid=None, cache_write_only_new=False, paged=None,
                  rope_pack=None, mlp_remat: bool = False):
    """One decoder layer. ``mlp_remat`` is the remat='attn_saved' half:
    only the SwiGLU block is wrapped in jax.checkpoint, so the attention's
    custom_vjp residuals (q/k/v/out/lse) stay resident and its backward
    runs without any forward recompute — the memory/recompute trade
    measured in docs/perf_analysis.md (training section)."""
    h = rms_norm(x, p["attention_norm"], cfg.rms_norm_eps)
    attn_out, new_cache = attention_forward(
        p, cfg, h, cos, sin, segment_ids=segment_ids, positions=positions,
        attn_impl=attn_impl, kv_cache_layer=kv_cache_layer,
        cache_length=cache_length, kv_valid=kv_valid,
        cache_write_only_new=cache_write_only_new, paged=paged,
        rope_pack=rope_pack)
    x = x + attn_out

    def _mlp_block(p2, x):
        h = rms_norm(x, p2["ffn_norm"], cfg.rms_norm_eps)
        return x + mlp_forward(p2, h)

    if mlp_remat:
        x = jax.checkpoint(_mlp_block)(p, x)
    else:
        x = _mlp_block(p, x)
    return x, new_cache


def llm_forward(
    params: dict,
    cfg: LLMConfig,
    *,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    rope_pos_ids: Optional[jnp.ndarray] = None,  # (B, S) float32 V2PE ids
    segment_ids: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,  # (B, S) int32 token indices
    attn_impl: str = "auto",
    kv_cache: Optional[KVCache] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    paged_cache=None,  # Optional[PagedKVCache] — read-only inside
    paged_attend_cache: bool = False,  # chunked prefill: the (>16-token)
    # fresh chunk also attends over the EXISTING pages (multi-turn serving)
    remat: bool = False,
    return_hidden: bool = False,
):
    """Returns fp32 logits (B, S, V) (or hidden states), and the updated
    KVCache when one was passed.

    With ``paged_cache`` the pool is never copied: attention reads pages
    through the Pallas paged-decode kernel (decode) or runs over the fresh
    tokens only (prefill into an empty cache); writes happen in place —
    via the aliased store kernel (decode) or per-layer scatters on the scan
    carry (prefill) — and the second return value is the updated
    PagedKVCache (lengths NOT advanced; callers advance after sampling)."""
    if kv_cache is not None or paged_cache is not None:
        from v2pe_tpu.parallel import context as pctx

        _ctx = pctx.current()
        if _ctx is not None and _ctx.pipe_shards > 1:
            # the pipe sharding rule splits the stacked layer params over
            # stages; a plain layer scan on a cache path would silently
            # re-gather every layer's weights across the pipe axis (over
            # DCN) per decoded token. Decode on a pipe-free mesh instead.
            raise ValueError(
                "KV-cache decode is not supported under a 'pipe' mesh — "
                "build the inference mesh without a pipe axis "
                "(parallel/pipeline.py is a training-forward schedule)")
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params["tok_embeddings"], input_ids)
    x = inputs_embeds
    B, S, _ = x.shape

    if rope_pos_ids is None:
        if paged_cache is not None:
            base = paged_cache.lengths[:, None].astype(jnp.float32)
        else:
            base = 0 if kv_cache is None else kv_cache.length
        rope_pos_ids = base + jnp.arange(S, dtype=jnp.float32)[None, :]
        rope_pos_ids = jnp.broadcast_to(rope_pos_ids, (B, S))
    # rope-scaling ablation modes (linear / dynamic-NTK interpolation
    # baselines, cfg.rope_mode; v2pe/default are pass-through)
    from v2pe_tpu.ops.rope import scale_positions

    if paged_cache is not None:
        total_ctx = jnp.max(paged_cache.lengths) + S
    else:
        total_ctx = S if kv_cache is None else kv_cache.length + S
    scaled_pos, theta = scale_positions(
        rope_pos_ids.astype(jnp.float32), cfg.head_dim, cfg.rope_theta,
        mode=cfg.rope_mode, scaling_factor=cfg.rope_scaling_factor,
        max_position_embeddings=cfg.max_position_embeddings,
        seq_len=total_ctx)
    cos, sin = compute_rope_cos_sin(scaled_pos, cfg.head_dim, theta)
    # fused-kernel rope needs a STATIC theta (dynamic-NTK yields a tracer)
    rope_pack = (scaled_pos, float(theta)) \
        if isinstance(theta, (int, float)) else None

    # layer-stacked int8 weights stay OUT of the scans below: sliced per
    # layer they'd be HBM-copied before each Pallas matmul; the stacked
    # scalar-prefetch kernel reads them in place (quantized_matmul.py)
    layers_rest, layers_quant = split_stacked_quantized(params["layers"])

    if paged_cache is not None and S == 1:
        # decode: pools ride the scan carry; the kernel persists each
        # layer's fresh k/v in place (input_output_aliases) while
        # attending. Returns the UPDATED PagedKVCache (lengths not yet
        # advanced).
        quant = paged_cache.quantized

        def scan_body(carry, lp):
            x, kp, vp, ksc, vsc, li = carry
            x, (kp, vp, ks, vs) = layer_forward(
                _layer_view(lp, layers_quant, li), cfg, x, cos, sin,
                segment_ids=segment_ids,
                positions=positions, attn_impl=attn_impl,
                paged=(paged_cache, li, kp, vp,
                       ksc if quant else None, vsc if quant else None))
            if quant:
                ksc, vsc = ks, vs
            return (x, kp, vp, ksc, vsc, li + 1), None

        zero = jnp.zeros((), jnp.float32)  # unused carry slot (bf16 mode)
        (x, kp, vp, ksc, vsc, _), _ = jax.lax.scan(
            scan_body,
            (x, paged_cache.k_pages, paged_cache.v_pages,
             paged_cache.k_scales if quant else zero,
             paged_cache.v_scales if quant else zero, jnp.int32(0)),
            layers_rest)
        new_cache = paged_cache._replace(k_pages=kp, v_pages=vp)
        if quant:
            new_cache = new_cache._replace(k_scales=ksc, v_scales=vsc)
    elif paged_cache is not None and S <= 16:
        # small multi-token step (possibly onto a NONEMPTY cache): the
        # paged kernel reads the pool per layer, so the pool must stay
        # outside the scan (a carried copy would break XLA aliasing against
        # the kernel's read operand); the fresh (k, v) stack through ys —
        # tiny at <=16 tokens — and scatter once after the scan
        def scan_body(carry, lp):
            x, li = carry
            x, (k_new, v_new) = layer_forward(
                _layer_view(lp, layers_quant, li), cfg, x, cos, sin,
                segment_ids=segment_ids,
                positions=positions, attn_impl=attn_impl,
                paged=(paged_cache, li))
            return (x, li + 1), (k_new, v_new)

        (x, _), (ks, vs) = jax.lax.scan(
            scan_body, (x, jnp.int32(0)), layers_rest)
        from v2pe_tpu.infer import paged_kv as _pk

        valid_t = None if segment_ids is None else \
            jnp.sum((segment_ids != 0).astype(jnp.int32), axis=1)
        new_cache = _pk.write_all_layers(paged_cache, ks, vs, valid_t=valid_t)
    elif paged_cache is not None:
        # long-prompt prefill into empty pages: the pools ride the scan
        # carry and each layer's fresh (k, v) scatters into its pages
        # immediately — stacking all layers through ys first (then one
        # batched scatter) would materialize an extra full-KV-size temp,
        # ~12 GB at 256k context for the 2B model, at exactly the moment
        # HBM is scarcest. No Pallas call reads the pool on this path (the
        # prompt attends only to itself), so XLA aliases the carried
        # buffers and the scatters run in place.
        ps = paged_cache.page_size
        NP = paged_cache.k_pages.shape[2]
        Hkv, hd = cfg.num_key_value_heads, cfg.head_dim
        pos_w = paged_cache.lengths[:, None] + \
            jnp.arange(S, dtype=jnp.int32)[None, :]
        page_slot = jnp.minimum(pos_w // ps,
                                paged_cache.page_table.shape[1] - 1)
        phys = jnp.take_along_axis(paged_cache.page_table, page_slot, axis=1)
        valid_w = phys >= 0
        if segment_ids is not None:
            valid_w &= segment_ids != 0  # right-padded prompt slots
        flat_idx = jnp.where(valid_w, phys * ps + pos_w % ps,
                             NP * ps).reshape(-1)  # OOB -> dropped

        quant = paged_cache.quantized

        def scan_body(carry, lp):
            x, kp, vp, ksc, vsc, li = carry
            slices = None
            if paged_attend_cache:
                # this layer's pool view FROM THE CARRY (see
                # attention_forward's attend_cache note)
                def sl(flat, shape):
                    s = jax.lax.dynamic_index_in_dim(flat, li, 0,
                                                     keepdims=True)
                    return s.reshape(shape)

                k5 = sl(kp, (1, Hkv, NP, ps, hd))
                v5 = sl(vp, (1, Hkv, NP, ps, hd))
                ks5 = sl(ksc, (1, Hkv, NP, 1, ps)) if quant else None
                vs5 = sl(vsc, (1, Hkv, NP, 1, ps)) if quant else None
                slices = (k5, v5, ks5, vs5)
            x, (k_new, v_new) = layer_forward(
                _layer_view(lp, layers_quant, li), cfg, x, cos, sin,
                segment_ids=segment_ids,
                positions=positions, attn_impl=attn_impl,
                paged=(paged_cache, li, slices))
            if quant:
                from v2pe_tpu.infer.paged_kv import quantize_kv

                kv_bits = paged_cache.kv_bits
                k_new, ks = quantize_kv(k_new, kv_bits)  # (B, S, Hkv, 1)
                v_new, vs = quantize_kv(v_new, kv_bits)
                kss = jnp.moveaxis(ks, 2, 0).reshape(Hkv, B * S, 1)
                vss = jnp.moveaxis(vs, 2, 0).reshape(Hkv, B * S, 1)
                ksc = ksc.at[li, :, flat_idx].set(kss.swapaxes(0, 1),
                                                  mode="drop")
                vsc = vsc.at[li, :, flat_idx].set(vss.swapaxes(0, 1),
                                                  mode="drop")
            kv = jnp.moveaxis(k_new, 2, 0).reshape(Hkv, B * S, hd)
            vv = jnp.moveaxis(v_new, 2, 0).reshape(Hkv, B * S, hd)
            kp = kp.at[li, :, flat_idx].set(kv.astype(kp.dtype).swapaxes(0, 1),
                                            mode="drop")
            vp = vp.at[li, :, flat_idx].set(vv.astype(vp.dtype).swapaxes(0, 1),
                                            mode="drop")
            return (x, kp, vp, ksc, vsc, li + 1), None

        L = cfg.num_hidden_layers
        flat_k = paged_cache.k_pages.reshape(L, Hkv, NP * ps, hd)
        flat_v = paged_cache.v_pages.reshape(L, Hkv, NP * ps, hd)
        zero = jnp.zeros((), jnp.float32)
        flat_ks = paged_cache.k_scales.reshape(L, Hkv, NP * ps, 1) \
            if quant else zero
        flat_vs = paged_cache.v_scales.reshape(L, Hkv, NP * ps, 1) \
            if quant else zero
        (x, kp, vp, ksc, vsc, _), _ = jax.lax.scan(
            scan_body, (x, flat_k, flat_v, flat_ks, flat_vs, jnp.int32(0)),
            layers_rest)
        new_cache = paged_cache._replace(
            k_pages=kp.reshape(paged_cache.k_pages.shape),
            v_pages=vp.reshape(paged_cache.v_pages.shape))
        if quant:
            new_cache = new_cache._replace(
                k_scales=ksc.reshape(paged_cache.k_scales.shape),
                v_scales=vsc.reshape(paged_cache.v_scales.shape))
    elif kv_cache is None:
        from v2pe_tpu.parallel import context as pctx

        ctx = pctx.current()
        if ctx is not None and ctx.pipe_shards > 1:
            # GPipe over the 'pipe' mesh axis: stages own layer blocks,
            # microbatches flow via ppermute (parallel/pipeline.py)
            from v2pe_tpu.parallel.pipeline import pipeline_llm_layers

            x = pipeline_llm_layers(
                params["layers"], cfg, x, cos, sin,
                segment_ids=segment_ids, positions=positions,
                attn_impl=attn_impl, rope_pack=rope_pack, ctx=ctx,
                remat=remat)
            new_cache = None
        else:
            # remat modes (measured in docs/perf_analysis.md, training
            # section):
            #   True/'full'  — jax.checkpoint per layer: residual = layer
            #                  input only (~S*D bf16/layer); backward pays
            #                  one full extra forward. The default.
            #   'block2'/'block4' — checkpoint per 2-/4-layer block: HALF/
            #                  QUARTER the residual memory for the same
            #                  recompute FLOPs (one extra forward either
            #                  way) — the knob that fits the 32k recipe's
            #                  train step on one 16 GB chip.
            #   'attn_saved' — attention left un-rematerialized (its
            #                  custom_vjp residuals q/k/v/out/lse stay
            #                  live; the flash bwd kernel runs with NO
            #                  forward recompute), only the SwiGLU block
            #                  checkpointed. Fastest when memory allows.
            #   False/'none' — no remat.
            mode = {True: "full", False: "none"}.get(remat, remat)
            mlp_remat = mode == "attn_saved"

            def run_layer(lp, x, li):
                # the quantized view is built INSIDE so only pytrees cross
                # the jax.checkpoint boundary
                out, _ = layer_forward(_layer_view(lp, layers_quant, li),
                                       cfg, x, cos, sin,
                                       segment_ids=segment_ids,
                                       positions=positions,
                                       attn_impl=attn_impl,
                                       rope_pack=rope_pack,
                                       mlp_remat=mlp_remat)
                return out

            if mode == "full":
                run_layer = jax.checkpoint(run_layer)

            L = cfg.num_hidden_layers
            blk = int(mode[5:]) if (isinstance(mode, str)
                                    and mode.startswith("block")) else 1
            if blk > 1 and L % blk == 0:
                def run_block(bp, x, li0):
                    for j in range(blk):
                        lp = jax.tree.map(lambda a, _j=j: a[_j], bp)
                        x = run_layer(lp, x, li0 + j)
                    return x

                run_block = jax.checkpoint(run_block)
                blocked = jax.tree.map(
                    lambda a: a.reshape((L // blk, blk) + a.shape[1:]),
                    layers_rest)

                def scan_body(carry, bp):
                    x, li = carry
                    return (run_block(bp, x, li), li + blk), None

                (x, _), _ = jax.lax.scan(scan_body, (x, jnp.int32(0)),
                                         blocked)
            else:
                if blk > 1:  # L not divisible: degrade to full remat
                    run_layer = jax.checkpoint(run_layer)

                def scan_body(carry, lp):
                    x, li = carry
                    return (run_layer(lp, x, li), li + 1), None

                (x, _), _ = jax.lax.scan(scan_body, (x, jnp.int32(0)),
                                         layers_rest)
            new_cache = None
    else:
        # the whole (L, B, max_len, Hkv, hd) cache rides the scan CARRY and
        # only the S new tokens are written per layer — scanning the cache
        # through ys would rewrite the full buffers every call (~1.6 GB per
        # decoded token at 8k), which dominated decode time
        def scan_body(carry, lp):
            x, kc, vc, li = carry
            x, (kb, vb) = layer_forward(
                _layer_view(lp, layers_quant, li), cfg, x, cos, sin,
                segment_ids=segment_ids,
                positions=positions, attn_impl=attn_impl,
                kv_cache_layer=(
                    jax.lax.dynamic_index_in_dim(kc, li, 0, keepdims=False),
                    jax.lax.dynamic_index_in_dim(vc, li, 0, keepdims=False)),
                cache_length=kv_cache.length, kv_valid=kv_valid,
                cache_write_only_new=True)
            k_new, v_new = kb, vb  # (B, S, Hkv, hd) — just the new tokens
            kc = jax.lax.dynamic_update_slice(
                kc, k_new[None].astype(kc.dtype),
                (li, 0, kv_cache.length, 0, 0))
            vc = jax.lax.dynamic_update_slice(
                vc, v_new[None].astype(vc.dtype),
                (li, 0, kv_cache.length, 0, 0))
            return (x, kc, vc, li + 1), None

        (x, k_new, v_new, _), _ = jax.lax.scan(
            scan_body, (x, kv_cache.k, kv_cache.v, jnp.int32(0)),
            layers_rest)
        new_cache = KVCache(k_new, v_new, kv_cache.length + S)

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if return_hidden:
        return x, new_cache
    logits = head_logits(x, params["output_kernel"])
    return logits, new_cache
