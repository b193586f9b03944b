"""shard_map wrapper routing model attention onto the mesh.

Pallas kernels don't auto-partition under GSPMD, so attention is the one op
that needs explicit shard_map. Two regimes:

* seq axis == 1: plain flash attention per shard; batch over the batch axes,
  heads over 'tensor'.
* seq axis > 1: ring attention (parallel/ring.py) — the sequence dim is
  sharded, KV chunks rotate over ICI.

The decoder (causal) shards the sequence; the ViT (bidirectional, 1025-token
tiles) instead shards its *tile batch* over every axis including seq — the
TPU analogue of the reference's ViT-data-parallel-over-ring-group with
all-gathered embeddings (modeling_internvl_chat.py:198-221)."""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from v2pe_tpu.ops.attention import AttnStatics, _flash
from v2pe_tpu.parallel.context import ShardingContext
from v2pe_tpu.parallel.ring import ring_flash_attention


def sharded_flash_attention(ctx: ShardingContext, statics: AttnStatics,
                            q, k, v, seg_q, seg_k, pos_q, pos_k,
                            rope_q=None, rope_k=None):
    mesh = ctx.mesh
    ba, sa, ta = ctx.batch_axes, ctx.seq_axis, ctx.tensor_axis
    n_tensor = mesh.shape[ta]
    n_seq = ctx.seq_shards

    B, Sq, Hq, D = q.shape
    Hkv = k.shape[2]

    batch_axes = tuple(a for a in ba if mesh.shape[a] > 1)
    # pick only axes that divide the tensor dims
    n_batch = 1
    for a in batch_axes:
        n_batch *= mesh.shape[a]
    if n_batch > 1 and B % n_batch != 0:
        batch_axes = ()
    head_axis = ta if (n_tensor > 1 and Hq % n_tensor == 0
                       and Hkv % n_tensor == 0) else None

    if statics.causal and n_seq > 1 and Sq % n_seq == 0:
        seq_axis = sa
        tile_axes = batch_axes
        if statics.rope_theta:
            # ring: pre-rotate at the jnp level — carrying rotating rope-id
            # chunks around the ring isn't worth the plumbing (the quadratic
            # attention dominates at ring-scale contexts)
            from v2pe_tpu.ops.attention import _apply_rope_jnp

            q, k = _apply_rope_jnp(q, k, rope_q, rope_k, statics.rope_theta)
        ring_statics = statics._replace(ordered=False, rope_theta=0.0)
        if ctx.ring_mode == "fused":
            from v2pe_tpu.parallel.ring_fused import \
                fused_ring_flash_attention as _ring_impl
        elif ctx.ring_mode == "scan":
            _ring_impl = ring_flash_attention
        else:
            raise ValueError(f"unknown ring_mode {ctx.ring_mode!r} "
                             "(expected 'scan' or 'fused')")

        def fn(q, k, v, sq, sk, pq, pk):
            return _ring_impl(sa, ring_statics, q, k, v, sq, sk, pq, pk)
        rope_args, rope_specs = (), ()
    else:
        seq_axis = None
        # bidirectional (ViT): fold seq axis into the tile batch if it fits
        tile_axes = batch_axes
        if n_seq > 1:
            bigger = tuple(tile_axes) + (sa,)
            nb = n_batch * n_seq
            if B % nb == 0:
                tile_axes = bigger

        if statics.rope_theta:
            def fn(q, k, v, sq, sk, pq, pk, rq, rk):
                return _flash(statics, q, k, v, sq, sk, pq, pk, rq, rk)
            rope_args = (rope_q, rope_k)
        else:
            def fn(q, k, v, sq, sk, pq, pk):
                return _flash(statics, q, k, v, sq, sk, pq, pk)
            rope_args = ()

    bspec = tile_axes if tile_axes else None
    qspec = P(bspec, seq_axis, head_axis, None)
    vecspec = P(bspec, seq_axis)
    rope_specs = (vecspec,) * len(rope_args)

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(qspec, qspec, qspec, vecspec, vecspec, vecspec, vecspec)
        + rope_specs,
        out_specs=qspec,
        check_vma=False,
    )(q, k, v, seg_q, seg_k, pos_q, pos_k, *rope_args)
