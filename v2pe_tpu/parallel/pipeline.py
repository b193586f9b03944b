"""Pipeline parallelism (GPipe) over a ``pipe`` mesh axis.

The reference scales training with DeepSpeed ZeRO only (data-parallel
sharding; internvl_chat_finetune.py:1104-1111) — it has no pipeline axis.
On TPU pods a pipeline axis is the natural way to span the slow DCN links
between ICI slices for models whose layer stack no longer fits (or no
longer scales) on one slice: each slice holds a contiguous block of
decoder layers and only the (B_mb, S, D) activations cross DCN once per
microbatch per stage boundary, instead of every fsdp all-gather.

Design (tpu-first, not a torch translation):

* The decoder layers are already a layer-stacked pytree scanned by
  ``lax.scan`` (models/internlm2.py); pipelining is literally sharding the
  leading L dim over ``pipe`` (parallel/mesh.py adds that rule when the
  mesh has a sized pipe axis) and running the scan per stage.
* The schedule is expressed as ONE SPMD program with
  ``jax.shard_map(axis_names={"pipe"})``: the pipe axis is manual (layers
  differ per device), everything else stays GSPMD-auto, so data/fsdp/tensor
  sharding *inside* a stage keeps working unchanged.
* GPipe ticks run as a ``lax.scan``: at tick t stage s computes microbatch
  ``m = t - s`` (bubble ticks compute on clamped indices and mask their
  writes), then hands its activations to stage s+1 with a single
  ``ppermute`` hop — a neighbor transfer, exactly what DCN topologies want.
  ``M + P - 1`` ticks move M microbatches through P stages; the bubble
  fraction is (P-1)/(M+P-1).
* The backward schedule is not hand-written: ``jax.grad`` differentiates
  the tick scan, and the transpose of ``ppermute`` is the reversed-ring
  ``ppermute``, so the cotangents flow stage P-1 -> 0 in reverse pipeline
  order automatically. With ``remat`` each stage's layer block is
  rematerialized from its tick-boundary input (checkpoint-per-stage — the
  standard GPipe memory contract).

Composition contract (v1): pipe x data x fsdp x tensor. Ring sequence
parallelism is not composed with the pipeline (assert seq == 1): ring
needs the sequence dim sharded over devices inside the stage, which is a
different activation layout than the pipeline's replicated microbatch.
Inside the pipeline body the ambient ShardingContext is deactivated, so
attention runs the plain (GSPMD-partitionable) path.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from v2pe_tpu.parallel import context as pctx

_logger = logging.getLogger(__name__)


def choose_microbatches(batch: int, n_pipe: int, requested: int = 0,
                        dp: int = 1) -> int:
    """Microbatch count: the requested value, else the largest divisor of
    ``batch`` that is <= 2 * n_pipe (more microbatches shrink the bubble;
    past ~2P the returns vanish while per-microbatch matmuls shrink).

    ``dp``: the data-parallel extent batch rows are sharded over. Divisors
    where the per-microbatch row count stays divisible by ``dp`` are
    preferred — otherwise the microbatch activations must replicate over
    the batch axes inside the stage (see ``pipeline_llm_layers``)."""
    if requested:
        if batch % requested:
            raise ValueError(
                f"pipe_microbatches={requested} must divide batch={batch}")
        return requested
    best = 1
    for m in range(min(batch, 2 * n_pipe), 0, -1):
        if batch % m == 0:
            if (batch // m) % dp == 0:
                if m == 1 and n_pipe > 1:
                    # B rows already spread 1-per-dp-group: microbatching
                    # below one row per group would idle dp groups, so the
                    # schedule degenerates to sequential model parallelism
                    # (bubble (P-1)/P). Surface it — the fix is a larger
                    # global batch or explicit --pipe_microbatches.
                    _logger.warning(
                        "pipeline: batch=%d over dp=%d leaves 1 microbatch "
                        "— no overlap across %d stages (bubble %.0f%%); "
                        "grow the batch or set pipe_microbatches",
                        batch, dp, n_pipe, 100 * (n_pipe - 1) / n_pipe)
                return m
            best = max(best, m) if best == 1 else best
    return best


def _mb_split(t: Optional[jnp.ndarray], m: int):
    """(B, ...) -> (M, B/M, ...); None passes through."""
    if t is None:
        return None
    return t.reshape((m, t.shape[0] // m) + t.shape[1:])


def _mb_take(t, i):
    if t is None:
        return None
    return jax.lax.dynamic_index_in_dim(t, i, 0, keepdims=False)


def pipeline_llm_layers(
    layers,
    cfg,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    segment_ids: Optional[jnp.ndarray],
    positions: Optional[jnp.ndarray],
    attn_impl: str,
    rope_pack: Optional[tuple],
    ctx: "pctx.ShardingContext",
    remat: bool = True,
):
    """Run the stacked decoder layers GPipe-pipelined over ``ctx``'s pipe
    axis. Semantically identical to the plain ``lax.scan`` over layers in
    ``llm_forward`` (tested token-exact on the virtual mesh); the batch dim
    must be divisible into microbatches (B >= microbatches).

    ``layers``: layer-stacked param pytree, leading dim L sharded over
    ``pipe`` (parallel/mesh.py). ``x``: (B, S, D) hidden states.
    """
    from v2pe_tpu.models.internlm2 import layer_forward

    n_pipe = ctx.pipe_shards
    axis = ctx.pipe_axis
    assert ctx.seq_shards == 1, \
        "pipeline parallelism does not compose with ring SP (seq must be 1)"
    B = x.shape[0]
    L = jax.tree_util.tree_leaves(layers)[0].shape[0]
    assert L % n_pipe == 0, f"layers {L} % pipe {n_pipe} != 0"
    mesh_shape = dict(ctx.mesh.shape)
    dp = 1
    for a in ctx.batch_axes:
        dp *= mesh_shape.get(a, 1)
    M = choose_microbatches(B, n_pipe, ctx.pipe_microbatches, dp=dp)

    rope_ids, rope_theta = rope_pack if rope_pack is not None else (None, 0.0)

    # Pin the microbatch-split layout at the shard_map boundary: rows stay
    # sharded over the batch axes (replicated if M broke divisibility) and
    # the M dim is NEVER device-sharded. Left to propagation, GSPMD happily
    # shards the M dim over fsdp and then needs an "involuntary full
    # rematerialization" resharding at the shard_map edge — slow, and its
    # partitioner path miscompiles (crashes) on some real batch geometries.
    row_spec = ctx.batch_axes if (B // M) % dp == 0 and dp > 1 else None
    from jax.sharding import NamedSharding

    def pin(t):
        if t is None:
            return None
        return jax.lax.with_sharding_constraint(
            t, NamedSharding(ctx.mesh, P(None, row_spec)))

    # Float operands cross the shard_map boundary in f32: every pipe-axis
    # all-reduce (the output psum below AND the transpose-inserted psums of
    # these replicated inputs' cotangents in the backward) must be f32 —
    # partial-manual shard_map lowers psum with an sdy.sharding_constraint
    # inside the HLO reduction body (copy-rooted reducer), and XLA CPU's
    # AllReducePromotion pass crashes promoting those at bf16. The body
    # casts back to the compute dtype immediately, so only the boundary
    # collectives pay the 2x bytes.
    cdtype = x.dtype

    def f32(t):
        return None if t is None else t.astype(jnp.float32)

    x_all = f32(pin(_mb_split(x, M)))
    cos_all = f32(pin(_mb_split(cos, M)))
    sin_all = f32(pin(_mb_split(sin, M)))
    seg_all = pin(_mb_split(segment_ids, M))
    pos_all = pin(_mb_split(positions, M))
    rid_all = pin(_mb_split(rope_ids, M))

    def body(layers_local, x_all, cos_all, sin_all, seg_all, pos_all,
             rid_all):
        stage = jax.lax.axis_index(axis)

        def local_stack(x, cos, sin, seg, pos, rid):
            def sbody(x, lp):
                with pctx.use_sharding(None):
                    x, _ = layer_forward(
                        lp, cfg, x, cos, sin, segment_ids=seg,
                        positions=pos, attn_impl=attn_impl,
                        rope_pack=(rid, rope_theta)
                        if rid is not None else None)
                return x, None

            if remat:
                sbody = jax.checkpoint(sbody)
            x, _ = jax.lax.scan(sbody, x, layers_local)
            return x

        def tick(carry, t):
            state, out_buf = carry
            m = t - stage            # microbatch this stage works on
            valid = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            # hidden states ride the schedule in the compute dtype (the
            # f32 x_all boundary cast is undone here); only out_buf — the
            # value the boundary psum reduces — accumulates in f32
            inp = jnp.where(stage == 0,
                            _mb_take(x_all, mc).astype(cdtype), state)

            y = local_stack(inp, _mb_take(cos_all, mc),
                            _mb_take(sin_all, mc),
                            _mb_take(seg_all, mc),
                            _mb_take(pos_all, mc),
                            _mb_take(rid_all, mc))
            write = valid & (stage == n_pipe - 1)
            out_buf = jnp.where(
                write, jax.lax.dynamic_update_index_in_dim(
                    out_buf, y.astype(jnp.float32), mc, 0),
                out_buf)
            # no wrap edge: stage 0 never reads its incoming state (it
            # takes x_all), so the P-1 -> 0 hop would be (B/M, S, D) of
            # dead traffic over DCN every tick; non-receivers zero-fill
            state = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(n_pipe - 1)])
            return (state, out_buf), None

        state0 = jnp.zeros_like(_mb_take(x_all, 0), dtype=cdtype)
        out0 = jnp.zeros_like(x_all)
        (_, out), _ = jax.lax.scan(tick, (state0, out0),
                                   jnp.arange(M + n_pipe - 1))
        # only the last stage wrote; psum replicates the result over pipe
        # (one activation-stack all-reduce — the final norm/head/loss run
        # GSPMD-replicated over the pipe axis afterwards)
        return jax.lax.psum(out, axis)

    f = jax.shard_map(
        body, mesh=ctx.mesh,
        in_specs=(P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(), axis_names={axis},
        # vma tracking emits psum_invariant collectives whose HLO reduction
        # body is copy-rooted; XLA's AllReducePromotion crashes promoting
        # those at bf16 (CPU backend). Plain psums promote fine.
        check_vma=False)
    out = f(layers, x_all, cos_all, sin_all, seg_all, pos_all, rid_all)
    out = jax.lax.with_sharding_constraint(
        out, NamedSharding(ctx.mesh, P(None, row_spec)))
    return out.astype(cdtype).reshape(x.shape)
