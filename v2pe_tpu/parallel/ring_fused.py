"""Fused-RDMA ring attention: in-kernel ICI streaming, one Pallas call.

The scan-based ring (`parallel/ring.py`) alternates XLA collective-permutes
with flash-kernel calls and pays an HBM round-trip of the full (out, lse)
merge state on every hop. This kernel is the TPU-native rendering of the
reference's NCCL P2P ring (ring-flash-attn 0.1.3,
patch/internlm2_packed_training_patch.py:76-128) taken one level further
than XLA can: the KV chunks stream around the ring via **in-kernel async
remote DMA** (`pltpu.make_async_remote_copy` over ICI) while the MXU
consumes them, and the online-softmax accumulators never leave VMEM —
zero per-hop HBM merge traffic.

Design (all-gather streaming schedule):

* each device forwards its local KV chunk to its right neighbor, then
  forwards every received chunk one more hop (n-1 sends total, chunk
  slots are write-once so no capacity handshake is needed — only the
  startup neighborhood barrier);
* consumption order is arrival order (hop s delivers the chunk of rank
  ``me - s``), identical to the scan ring's rotation order;
* grid is (B, Hq, nq, hop, kv-block): hops are INNER to a query block, so
  (acc, m, l) stay resident in VMEM for the whole global-KV sweep — the
  scan ring instead re-reads/re-writes the full f32 out + lse per hop;
* causal/zigzag load balancing falls out of per-block liveness
  classification from O(block) segment/position reduces (finer than the
  scan ring's half-chunk branches);
* peak HBM cost: the (n-1)-slot chunk buffer = the full global KV per
  device (1 GB at 256k tokens, Hkv=8, D=128, bf16). For contexts where
  that does not fit, the 2-slot scan ring remains the memory-lean path.

Backward reuses the scan ring's custom-vjp ring pass (the lse contract is
identical), so ``fused_ring_attention`` is a drop-in forward upgrade.

Hardware validation status: multi-chip ICI cannot be exercised in this
repo's 1-chip environment; correctness (including DMA race-freedom) is
verified on an 8-device simulated mesh via the Pallas TPU interpreter
(``InterpretParams(detect_races=True)`` — tests/test_ring_fused.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from v2pe_tpu.ops.attention import AttnStatics, _pad_axis
from v2pe_tpu.ops.flash_pallas import NEG_INF, LANES, _cdiv, pick_block
from v2pe_tpu.parallel import ring as _ring

# get_barrier_semaphore requires a collective_id; any stable value unique to
# this kernel family works.
_COLLECTIVE_ID = 11

# Used when statics.interpret (i.e. off-TPU). Tests swap this for
# InterpretParams(detect_races=True) to run the DMA race detector.
INTERPRET_PARAMS = pltpu.InterpretParams()


def _kernel(seg_q_ref, pos_q_ref, q_ref,      # blocked operands
            k_any, v_any, segk_any, posk_any,  # full ANY-space operands
            out_ref, lse_ref,                  # blocked outputs
            kbuf, vbuf, segbuf, posbuf,        # HBM chunk-gather scratch
            kst, vst, segst, posst,            # VMEM staging (2 slots)
            acc_ref, m_ref, l_ref,             # VMEM accumulators
            send_sem, recv_sem, cp_sem,        # DMA semaphores
            *, axis_name: str, n: int, causal: bool, scale: float,
            bq: int, bk: int, nk: int, G: int,
            B: int, Hq: int, nq: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    s = pl.program_id(3)
    j = pl.program_id(4)
    hkv = jax.lax.div(h, G)
    first_block = (b == 0) & (h == 0) & (i == 0)

    me = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(me + 1, n)
    left = jax.lax.rem(me + n - 1, n)
    MESH = pltpu.DeviceIdType.MESH

    chunk_srcs = (k_any, v_any, segk_any, posk_any)
    bufs = (kbuf, vbuf, segbuf, posbuf)

    # ---------------- comm engine (first query block only) ----------------
    if n > 1:
        @pl.when(first_block & (j == 0))
        def _comm():
            @pl.when(s == 0)
            def _startup():
                # neighborhood barrier: both neighbors' kernels are live
                # before any RDMA lands in their buffers
                bar = pltpu.get_barrier_semaphore()
                pltpu.semaphore_signal(bar, inc=1, device_id={axis_name: left},
                                       device_id_type=MESH)
                pltpu.semaphore_signal(bar, inc=1,
                                       device_id={axis_name: right},
                                       device_id_type=MESH)
                pltpu.semaphore_wait(bar, 2)
                # forward the local chunk -> right neighbor's slot 0
                for t in range(4):
                    pltpu.make_async_remote_copy(
                        chunk_srcs[t], bufs[t].at[0],
                        send_sem.at[0, t], recv_sem.at[0, t],
                        device_id={axis_name: right},
                        device_id_type=MESH).start()

            @pl.when(s > 0)
            def _arrive_and_forward():
                d = s - 1  # slot consumed at hop s
                for t in range(4):
                    # wait for the incoming chunk (recv side of the left
                    # neighbor's copy into our slot d)
                    pltpu.make_async_copy(bufs[t].at[d], bufs[t].at[d],
                                          recv_sem.at[d, t]).wait()

                @pl.when(s < n - 1)
                def _forward():
                    # pass it on: our slot s-1 -> right neighbor's slot s
                    for t in range(4):
                        pltpu.make_async_remote_copy(
                            bufs[t].at[s - 1], bufs[t].at[s],
                            send_sem.at[s, t], recv_sem.at[s, t],
                            device_id={axis_name: right},
                            device_id_type=MESH).start()

    # ---------------- KV staging: HBM -> VMEM double buffer ---------------
    # Parity is GLOBAL over the (hop, kv-block) sweep — t = s*nk + j — so
    # prefetch can cross hop boundaries: at (s, nk-1) the next stage copy
    # targets the opposite buffer even when nk is odd. Only the first
    # (b, h, i) block must stall at each hop start: its chunk lands in
    # `bufs` under the recv wait issued above in this same invocation; all
    # later blocks find every hop resident (sequential grid order) and
    # stream the whole n*nk sweep with no staging gap.
    stages = (kst, vst, segst, posst)

    def _start_stage(par, hop, jj):
        """Issue async copies of kv-block ``jj`` of hop ``hop`` into
        staging parity ``par`` (all arguments may be traced)."""
        def issue(srcs):
            pltpu.make_async_copy(
                srcs[0].at[b, hkv, pl.ds(jj * bk, bk), :], kst.at[par],
                cp_sem.at[par, 0]).start()
            pltpu.make_async_copy(
                srcs[1].at[b, hkv, pl.ds(jj * bk, bk), :], vst.at[par],
                cp_sem.at[par, 1]).start()
            pltpu.make_async_copy(
                srcs[2].at[b, :, pl.ds(jj * bk, bk)], segst.at[par],
                cp_sem.at[par, 2]).start()
            pltpu.make_async_copy(
                srcs[3].at[b, :, pl.ds(jj * bk, bk)], posst.at[par],
                cp_sem.at[par, 3]).start()

        if n > 1:
            @pl.when(hop == 0)
            def _local():
                issue(chunk_srcs)

            @pl.when(hop > 0)
            def _gathered():
                issue(tuple(buf.at[hop - 1] for buf in bufs))
        else:
            issue(chunk_srcs)

    def _wait_stage(par):
        for t, ref in enumerate(stages):
            pltpu.make_async_copy(ref.at[par], ref.at[par],
                                  cp_sem.at[par, t]).wait()

    t_blk = s * nk + j
    par = jax.lax.rem(t_blk, 2)

    @pl.when(t_blk == 0)
    def _cold_start():
        _start_stage(0, 0, 0)

    if n > 1:
        # first (b,h,i) block: hop s's chunk only just arrived (recv wait
        # above) — the cross-hop prefetch below skipped it, issue it now
        @pl.when(first_block & (j == 0) & (s > 0))
        def _hop_start():
            _start_stage(par, s, 0)

    _wait_stage(par)

    nxt = t_blk + 1
    cross = j + 1 >= nk  # next stage copy crosses a hop boundary
    may_prefetch = nxt < n * nk
    if n > 1:
        # first_block can't prefetch across hops: the source chunk hasn't
        # been recv-waited yet (it may still be in flight from the left
        # neighbor); _hop_start covers it next invocation instead
        may_prefetch &= jnp.logical_not(first_block & cross)

    @pl.when(may_prefetch)
    def _lookahead():
        _start_stage(jax.lax.rem(nxt, 2), jax.lax.div(nxt, nk),
                     jax.lax.rem(nxt, nk))

    # ---------------- flash-attention block update ------------------------
    @pl.when((s == 0) & (j == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    seg_qv = seg_q_ref[0]                           # (1, bq)
    seg_kv = segst[par]                             # (1, bk)
    pos_qv = pos_q_ref[0]                           # (1, bq)
    pos_kv = posst[par]                             # (1, bk)

    q_valid = seg_qv != 0
    k_valid = seg_kv != 0
    live = jnp.any(q_valid) & jnp.any(k_valid)
    if causal:
        q_max = jnp.max(jnp.where(q_valid, pos_qv, -1))
        k_min = jnp.min(jnp.where(k_valid, pos_kv, 2 ** 30))
        live &= q_max >= k_min

    @pl.when(live)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # (bq, D)
        k = kst[par].astype(jnp.float32)             # (bk, D)
        sm = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, bk)

        # full/boundary split (flash_pallas.py rationale): interior blocks
        # skip the mask build + selects entirely
        sq_min, sq_max = jnp.min(seg_qv), jnp.max(seg_qv)
        sk_min, sk_max = jnp.min(seg_kv), jnp.max(seg_kv)
        full = (sq_min == sq_max) & (sk_min == sk_max) \
            & (sq_min == sk_min) & (sq_min != 0)
        if causal:
            full &= jnp.min(pos_qv) >= jnp.max(pos_kv)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        v = vst[par].astype(jnp.float32)             # (bk, D)

        def _update(scores):
            m_new = jnp.maximum(jnp.maximum(
                m_prev, jnp.max(scores, axis=-1, keepdims=True)),
                NEG_INF / 2)
            corr = jnp.exp(m_prev - m_new)
            e = jnp.exp(scores - m_new)
            l_new = l_prev * corr + jnp.sum(e, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                e, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * corr + pv
            m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(full)
        def _full_block():
            _update(sm)

        @pl.when(jnp.logical_not(full))
        def _boundary_block():
            seg_q = jnp.swapaxes(seg_qv, 0, 1)       # (bq, 1)
            mask = (seg_q == seg_kv) & (seg_q != 0)
            if causal:
                pos_q = jnp.swapaxes(pos_qv, 0, 1)
                mask &= pos_q >= pos_kv
            _update(jnp.where(mask, sm, NEG_INF))

    @pl.when((s == n - 1) & (j == nk - 1))
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l > 0, l, 1.0)
        out_ref[0, 0] = (acc_ref[...] / l_safe).astype(out_ref.dtype)
        m = m_ref[:, :1]
        lse_ref[0, 0] = jnp.where(l > 0, m + jnp.log(l_safe), NEG_INF)

    # ---------------- drain: all sends complete before kernel exit --------
    if n > 1:
        last = (b == B - 1) & (h == Hq - 1) & (i == nq - 1) \
            & (s == n - 1) & (j == nk - 1)

        @pl.when(last)
        def _drain():
            for d in range(n - 1):
                srcs = chunk_srcs if d == 0 else \
                    tuple(buf.at[d - 1] for buf in bufs)
                for t in range(4):
                    pltpu.make_async_copy(srcs[t], srcs[t],
                                          send_sem.at[d, t]).wait()


def _fused_fwd_impl(axis_name: str, statics: AttnStatics,
                    q, k, v, seg_q, seg_k, pos_q, pos_k):
    """Per-device forward. Returns (out, lse) with the flash contract."""
    n = jax.lax.psum(1, axis_name)  # static for a mesh axis
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    G = Hq // Hkv

    bq = pick_block(Sq, statics.block_q) if Sq >= 128 \
        else min(statics.block_q, Sq)
    bk = pick_block(Sk, statics.block_k) if Sk >= 128 \
        else min(statics.block_k, Sk)
    nq, nk = _cdiv(Sq, bq), _cdiv(Sk, bk)
    Sq_p, Sk_p = nq * bq, nk * bk

    qt = _pad_axis(jnp.swapaxes(q, 1, 2), 2, Sq_p)       # (B,Hq,Sq_p,D)
    kt = _pad_axis(jnp.swapaxes(k, 1, 2), 2, Sk_p)       # (B,Hkv,Sk_p,D)
    vt = _pad_axis(jnp.swapaxes(v, 1, 2), 2, Sk_p)
    seg_q2 = _pad_axis(seg_q.astype(jnp.int32), 1, Sq_p)[:, None, :]
    seg_k2 = _pad_axis(seg_k.astype(jnp.int32), 1, Sk_p)[:, None, :]
    pos_q2 = _pad_axis(pos_q.astype(jnp.int32), 1, Sq_p,
                       value=-1)[:, None, :]
    pos_k2 = _pad_axis(pos_k.astype(jnp.int32), 1, Sk_p,
                       value=2 ** 30)[:, None, :]

    grid = (B, Hq, nq, n, nk)
    kernel = functools.partial(
        _kernel, axis_name=axis_name, n=n, causal=statics.causal,
        scale=statics.scale, bq=bq, bk=bk, nk=nk, G=G, B=B, Hq=Hq, nq=nq)

    nbuf = max(n - 1, 1)  # zero-size scratch is invalid; unused when n == 1
    scratch = [
        pltpu.HBM((nbuf, B, Hkv, Sk_p, D), k.dtype),     # kbuf
        pltpu.HBM((nbuf, B, Hkv, Sk_p, D), v.dtype),     # vbuf
        pltpu.HBM((nbuf, B, 1, Sk_p), jnp.int32),        # segbuf
        pltpu.HBM((nbuf, B, 1, Sk_p), jnp.int32),        # posbuf
        pltpu.VMEM((2, bk, D), k.dtype),                 # kst
        pltpu.VMEM((2, bk, D), v.dtype),                 # vst
        pltpu.VMEM((2, 1, bk), jnp.int32),               # segst
        pltpu.VMEM((2, 1, bk), jnp.int32),               # posst
        pltpu.VMEM((bq, D), jnp.float32),                # acc
        pltpu.VMEM((bq, LANES), jnp.float32),            # m
        pltpu.VMEM((bq, LANES), jnp.float32),            # l
        pltpu.SemaphoreType.DMA((nbuf, 4)),              # send
        pltpu.SemaphoreType.DMA((nbuf, 4)),              # recv
        pltpu.SemaphoreType.DMA((2, 4)),                 # staging copies
    ]
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq), lambda b, h, i, s, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, h, i, s, j: (b, 0, i)),
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, s, j: (b, h, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),        # k
            pl.BlockSpec(memory_space=pl.ANY),        # v
            pl.BlockSpec(memory_space=pl.ANY),        # seg_k
            pl.BlockSpec(memory_space=pl.ANY),        # pos_k
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, h, i, s, j: (b, h, i, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, i, s, j: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, Sq_p, D), q.dtype),
            jax.ShapeDtypeStruct((B, Hq, Sq_p, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 5,
            has_side_effects=True,
            collective_id=_COLLECTIVE_ID,
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        # This kernel is Pallas-only (no jnp fallback), so interpret whenever
        # we're off-TPU regardless of what impl the caller's statics resolved
        # to (e.g. the train CLI resolves attn_impl='auto' -> 'jnp' on CPU).
        interpret=(INTERPRET_PARAMS
                   if statics.interpret or jax.default_backend() != "tpu"
                   else False),
    )(seg_q2, pos_q2, qt, kt, vt, seg_k2, pos_k2)

    out = jnp.swapaxes(out[:, :, :Sq], 1, 2)             # (B,Sq,Hq,D)
    lse = lse[:, :, :Sq, 0]                              # (B,Hq,Sq)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_ring_flash_attention(axis_name: str, statics: AttnStatics,
                               q, k, v, seg_q, seg_k, pos_q, pos_k):
    out, _ = _fused_fwd_impl(axis_name, statics, q, k, v, seg_q, seg_k,
                             pos_q, pos_k)
    return out


def _fused_fwd(axis_name, statics, q, k, v, seg_q, seg_k, pos_q, pos_k):
    out, lse = _fused_fwd_impl(axis_name, statics, q, k, v, seg_q, seg_k,
                               pos_q, pos_k)
    return out, (q, k, v, seg_q, seg_k, pos_q, pos_k, out, lse)


# backward = the scan ring's rotation pass (identical lse contract)
fused_ring_flash_attention.defvjp(_fused_fwd, _ring._ring_bwd)


def fused_ring_attention(
    q, k, v, *,
    axis_name: str,
    q_segment_ids, kv_segment_ids, q_positions, kv_positions,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
):
    """Public per-device entry (call inside shard_map over ``axis_name``).

    Same contract as :func:`v2pe_tpu.parallel.ring.ring_attention`; the
    forward streams KV via in-kernel RDMA, the backward reuses the scan
    ring. Requires q/k pre-rotated (no fused rope in this kernel)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    statics = AttnStatics(
        causal=causal, scale=float(scale), block_q=block_q, block_k=block_k,
        impl="pallas" if jax.default_backend() == "tpu" else "jnp",
        ordered=False, interpret=interpret)
    return fused_ring_flash_attention(
        axis_name, statics, q, k, v,
        q_segment_ids.astype(jnp.int32), kv_segment_ids.astype(jnp.int32),
        q_positions.astype(jnp.int32), kv_positions.astype(jnp.int32))
