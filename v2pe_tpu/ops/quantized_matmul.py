"""Int8/int4 weight-only quantized linear layers (decode bandwidth
optimization).

Beyond-reference: the reference serves fp16 weights (model_worker.py:66-77).
On TPU, single-stream decode is weight-HBM-bandwidth-bound (measured: dense
8k decode 151.7 tok/s ~= 84% of the bf16 weight roofline on v5e), so halving
the weight bytes nearly doubles the decode ceiling. Per-output-channel
symmetric int8:

    w ~= q * scale,   q int8 (D, N),  scale f32 (1, N) = amax_D(|w|) / 127

The scale commutes out of the contraction, so the matmul computes
``dot(x, q) * scale`` — the int8 payload is converted to bf16 *in VMEM*
inside a Pallas kernel (HBM only ever sees int8), and accumulation stays
fp32. Quality: weight-only per-channel int8 is the standard lossless-ish
serving quantization (no activation quantization, no calibration data).

Int4 (``Int4Weight``) halves the weight bytes again: two 4-bit values per
int8 byte, quantized symmetrically per GROUP of ``group_size`` (default
128) contracted rows per output channel — per-channel int4 RTN degrades a
2B model noticeably, group-128 is the standard weight-only int4 recipe
(AWQ/GPTQ storage convention). Group scales do not commute out of the
contraction, so the kernel dequantizes in VMEM (unpack nibbles ->
per-group scale multiply -> bf16 matmul); HBM only ever sees the packed
payload. Rows ``d`` and ``d + D/2`` share a byte, so unpacking yields the
two contiguous halves of the weight and the kernel runs two half-depth
matmuls instead of interleaving lanes.

The vocab head's odd N (92553) is zero-padded to the lane block at
*quantize time* (padding inside the matmul would copy the 190 MB payload
every decode step); ``QuantizedWeight.n_out`` records the true width and
``quantized_dot`` slices the result.

Under a multi-device sharding context the jnp dequant path is used (a
Pallas custom call is not auto-partitioned by pjit); the kernel engages on
single-device serving — exactly where the bandwidth win lives.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import register_pytree_with_keys_class

LANE = 128


@register_pytree_with_keys_class
class QuantizedWeight:
    """Pytree: children (q int8 (..., D, Npad), scale f32 (..., 1, Npad));
    static aux ``n_out`` = true output width (Npad - n_out zero columns).

    Layer-stacked weights carry a leading L axis on both children, so the
    usual ``lax.scan`` over ``params['layers']`` slices them together.
    """

    def __init__(self, q, scale, n_out: int):
        self.q = q
        self.scale = scale
        self.n_out = int(n_out)

    def tree_flatten_with_keys(self):
        return ((("q", self.q), ("scale", self.scale)), self.n_out)

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        return cls(q, scale, aux)

    def __repr__(self):
        qs = getattr(self.q, "shape", None)
        return f"QuantizedWeight(q={qs}, n_out={self.n_out})"


def quantize_weight(w: jnp.ndarray, pad_to: int = LANE) -> QuantizedWeight:
    """Per-output-channel symmetric int8 over the contracted (-2) axis."""
    n = w.shape[-1]
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    pad = (-n) % pad_to
    if pad:
        widths = [(0, 0)] * (w.ndim - 1) + [(0, pad)]
        q = jnp.pad(q, widths)
        scale = jnp.pad(scale, widths, constant_values=1.0)
    return QuantizedWeight(q, scale, n)


@register_pytree_with_keys_class
class Int4Weight:
    """Pytree: children (p int8 (..., D/2, Npad) packed nibbles, scale f32
    (..., G, Npad)); static aux ``(n_out, group_size)``. Byte ``p[d]``
    packs row ``d`` (low nibble) and row ``d + D/2`` (high nibble) of the
    original (D, Npad) int4 matrix; ``G = D / group_size`` row-groups each
    carry one symmetric scale per output channel.

    Layer-stacked weights carry a leading L axis on both children (same
    contract as ``QuantizedWeight``).
    """

    def __init__(self, p, scale, n_out: int, group_size: int):
        self.p = p
        self.scale = scale
        self.n_out = int(n_out)
        self.group_size = int(group_size)

    def tree_flatten_with_keys(self):
        return ((("p", self.p), ("scale", self.scale)),
                (self.n_out, self.group_size))

    @classmethod
    def tree_unflatten(cls, aux, children):
        p, scale = children
        return cls(p, scale, aux[0], aux[1])

    def __repr__(self):
        ps = getattr(self.p, "shape", None)
        return (f"Int4Weight(p={ps}, n_out={self.n_out}, "
                f"g={self.group_size})")


def quantize_weight_int4(w: jnp.ndarray, group_size: int = 128,
                         pad_to: int = LANE) -> Int4Weight:
    """Symmetric int4 over ``group_size``-row groups of the contracted (-2)
    axis, packed two rows per byte (rows ``d`` and ``d + D/2``).

    ``group_size`` is shrunk to ``gcd(group_size, D/2)`` when it does not
    divide the half-depth (small debug models); production dims (2048/8192)
    keep the requested 128."""
    D, n = w.shape[-2], w.shape[-1]
    if D % 2:
        raise ValueError(f"int4 packing needs an even contracted dim, got "
                         f"D={D}")
    group_size = math.gcd(int(group_size), D // 2)
    lead = w.shape[:-2]
    wf = w.astype(jnp.float32).reshape(*lead, D // group_size, group_size, n)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    q = q.reshape(*lead, D, n)
    scale = scale.reshape(*lead, D // group_size, n)
    lo, hi = q[..., : D // 2, :], q[..., D // 2:, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    pad = (-n) % pad_to
    if pad:
        widths = [(0, 0)] * (w.ndim - 1) + [(0, pad)]
        packed = jnp.pad(packed, widths)
        scale = jnp.pad(scale, widths, constant_values=1.0)
    return Int4Weight(packed, scale, n, group_size)


def _unpack_nibbles(b):
    """(..., D/2, bn) packed int8 -> (lo, hi) int32 in [-7, 7]."""
    b32 = b.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(b32, jnp.int32(28)), jnp.int32(28))
    hi = jax.lax.shift_right_arithmetic(b32, jnp.int32(4))
    return lo, hi


def _dequant_int4_half(qhalf, shalf, gs: int):
    """(D2, bn) int32 nibbles + (G2, bn) f32 group scales -> (D2, bn) bf16."""
    D2, bn = qhalf.shape
    deq = qhalf.astype(jnp.float32).reshape(D2 // gs, gs, bn) \
        * shalf[:, None, :]
    return deq.reshape(D2, bn).astype(jnp.bfloat16)


_QUANT_KERNEL_NAMES = ("wqkv_kernel", "wo_kernel", "w1_kernel", "w3_kernel",
                       "w2_kernel")


def quantize_llm_params(llm: dict, bits: int = 8,
                        group_size: int = 128) -> dict:
    """Quantize an LLM param dict's matmul weights to int8 or int4 (new
    dict; norms, biases and the embedding gather stay in the model dtype).
    Includes the fp32-logits head — at 92k vocab it is ~20% of the 2B
    model's bytes."""
    if bits == 8:
        quant = quantize_weight
    elif bits == 4:
        quant = functools.partial(quantize_weight_int4,
                                  group_size=group_size)
    else:
        raise ValueError(f"bits={bits} (supported: 8, 4)")
    already = (QuantizedWeight, Int4Weight)
    layers = dict(llm["layers"])
    for name in _QUANT_KERNEL_NAMES:
        if name in layers and not isinstance(layers[name], already):
            layers[name] = quant(layers[name])
    out = dict(llm)
    out["layers"] = layers
    if not isinstance(llm["output_kernel"], already):
        out["output_kernel"] = quant(llm["output_kernel"])
    return out


class StackedQuantizedRef:
    """Tracing-time view of ONE layer of a layer-stacked ``QuantizedWeight``.

    The decode scan must not slice a stacked ``(L, D, N)`` int8 payload per
    layer: a Pallas call's operands are materialized, so the dynamic-slice
    becomes a real HBM copy that the dense path never pays (XLA fuses the
    slice into ``jnp.dot``; measured: the sliced int8 scan streams ~355 GB/s
    vs ~457 GB/s for the stacked kernel on v5e). Instead the layer loop keeps
    the stacked array whole and passes ``(weights, layer_index)`` down to the
    matmul, where a scalar-prefetch ``index_map`` selects the layer's blocks
    directly out of HBM — read exactly once, no copy.

    Not a pytree: instances exist only inside a trace (built per scan step),
    never in stored param trees.
    """

    __slots__ = ("qw", "li")

    def __init__(self, qw, li):
        payload = qw.p if isinstance(qw, Int4Weight) else qw.q
        assert payload.ndim == 3, "expects a layer-stacked (L, D, N) weight"
        self.qw = qw
        self.li = li


def split_stacked_quantized(layers: dict):
    """Split layer-stacked ``QuantizedWeight``/``Int4Weight`` leaves out of
    a layer dict.

    Returns ``(rest, quant)`` where ``rest`` scans normally and ``quant``
    (or None) maps name -> stacked quantized weight for per-layer
    ``StackedQuantizedRef`` views."""
    quant = {n: w for n, w in layers.items()
             if isinstance(w, (QuantizedWeight, Int4Weight))}
    if not quant:
        return layers, None
    rest = {n: w for n, w in layers.items() if n not in quant}
    return rest, quant


def _qdot_kernel(x_ref, q_ref, s_ref, o_ref):
    xb = x_ref[...]
    wb = q_ref[...].astype(jnp.bfloat16)
    acc = jnp.dot(xb.astype(jnp.bfloat16), wb,
                  preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[...]


def _pick_bm(M: int, D: int) -> int:
    budget = max(1, (1 << 20) // (4 * D))  # ~4 MB fp32 x-block
    bm = min(256, budget) // 8 * 8
    return max(8, min(bm if bm else 8, -(-M // 8) * 8))


def _pick_bn(D: int, Npad: int) -> int:
    budget = max(LANE, (4 << 20) // D)     # ~4 MB int8 w-block
    best = LANE
    for mult in range(1, Npad // LANE + 1):
        bn = mult * LANE
        if bn > budget:
            break
        if Npad % bn == 0:
            best = bn
    return best


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _qdot_2d(x, q, scale, n_out: int, interpret: bool):
    M, D = x.shape
    Npad = q.shape[-1]
    bm, bn = _pick_bm(M, D), _pick_bn(D, Npad)
    pad_m = (-M) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    out = pl.pallas_call(
        _qdot_kernel,
        grid=((M + pad_m) // bm, Npad // bn),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0)),
            pl.BlockSpec((D, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M + pad_m, Npad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=32 * 1024 * 1024),
    )(x, q, scale)
    return out[:M, :n_out]


def _qdot_stacked_kernel(li_ref, x_ref, q_ref, s_ref, o_ref):
    del li_ref  # consumed by the index_maps
    acc = jnp.dot(x_ref[...].astype(jnp.bfloat16),
                  q_ref[0].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    o_ref[...] = acc * s_ref[0]


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _qdot_2d_stacked(x, q, scale, li, n_out: int, interpret: bool):
    """``dot(x, dequant(q[li]))`` over a layer-stacked ``(L, D, Npad)`` int8
    payload. The layer index rides scalar prefetch and the ``index_map``
    gathers the layer's blocks straight from the stacked HBM array — unlike
    ``dynamic_slice`` + ``_qdot_2d``, nothing is copied first."""
    M, D = x.shape
    Npad = q.shape[-1]
    bm, bn = _pick_bm(M, D), _pick_bn(D, Npad)
    pad_m = (-M) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    out = pl.pallas_call(
        _qdot_stacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=((M + pad_m) // bm, Npad // bn),
            in_specs=[
                pl.BlockSpec((bm, D), lambda i, j, li: (i, 0)),
                pl.BlockSpec((1, D, bn), lambda i, j, li: (li[0], 0, j)),
                pl.BlockSpec((1, 1, bn), lambda i, j, li: (li[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, li: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((M + pad_m, Npad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(jnp.reshape(li, (1,)).astype(jnp.int32), x, q, scale)
    return out[:M, :n_out]


def quantized_dot_stacked(x: jnp.ndarray, ref: StackedQuantizedRef,
                          out_dtype=None) -> jnp.ndarray:
    """Layer-indexed ``quantized_dot`` over a stacked weight (see
    ``StackedQuantizedRef``). Same numerics as ``quantized_dot`` (bf16 dot,
    fp32 accum, scale after the contraction)."""
    w, li = ref.qw, ref.li
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    D = x.shape[-1]
    from v2pe_tpu.parallel import context as pctx

    if isinstance(w, Int4Weight):
        if pctx.current() is not None:
            p = jax.lax.dynamic_index_in_dim(w.p, li, 0, keepdims=False)
            s = jax.lax.dynamic_index_in_dim(w.scale, li, 0, keepdims=False)
            deq = _dequant_int4_jnp(Int4Weight(p, s, w.n_out, w.group_size))
            out = jnp.dot(x.reshape(-1, D).astype(jnp.bfloat16), deq,
                          preferred_element_type=jnp.float32)[..., :w.n_out]
        else:
            interpret = jax.default_backend() != "tpu"
            out = _q4dot_2d_stacked(x.reshape(-1, D), w.p, w.scale, li,
                                    w.n_out, w.group_size, interpret)
    elif pctx.current() is not None:
        # pjit-partitionable fallback — identical to today's scan-sliced
        # behavior (the slice is what pjit can partition)
        q = jax.lax.dynamic_index_in_dim(w.q, li, 0, keepdims=False)
        s = jax.lax.dynamic_index_in_dim(w.scale, li, 0, keepdims=False)
        deq = jnp.dot(x.reshape(-1, D).astype(jnp.bfloat16),
                      q.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * s
        out = deq[..., :w.n_out]
    else:
        interpret = jax.default_backend() != "tpu"
        out = _qdot_2d_stacked(x.reshape(-1, D), w.q, w.scale, li,
                               w.n_out, interpret)
    return out.reshape(*lead, w.n_out).astype(out_dtype)


def _pick_bn4(D2: int, Npad: int) -> int:
    """bn for the int4 kernels: the unpack/dequant intermediates are f32
    over the (D2, bn) payload block, so the block budget is tighter than
    the int8 kernel's (~1 MB payload -> ~20 MB peak VMEM with the two
    int32/f32/bf16 half-matrices)."""
    budget = max(LANE, (1 << 20) // D2)
    best = LANE
    for mult in range(1, Npad // LANE + 1):
        bn = mult * LANE
        if bn > budget:
            break
        if Npad % bn == 0:
            best = bn
    return best


def _q4dot_body(xb, pb, sb, gs: int):
    """Shared int4 block math: unpack -> per-group dequant -> two
    half-depth bf16 matmuls with fp32 accumulation."""
    lo, hi = _unpack_nibbles(pb)            # (D2, bn) int32 each
    G2 = sb.shape[0] // 2
    deq_lo = _dequant_int4_half(lo, sb[:G2], gs)
    deq_hi = _dequant_int4_half(hi, sb[G2:], gs)
    D2 = lo.shape[0]
    acc = jnp.dot(xb[:, :D2], deq_lo, preferred_element_type=jnp.float32)
    return acc + jnp.dot(xb[:, D2:], deq_hi,
                         preferred_element_type=jnp.float32)


def _q4dot_kernel(x_ref, p_ref, s_ref, o_ref, *, gs: int):
    o_ref[...] = _q4dot_body(x_ref[...].astype(jnp.bfloat16), p_ref[...],
                             s_ref[...], gs)


@functools.partial(jax.jit, static_argnames=("n_out", "gs", "interpret"))
def _q4dot_2d(x, p, scale, n_out: int, gs: int, interpret: bool):
    M, D = x.shape
    D2, Npad = p.shape
    G = scale.shape[0]
    bm, bn = _pick_bm(M, D), _pick_bn4(D2, Npad)
    pad_m = (-M) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_q4dot_kernel, gs=gs),
        grid=((M + pad_m) // bm, Npad // bn),
        in_specs=[
            pl.BlockSpec((bm, D), lambda i, j: (i, 0)),
            pl.BlockSpec((D2, bn), lambda i, j: (0, j)),
            pl.BlockSpec((G, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M + pad_m, Npad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, p, scale)
    return out[:M, :n_out]


def _q4dot_stacked_kernel(li_ref, x_ref, p_ref, s_ref, o_ref, *, gs: int):
    del li_ref  # consumed by the index_maps
    o_ref[...] = _q4dot_body(x_ref[...].astype(jnp.bfloat16), p_ref[0],
                             s_ref[0], gs)


@functools.partial(jax.jit, static_argnames=("n_out", "gs", "interpret"))
def _q4dot_2d_stacked(x, p, scale, li, n_out: int, gs: int,
                      interpret: bool):
    """Layer-indexed int4 dot over a stacked (L, D/2, Npad) payload — the
    same scalar-prefetch no-copy layer select as ``_qdot_2d_stacked``."""
    M, D = x.shape
    D2, Npad = p.shape[-2], p.shape[-1]
    G = scale.shape[-2]
    bm, bn = _pick_bm(M, D), _pick_bn4(D2, Npad)
    pad_m = (-M) % bm
    if pad_m:
        x = jnp.pad(x, ((0, pad_m), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_q4dot_stacked_kernel, gs=gs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=((M + pad_m) // bm, Npad // bn),
            in_specs=[
                pl.BlockSpec((bm, D), lambda i, j, li: (i, 0)),
                pl.BlockSpec((1, D2, bn), lambda i, j, li: (li[0], 0, j)),
                pl.BlockSpec((1, G, bn), lambda i, j, li: (li[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, li: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((M + pad_m, Npad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(jnp.reshape(li, (1,)).astype(jnp.int32), x, p, scale)
    return out[:M, :n_out]


def _dequant_int4_jnp(w: Int4Weight) -> jnp.ndarray:
    """Full bf16 dequantization (mesh fallback / reference math for the
    kernels): unpack both nibble halves, apply group scales, reassemble
    the (…, D, Npad) matrix."""
    lo, hi = _unpack_nibbles(w.p)
    q = jnp.concatenate([lo, hi], axis=-2)
    lead = q.shape[:-2]
    D, Npad = q.shape[-2], q.shape[-1]
    gs = w.group_size
    deq = (q.astype(jnp.float32).reshape(*lead, D // gs, gs, Npad)
           * w.scale[..., :, None, :])
    return deq.reshape(*lead, D, Npad).astype(jnp.bfloat16)


def quantized_dot(x: jnp.ndarray, w: QuantizedWeight,
                  out_dtype=None) -> jnp.ndarray:
    """``dot(x, dequant(w))`` with fp32 accumulation; the int8/int4 payload
    never materializes dequantized in HBM on the kernel path. Mirrors
    ``internlm2._dot``'s contract (fp32 accum, cast to ``out_dtype`` or
    ``x.dtype``)."""
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    D = x.shape[-1]
    from v2pe_tpu.parallel import context as pctx

    if isinstance(w, Int4Weight):
        assert w.p.ndim == 2, "pass a per-layer (D/2, N) Int4Weight"
        if pctx.current() is not None:
            out = jnp.dot(x.reshape(-1, D).astype(jnp.bfloat16),
                          _dequant_int4_jnp(w),
                          preferred_element_type=jnp.float32)[..., :w.n_out]
        else:
            out = _q4dot_2d(x.reshape(-1, D), w.p, w.scale, w.n_out,
                            w.group_size, jax.default_backend() != "tpu")
        return out.reshape(*lead, w.n_out).astype(out_dtype)

    assert w.q.ndim == 2, "pass a per-layer (D, N) QuantizedWeight"
    if pctx.current() is not None:
        # pjit-partitionable fallback: a Pallas custom call is not
        # auto-partitioned under a mesh; same math (bf16 dot, fp32 accum,
        # scale after the contraction) so it is numerically aligned with
        # the kernel path
        deq = jnp.dot(x.reshape(-1, D).astype(jnp.bfloat16),
                      w.q.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) * w.scale
        out = deq[..., :w.n_out]
    else:
        interpret = jax.default_backend() != "tpu"
        out = _qdot_2d(x.reshape(-1, D), w.q, w.scale, w.n_out, interpret)
    return out.reshape(*lead, w.n_out).astype(out_dtype)
