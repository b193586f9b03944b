"""Int8 weight-only quantized linear layers (decode bandwidth optimization).

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


_QUANT_KERNEL_NAMES = ("wqkv_kernel", "wo_kernel", "w1_kernel", "w3_kernel",
                       "w2_kernel")


def quantize_llm_params(llm: dict) -> dict:
    """Quantize an LLM param dict's matmul weights to int8 (new dict; norms,
    biases and the embedding gather stay in the model dtype). Includes the
    fp32-logits head — at 92k vocab it is ~20% of the 2B model's bytes."""
    layers = dict(llm["layers"])
    for name in _QUANT_KERNEL_NAMES:
        if name in layers and not isinstance(layers[name], QuantizedWeight):
            layers[name] = quantize_weight(layers[name])
    out = dict(llm)
    out["layers"] = layers
    if not isinstance(llm["output_kernel"], QuantizedWeight):
        out["output_kernel"] = quantize_weight(llm["output_kernel"])
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

    def __init__(self, qw: QuantizedWeight, li):
        assert qw.q.ndim == 3, "expects a layer-stacked (L, D, N) weight"
        self.qw = qw
        self.li = li


def split_stacked_quantized(layers: dict):
    """Split layer-stacked ``QuantizedWeight`` leaves out of a layer dict.

    Returns ``(rest, quant)`` where ``rest`` scans normally and ``quant``
    (or None) maps name -> stacked QuantizedWeight for per-layer
    ``StackedQuantizedRef`` views."""
    quant = {n: w for n, w in layers.items()
             if isinstance(w, QuantizedWeight)}
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

    if pctx.current() is not None:
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


def quantized_dot(x: jnp.ndarray, w: QuantizedWeight,
                  out_dtype=None) -> jnp.ndarray:
    """``dot(x, dequant(w))`` with fp32 accumulation; the int8 payload never
    materializes dequantized in HBM on the kernel path. Mirrors
    ``internlm2._dot``'s contract (fp32 accum, cast to ``out_dtype`` or
    ``x.dtype``)."""
    assert w.q.ndim == 2, "pass a per-layer (D, N) QuantizedWeight"
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    D = x.shape[-1]
    from v2pe_tpu.parallel import context as pctx

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
