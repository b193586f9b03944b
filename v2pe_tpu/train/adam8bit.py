"""Block-wise 8-bit Adam state (optax transformation).

TPU-native replacement for the reference's optional bitsandbytes
``Adam8bit`` (``internvl/train/trainer_monkey_patch.py:147-159``): the first
and second moments are stored as int8 with one float32 scale per block of
``block_size`` values (bitsandbytes' block-wise dynamic quantization
scheme), cutting optimizer-state HBM from 8 bytes/param to ~2.03. Moments
are dequantized, updated in fp32, and requantized each step — the update
math is plain Adam, only the STORAGE is quantized, so the transformation is
a drop-in for ``optax.scale_by_adam`` in the chain built by
``train/optimizer.py`` (``--use_8bit_optimizer``).

Quantization: ``m`` uses a symmetric linear code per block (int8 in
[-127, 127], scale = blockwise absmax / 127). ``v`` (non-negative, with a
huge within-block dynamic range — g^2 spans the square of the gradient
range) uses a SQRT code: ``code = round(127*sqrt(v/absmax))``, dequantized
by squaring. The quadratic resolution near zero keeps small second moments
from underflowing to 0, which would explode ``m/(sqrt(v)+eps)`` by 1/eps —
the role bitsandbytes' non-linear "dynamic" 8-bit map plays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _Q(NamedTuple):
    code: jnp.ndarray    # int8, original shape
    scale: jnp.ndarray   # float32, (num_blocks,)


def _quantize(x: jnp.ndarray, block: int) -> _Q:
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    scale = jnp.max(jnp.abs(blocks), axis=1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    code = jnp.clip(jnp.round(blocks / safe[:, None]), -127, 127
                    ).astype(jnp.int8)
    return _Q(code.reshape(-1)[:n].reshape(x.shape), scale)


def _dequantize(q: _Q, block: int) -> jnp.ndarray:
    flat = q.code.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    pad = (-n) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    out = flat.reshape(-1, block) * q.scale[:, None]
    return out.reshape(-1)[:n].reshape(q.code.shape)


def _quantize_sqrt(x: jnp.ndarray, block: int) -> _Q:
    """Non-negative values on a sqrt code: resolution ~ x near 0."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(blocks, axis=1)
    safe = jnp.where(absmax > 0, absmax, 1.0)
    code = jnp.clip(jnp.round(127.0 * jnp.sqrt(blocks / safe[:, None])),
                    0, 127).astype(jnp.int8)
    return _Q(code.reshape(-1)[:n].reshape(x.shape), absmax / (127.0 ** 2))


def _dequantize_sqrt(q: _Q, block: int) -> jnp.ndarray:
    flat = q.code.astype(jnp.float32).reshape(-1)
    n = flat.shape[0]
    pad = (-n) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    out = (flat ** 2).reshape(-1, block) * q.scale[:, None]
    return out.reshape(-1)[:n].reshape(q.code.shape)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: object    # pytree of _Q
    nu: object


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                      block_size: int = 256,
                      offload: bool = False) -> optax.GradientTransformation:
    """``offload=True``: the int8 moment tensors live in HOST memory
    (jax.memory.Space.Host) and are staged through HBM only during the
    update, behind an optimization_barrier on the gradients — the
    TPU-native ZeRO-Offload (DeepSpeed's CPU optimizer-state offload).
    The goal is peak separation: the backward's peak (params + grads +
    activations) and the update's peak (params + grads + staged moments)
    each fit where their union does not.

    EXPERIMENTAL on current XLA: the in-jit host transfers are at the
    mercy of the latency-hiding scheduler's buffer assignment — the 32k
    single-chip recipe step measured anywhere from 6 MB to 3.7 GB over
    HBM across structurally-minor program variations, and a per-leaf
    barrier-chained variant (intended to bound staging at one leaf)
    measured strictly worse (+2.3 GB even at 8k). Numerics are exactly
    the resident int8 Adam (tests/test_train_step.py); the measured
    memory account lives in docs/perf_analysis.md (training section)."""
    def init_fn(params):
        zq = jax.tree.map(
            lambda p: _quantize(jnp.zeros(p.shape, jnp.float32), block_size),
            params)
        state = ScaleByAdam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=zq,
            nu=jax.tree.map(
                lambda p: _quantize_sqrt(jnp.zeros(p.shape, jnp.float32),
                                         block_size), params))
        if offload:
            state = ScaleByAdam8bitState(
                count=state.count,
                mu=_put_tree(state.mu, jax.memory.Space.Host),
                nu=_put_tree(state.nu, jax.memory.Space.Host))
        return state

    # ~16 MB of f32 per live chunk: dequantizing a whole stacked-layer
    # moment tensor at once materializes param-sized f32 temps (1.5 GB per
    # moment for the 2B model's ffn stacks) and XLA schedules several
    # leaves concurrently — measured 9.1 GB of optimizer temps, an HBM
    # OOM for the single-chip 8k training step. Chunk rows align with
    # quantization blocks, so results are bitwise identical.
    CHUNK_ELEMS = 4 * 2 ** 20

    def update_fn(updates, state, params=None):
        count = state.count + 1
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def upd(g, mq, nq):
            n_el = g.size
            pad = (-n_el) % block_size
            nb = (n_el + pad) // block_size

            def pad2(x):
                f = x.reshape(-1)
                return (jnp.pad(f, (0, pad)) if pad else f).reshape(
                    nb, block_size)

            rows = min(nb, max(1, CHUNK_ELEMS // block_size))
            C = -(-nb // rows)
            rpad = C * rows - nb

            def chunked(x):
                if rpad:
                    w = [(0, rpad)] + [(0, 0)] * (x.ndim - 1)
                    x = jnp.pad(x, w)
                return x.reshape((C, rows) + x.shape[1:])

            def chunk(args):
                gc_, mc, ms, nc, ns = args
                gf = gc_.astype(jnp.float32)
                m = mc.astype(jnp.float32) * ms[:, None]
                v = (nc.astype(jnp.float32) ** 2) * ns[:, None]
                m = b1 * m + (1 - b1) * gf
                v = b2 * v + (1 - b2) * gf * gf
                out = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                msc = jnp.max(jnp.abs(m), axis=1) / 127.0
                msafe = jnp.where(msc > 0, msc, 1.0)
                mcode = jnp.clip(jnp.round(m / msafe[:, None]), -127, 127
                                 ).astype(jnp.int8)
                vmax = jnp.max(v, axis=1)
                vsafe = jnp.where(vmax > 0, vmax, 1.0)
                vcode = jnp.clip(
                    jnp.round(127.0 * jnp.sqrt(v / vsafe[:, None])),
                    0, 127).astype(jnp.int8)
                return out, mcode, msc, vcode, vmax / (127.0 ** 2)

            out, mcode, msc, vcode, vsc = jax.lax.map(
                chunk, (chunked(pad2(g)), chunked(pad2(mq.code)),
                        chunked(mq.scale), chunked(pad2(nq.code)),
                        chunked(nq.scale)))
            out = out.reshape(-1)[:n_el].reshape(g.shape)
            shape_code = lambda c: c.reshape(-1)[:n_el].reshape(g.shape)
            shape_sc = lambda s: s.reshape(-1)[:nb]
            return (out,
                    _Q(shape_code(mcode), shape_sc(msc)),
                    _Q(shape_code(vcode), shape_sc(vsc)))

        flat_u, tdef = jax.tree.flatten(updates)
        flat_m = tdef.flatten_up_to(state.mu)
        flat_n = tdef.flatten_up_to(state.nu)
        if not offload:
            outs = [upd(g, m, n) for g, m, n in zip(flat_u, flat_m, flat_n)]
        else:
            # tree-level host staging behind ONE grads barrier: fetch the
            # moment codes only after every grad exists (the barrier stops
            # the latency-hiding scheduler from prefetching them into the
            # backward's activation peak), update, write back. A per-leaf
            # barrier-chained variant was measured STRICTLY WORSE on this
            # XLA build (+2.3 GB even at 8k — the chain forced extra
            # materialization); see docs/perf_analysis.md for the full
            # measured account, including the remaining scheduler
            # bistability at 32k.
            bar = jax.lax.optimization_barrier(tuple(flat_u))
            flat_u = list(bar)
            fetch = lambda q: _Q(
                jax.device_put(q.code, jax.memory.Space.Device),
                jax.device_put(q.scale, jax.memory.Space.Device))
            store = lambda q: _Q(
                jax.device_put(q.code, jax.memory.Space.Host),
                jax.device_put(q.scale, jax.memory.Space.Host))
            outs = []
            for g, m, n in zip(flat_u, flat_m, flat_n):
                out, mq, nq = upd(g, fetch(m), fetch(n))
                outs.append((out, store(mq), store(nq)))
        new_updates = tdef.unflatten([o[0] for o in outs])
        new_mu = tdef.unflatten([o[1] for o in outs])
        new_nu = tdef.unflatten([o[2] for o in outs])
        return new_updates, ScaleByAdam8bitState(count, new_mu, new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _put_tree(tree, space):
    return jax.tree.map(lambda a: jax.device_put(a, space), tree)
