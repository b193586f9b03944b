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
                      block_size: int = 256) -> optax.GradientTransformation:
    def init_fn(params):
        zq = jax.tree.map(
            lambda p: _quantize(jnp.zeros(p.shape, jnp.float32), block_size),
            params)
        return ScaleByAdam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=zq,
            nu=jax.tree.map(
                lambda p: _quantize_sqrt(jnp.zeros(p.shape, jnp.float32),
                                         block_size), params))

    def update_fn(updates, state, params=None):
        count = state.count + 1

        def upd(g, mq, nq):
            m = _dequantize(mq, block_size)
            n = _dequantize_sqrt(nq, block_size)
            g = g.astype(jnp.float32)
            m = b1 * m + (1 - b1) * g
            n = b2 * n + (1 - b2) * g * g
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            nhat = n / (1 - b2 ** count.astype(jnp.float32))
            out = mhat / (jnp.sqrt(nhat) + eps)
            return out, _quantize(m, block_size), _quantize_sqrt(
                n, block_size)

        flat_u, tdef = jax.tree.flatten(updates)
        flat_m = tdef.flatten_up_to(state.mu)
        flat_n = tdef.flatten_up_to(state.nu)
        outs = [upd(g, m, n) for g, m, n in zip(flat_u, flat_m, flat_n)]
        new_updates = tdef.unflatten([o[0] for o in outs])
        new_mu = tdef.unflatten([o[1] for o in outs])
        new_nu = tdef.unflatten([o[2] for o in outs])
        return new_updates, ScaleByAdam8bitState(count, new_mu, new_nu)

    return optax.GradientTransformation(init_fn, update_fn)
