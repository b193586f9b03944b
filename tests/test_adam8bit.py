"""Block-wise 8-bit Adam: state is int8, quantization round-trips within
block resolution, and a short training run tracks fp32 Adam closely."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from v2pe_tpu.train.adam8bit import (_dequantize, _quantize,
                                     scale_by_adam8bit)
from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer


def test_quantize_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 130).astype(np.float32))  # non-multiple
    q = _quantize(x, 64)
    assert q.code.dtype == jnp.int8 and q.code.shape == x.shape
    y = _dequantize(q, 64)
    # error bounded by half a quantization step per block
    step = np.abs(np.asarray(x)).reshape(-1)
    err = np.abs(np.asarray(y) - np.asarray(x))
    assert err.max() <= float(np.abs(np.asarray(x)).max()) / 127.0 + 1e-7
    # zeros stay exactly zero
    z = _quantize(jnp.zeros((10,)), 64)
    np.testing.assert_array_equal(np.asarray(_dequantize(z, 64)), 0.0)


def test_adam8bit_tracks_fp32_adam():
    rng = np.random.RandomState(1)
    params = {"w": jnp.asarray(rng.randn(64, 32).astype(np.float32)),
              "b": jnp.asarray(rng.randn(32).astype(np.float32))}
    x = jnp.asarray(rng.randn(128, 64).astype(np.float32))
    y = jnp.asarray(rng.randn(128, 32).astype(np.float32))

    def loss(p):
        return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)

    def run(tx):
        p = params
        state = tx.init(p)
        for _ in range(20):
            g = jax.grad(loss)(p)
            u, state = tx.update(g, state, p)
            p = optax.apply_updates(p, jax.tree.map(lambda v: -1e-2 * v, u))
        return p

    # single-step updates match closely (first step has no accumulated
    # quantization noise beyond one m/v round trip)
    g0 = jax.grad(loss)(params)
    tx8, txf = scale_by_adam8bit(), optax.scale_by_adam()
    u8, _ = tx8.update(g0, tx8.init(params), params)
    uf, _ = txf.update(g0, txf.init(params), params)
    for k in params:
        np.testing.assert_allclose(np.asarray(u8[k]), np.asarray(uf[k]),
                                   rtol=0.05, atol=0.02)

    # over 20 steps the trajectories drift coordinate-wise (chaotic), but
    # optimization quality matches: comparable final loss, bounded updates
    p8 = run(scale_by_adam8bit())
    pf = run(optax.scale_by_adam())
    l8, lf, l0 = float(loss(p8)), float(loss(pf)), float(loss(params))
    assert l8 < l0 * 0.8, (l8, l0)
    assert abs(l8 - lf) < 0.15 * l0, (l8, lf, l0)


def test_build_optimizer_8bit_state_is_int8():
    rng = np.random.RandomState(2)
    params = {"llm": {"tok_embeddings": jnp.asarray(
        rng.randn(100, 16).astype(np.float32))}}
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10,
                     use_8bit_optimizer=True)
    tx = build_optimizer(tc, params)
    state = tx.init(params)
    leaves = jax.tree.leaves(state)
    assert any(getattr(l, "dtype", None) == jnp.int8 for l in leaves), \
        "no int8 moment storage found in optimizer state"
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, state, params)
    assert np.isfinite(np.asarray(jax.tree.leaves(u)[0])).all()
