"""Compress-seq hierarchical forward tests."""

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import debug_tiny
from v2pe_tpu.models.compress_seq import (compress_avg,
                                          compress_llm_forward,
                                          init_compress_params)
from v2pe_tpu.models.params import init_llm_params


def test_compress_avg():
    x = jnp.arange(2 * 400 * 4, dtype=jnp.float32).reshape(2, 400, 4)
    out = compress_avg(x, final_size=100)
    assert out.shape == (2, 100, 4)
    np.testing.assert_allclose(out[0, 0], x[0, :4].mean(0), rtol=1e-6)


def test_compress_forward_runs_and_differs_from_gamma_zero():
    cfg = debug_tiny(vocab_size=300).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    cparams = init_compress_params(params)
    B, S, n = 1, 800, 4
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.hidden_size))
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (B, S))

    logits = compress_llm_forward(params, cparams, cfg, embeds, pos, n,
                                  attn_impl="jnp")
    assert logits.shape == (B, S, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()

    # gamma=0 disables fusion -> matches per-chunk-only forward; nonzero
    # gamma must change chunks > 0 but not chunk 0 (exclusive prefix)
    cparams_big = dict(cparams)
    cparams_big["layer_scale"] = jnp.full_like(cparams["layer_scale"], 0.5)
    logits_big = compress_llm_forward(params, cparams_big, cfg, embeds, pos,
                                      n, attn_impl="jnp")
    c = S // n
    np.testing.assert_allclose(np.asarray(logits[:, :c]),
                               np.asarray(logits_big[:, :c]), atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, c:]),
                           np.asarray(logits_big[:, c:]))


def test_compress_gradients_flow():
    cfg = debug_tiny(vocab_size=100).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    cparams = init_compress_params(params)
    embeds = jax.random.normal(jax.random.PRNGKey(1), (1, 400,
                                                       cfg.hidden_size))
    pos = jnp.broadcast_to(jnp.arange(400, dtype=jnp.float32), (1, 400))

    def loss(cp):
        lg = compress_llm_forward(params, cp, cfg, embeds, pos, 4,
                                  attn_impl="jnp")
        return jnp.sum(lg ** 2) * 1e-6

    g = jax.grad(loss)(cparams)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
