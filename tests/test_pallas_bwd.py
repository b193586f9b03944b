"""Pallas backward kernels (interpret mode on CPU) vs jnp analytic backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.ops.attention import flash_attention

from .test_attention import _inputs


@pytest.mark.parametrize("causal", [True, False])
def test_pallas_bwd_matches_jnp_bwd(causal):
    q, k, v, seg = _inputs(B=1, Sq=128, Sk=128, Hq=4, Hkv=2, D=32)
    valid = (seg != 0)[..., None, None]

    def loss(q, k, v, impl):
        o = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                            causal=causal, impl=impl, block_q=64, block_k=64)
        return jnp.sum(jnp.where(valid, jnp.sin(o), 0.0))

    g_p = jax.grad(lambda *a: loss(*a, "pallas"), argnums=(0, 1, 2))(q, k, v)
    g_j = jax.grad(lambda *a: loss(*a, "jnp"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_p, g_j, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_pallas_bwd_gqa_positions():
    """GQA group folding + explicit positions (unordered path)."""
    q, k, v, _ = _inputs(B=1, Sq=96, Sk=96, Hq=8, Hkv=2, D=32, packed=False)
    pos = jnp.broadcast_to(jnp.arange(96, dtype=jnp.int32), (1, 96))

    def loss(q, k, v, impl):
        o = flash_attention(q, k, v, causal=True, q_positions=pos,
                            kv_positions=pos, impl=impl,
                            block_q=32, block_k=32)
        return jnp.sum(o * o)

    g_p = jax.grad(lambda *a: loss(*a, "pallas"), argnums=(0, 1, 2))(q, k, v)
    g_j = jax.grad(lambda *a: loss(*a, "jnp"), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_p, g_j, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
