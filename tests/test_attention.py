"""Attention kernel tests: jnp chunked flash and Pallas (interpret mode on
CPU) against the O(S^2) reference; gradients against autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.ops.attention import flash_attention
from v2pe_tpu.ops.attention_ref import attention_reference


def _inputs(B=2, Sq=192, Sk=192, Hq=4, Hkv=2, D=32, seed=0, packed=True):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv, ks = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, Sq, Hq, D), jnp.float32)
    k = jax.random.normal(kk, (B, Sk, Hkv, D), jnp.float32)
    v = jax.random.normal(kv, (B, Sk, Hkv, D), jnp.float32)
    if packed:
        # 3 segments + trailing padding, same boundaries for q and kv
        assert Sq == Sk
        bounds = np.array([0, Sq // 3, Sq // 2, Sq - 17, Sq])
        seg = np.zeros((B, Sq), np.int32)
        for i in range(3):
            seg[:, bounds[i]:bounds[i + 1]] = i + 1
        seg = jnp.asarray(seg)
    else:
        seg = jnp.ones((B, Sq), jnp.int32)
    return q, k, v, seg


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_flash_matches_reference_packed(causal, impl):
    q, k, v, seg = _inputs()
    ref = attention_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                              causal=causal)
    got = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                          causal=causal, impl=impl, block_q=64, block_k=64)
    # padding rows: the reference softmaxes a fully -inf row into garbage,
    # the flash kernels emit exact zeros — compare valid rows only.
    valid = np.asarray(seg) != 0
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(ref)[valid],
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_flash_gqa_no_segments(impl):
    q, k, v, _ = _inputs(Hq=8, Hkv=2, packed=False)
    ref = attention_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, impl=impl,
                          block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_uneven_blocks():
    """Sequence lengths not divisible by block sizes (padding path)."""
    q, k, v, seg = _inputs(Sq=150, Sk=150)
    ref = attention_reference(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                              causal=True)
    valid = np.asarray(seg) != 0
    for impl in ("jnp", "pallas"):
        got = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                              causal=True, impl=impl, block_q=64, block_k=64)
        np.testing.assert_allclose(np.asarray(got)[valid],
                                   np.asarray(ref)[valid],
                                   rtol=2e-5, atol=2e-5)


def test_flash_cross_attention_shapes():
    """Sq != Sk (decode/prefill asymmetry) with explicit positions."""
    B, Sq, Sk = 1, 64, 192
    q, k, v, _ = _inputs(B=B, Sq=Sk, Sk=Sk, packed=False)
    q = q[:, :Sq]
    # queries sit at the END of the kv sequence (decode continuation)
    q_pos = jnp.broadcast_to(jnp.arange(Sk - Sq, Sk, dtype=jnp.int32), (B, Sq))
    ref = attention_reference(q, k, v, causal=True, q_offset=Sk - Sq)
    got = flash_attention(q, k, v, causal=True, q_positions=q_pos,
                          impl="jnp", block_q=32, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    got_p = flash_attention(q, k, v, causal=True, q_positions=q_pos,
                            impl="pallas", block_q=32, block_k=64)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("impl", ["jnp"])
def test_flash_gradients_match_reference(impl):
    q, k, v, seg = _inputs(B=1, Sq=96, Sk=96, Hq=4, Hkv=2, D=16)

    valid = (seg != 0)[..., None, None]  # ref emits garbage at padding rows

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                            causal=True, impl=impl, block_q=32, block_k=32)
        return jnp.sum(jnp.where(valid, o, 0.0) ** 2)

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, q_segment_ids=seg,
                                kv_segment_ids=seg, causal=True)
        return jnp.sum(jnp.where(valid, o, 0.0) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


def test_flash_gradients_pallas_fwd_jnp_bwd():
    """custom_vjp pairs the pallas forward (interpret here) with the analytic
    jnp backward via the saved lse."""
    q, k, v, seg = _inputs(B=1, Sq=64, Sk=64, Hq=2, Hkv=1, D=16)

    def loss(q, k, v, impl):
        o = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                            causal=True, impl=impl, block_q=32, block_k=32)
        return jnp.sum(jnp.sin(o))

    g1 = jax.grad(lambda *a: loss(*a, "pallas"), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: loss(*a, "jnp"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_padding_rows_produce_finite_output():
    q, k, v, _ = _inputs(B=1, Sq=64, Sk=64, packed=False)
    seg = jnp.zeros((1, 64), jnp.int32).at[:, :40].set(1)  # 24 pad tokens
    for impl in ("jnp", "pallas"):
        out = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                              causal=True, impl=impl, block_q=32, block_k=32)
        assert bool(jnp.all(jnp.isfinite(out)))
        # fully-masked query rows are exactly zero
        np.testing.assert_array_equal(np.asarray(out[:, 40:]), 0.0)
