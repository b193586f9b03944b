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


class TestFusedRope:
    """rope_positions: rotary fused into the attention call must equal
    pre-rotating q/k with apply_rotary (fwd and bwd, jnp + pallas-interpret),
    including fractional V2PE ids."""

    def _setup(self, seed=0, B=1, S=256, Hq=4, Hkv=2, D=64):
        import numpy as np

        from v2pe_tpu.ops.rope import apply_rotary, compute_rope_cos_sin

        rng = np.random.RandomState(seed)
        q = jnp.asarray(rng.randn(B, S, Hq, D), jnp.float32)
        k = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
        v = jnp.asarray(rng.randn(B, S, Hkv, D), jnp.float32)
        # fractional V2PE-style ids
        ids = jnp.asarray(
            np.cumsum(rng.choice([0.25, 1.0], size=(B, S))), jnp.float32
        ).reshape(B, S)
        theta = 10000.0
        cos, sin = compute_rope_cos_sin(ids, D, theta)
        q_rot = apply_rotary(q, cos, sin)
        k_rot = apply_rotary(k, cos, sin)
        return q, k, v, ids, theta, q_rot, k_rot

    @pytest.mark.parametrize("impl", ["jnp", "pallas"])
    def test_forward_matches_prerotated(self, impl):
        import numpy as np

        q, k, v, ids, theta, q_rot, k_rot = self._setup()
        ref = flash_attention(q_rot, k_rot, v, causal=True, impl=impl,
                              block_q=128, block_k=128)
        got = flash_attention(q, k, v, causal=True, impl=impl,
                              block_q=128, block_k=128,
                              rope_positions=(ids, ids, theta))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # q-only fusion (the production path: k arrives pre-rotated)
        got_q = flash_attention(q, k_rot, v, causal=True, impl=impl,
                                block_q=128, block_k=128,
                                rope_positions=(ids, None, theta))
        np.testing.assert_allclose(np.asarray(got_q), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("impl", ["jnp", "pallas"])
    def test_backward_matches_prerotated(self, impl):
        import numpy as np

        from v2pe_tpu.ops.rope import apply_rotary, compute_rope_cos_sin

        q, k, v, ids, theta, _, _ = self._setup(seed=1)
        D = q.shape[-1]
        cos, sin = compute_rope_cos_sin(ids, D, theta)

        def loss_ref(q, k, v):
            o = flash_attention(apply_rotary(q, cos, sin),
                                apply_rotary(k, cos, sin), v, causal=True,
                                impl=impl, block_q=128, block_k=128)
            return jnp.sum(jnp.sin(o))

        def loss_fused(q, k, v):
            o = flash_attention(q, k, v, causal=True, impl=impl,
                                block_q=128, block_k=128,
                                rope_positions=(ids, ids, theta))
            return jnp.sum(jnp.sin(o))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5, err_msg=name)

    def test_llm_forward_unchanged_by_fusion(self):
        """llm_forward (which now fuses rope on the no-cache path) still
        matches a manual forward with jnp-level rotary."""
        import numpy as np

        from v2pe_tpu.core.config import debug_tiny
        from v2pe_tpu.models.internlm2 import llm_forward
        from v2pe_tpu.models.params import init_llm_params

        cfg = debug_tiny(vocab_size=128).llm
        params = init_llm_params(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 48), 0, 128)
        pos = jnp.asarray(
            np.cumsum(np.random.RandomState(0).choice(
                [0.25, 1.0], size=(1, 48)), axis=1), jnp.float32)
        # fused (no-cache) vs the cache path at full length (jnp rotary)
        full, _ = llm_forward(params, cfg, input_ids=ids, rope_pos_ids=pos,
                              attn_impl="jnp")
        from v2pe_tpu.models.internlm2 import KVCache
        cache = KVCache.zeros(cfg, 1, 48, dtype=jnp.float32)
        via_cache, _ = llm_forward(params, cfg, input_ids=ids,
                                   rope_pos_ids=pos, kv_cache=cache,
                                   attn_impl="jnp")
        np.testing.assert_allclose(np.asarray(full), np.asarray(via_cache),
                                   rtol=2e-4, atol=2e-4)


def test_long_context_chunked_paths_match(monkeypatch):
    """The chunked SwiGLU + chunked qkv projection engage above the
    long-context threshold; shrink the constants so a small model exercises
    them and compare against the unchunked forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from v2pe_tpu.core.config import debug_tiny
    from v2pe_tpu.models import internlm2
    from v2pe_tpu.models.params import init_llm_params

    cfg = debug_tiny(vocab_size=128).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    S = 64
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, 128)
    pos = jnp.arange(S, dtype=jnp.float32)[None]

    ref, _ = internlm2.llm_forward(params, cfg, input_ids=ids,
                                   rope_pos_ids=pos, attn_impl="jnp")
    monkeypatch.setattr(internlm2, "MLP_CHUNK_THRESHOLD", 32)
    monkeypatch.setattr(internlm2, "MLP_CHUNK", 16)
    got, _ = internlm2.llm_forward(params, cfg, input_ids=ids,
                                   rope_pos_ids=pos, attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
