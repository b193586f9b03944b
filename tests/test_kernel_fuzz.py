"""Randomized kernel-consistency fuzzing: the Pallas kernels (interpret
mode off-TPU) must match the jnp reference implementation over random
shapes, GQA ratios, segment layouts (including all-padding rows and
segment-straddling blocks), position permutations, and block sizes —
the directed tests pin known layouts; this sweeps the space between them.

Mirrors the reference's reliance on flash-attn's own fuzz suite (the
reference trusts upstream flash_attn_varlen_func; our kernels are in-tree
so the fuzzing must be too)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.ops.attention import flash_attention

N_CASES = 8


def _random_case(rng):
    B = int(rng.randint(1, 3))
    Sq = int(rng.choice([64, 96, 128, 192, 256]))
    Hkv = int(rng.choice([1, 2]))
    G = int(rng.choice([1, 2, 4]))
    Hq = Hkv * G
    D = int(rng.choice([16, 32, 64]))
    causal = bool(rng.randint(0, 2))
    bq = int(rng.choice([16, 32, 64]))
    bk = int(rng.choice([16, 32, 64]))

    q = rng.standard_normal((B, Sq, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, Sq, Hkv, D)).astype(np.float32)
    v = rng.standard_normal((B, Sq, Hkv, D)).astype(np.float32)

    # random packing: 1-4 segments + random padding tail; sometimes a row
    # that is ALL padding (empty-row finalize path)
    seg = np.zeros((B, Sq), np.int32)
    for b in range(B):
        if rng.random() < 0.15:
            continue  # all-padding row
        n_seg = int(rng.randint(1, 5))
        cuts = np.sort(rng.choice(np.arange(1, Sq), n_seg - 1,
                                  replace=False)) if n_seg > 1 else []
        bounds = [0, *cuts, int(rng.randint(Sq // 2, Sq + 1))]
        for s_i in range(n_seg):
            lo, hi = bounds[s_i], bounds[s_i + 1]
            if lo < hi:
                seg[b, lo:hi] = s_i + 1
    return q, k, v, jnp.asarray(seg), causal, bq, bk


def _ref(q, k, v, seg, causal):
    """Dense masked softmax reference (pure jnp, no blocking)."""
    B, Sq, Hq, D = q.shape
    Hkv = k.shape[2]
    G = Hq // Hkv
    kf = jnp.repeat(k, G, axis=2)
    vf = jnp.repeat(v, G, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, kf) * (D ** -0.5)
    mask = (seg[:, None, :, None] == seg[:, None, None, :]) \
        & (seg != 0)[:, None, :, None] & (seg != 0)[:, None, None, :]
    if causal:
        idx = jnp.arange(Sq)
        mask &= (idx[None, None, :, None] >= idx[None, None, None, :])
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    # dead (all-masked) rows are undefined-output; callers re-mask by seg
    return jnp.einsum("bhqk,bkhd->bqhd", p, vf)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_flash_pallas_fuzz_forward(seed):
    rng = np.random.RandomState(1000 + seed)
    q, k, v, seg, causal, bq, bk = _random_case(rng)
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          q_segment_ids=seg, kv_segment_ids=seg,
                          causal=causal, impl="pallas",
                          block_q=bq, block_k=bk)
    want = _ref(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), seg, causal)
    live = np.asarray(seg)[..., None, None] != 0
    np.testing.assert_allclose(
        np.where(live, np.asarray(got), 0.0),
        np.where(live, np.asarray(want), 0.0), rtol=2e-5, atol=2e-5,
        err_msg=f"case seed={seed} causal={causal} "
                f"shape={q.shape}x{k.shape} blocks=({bq},{bk})")


@pytest.mark.parametrize("precision", ["bf16qk", "bf16all", "bf16exp"])
def test_flash_pallas_precision_modes(precision):
    """The flag-gated bf16-matmul forward variants (V2PE_FLASH_PRECISION /
    flash_attention_fwd_pallas(precision=...)) must stay within one bf16
    ulp of the fp32 parity kernel on bf16 inputs, with and without the
    fused rope (scripts/flash_precision_expt.py measures the speed side)."""
    from v2pe_tpu.ops.flash_pallas import flash_attention_fwd_pallas

    rng = np.random.RandomState(0)
    B, S, Hq, Hkv, D = 1, 256, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.bfloat16)
    seg = jnp.ones((B, S), jnp.int32)
    pos = jnp.arange(S, dtype=jnp.int32)[None]
    for theta in (0.0, 10000.0):
        rope = pos.astype(jnp.float32) if theta else None
        outs = {}
        for prec in ("fp32", precision):
            o, _ = flash_attention_fwd_pallas(
                q, k, v, seg, seg, pos, pos, causal=True, scale=D ** -0.5,
                block_q=128, block_k=128, interpret=True,
                rope_q=rope, rope_k=rope, rope_theta=theta, precision=prec)
            outs[prec] = np.asarray(o, np.float32)
        dev = np.abs(outs[precision] - outs["fp32"]).max()
        assert dev < 0.05, (precision, theta, dev)


# two gradient-fuzz seeds per default run (~17 s each); the rest are slow
@pytest.mark.parametrize("seed", [
    0, 1,
    pytest.param(2, marks=pytest.mark.slow),
    pytest.param(3, marks=pytest.mark.slow),
])
def test_flash_pallas_fuzz_gradients(seed):
    rng = np.random.RandomState(2000 + seed)
    q, k, v, seg, causal, bq, bk = _random_case(rng)
    qj, kj, vj = map(jnp.asarray, (q, k, v))
    w = (np.asarray(seg) != 0)[..., None, None]

    def loss(impl):
        def f(q, k, v):
            out = flash_attention(q, k, v, q_segment_ids=seg,
                                  kv_segment_ids=seg, causal=causal,
                                  impl=impl, block_q=bq, block_k=bk)
            return jnp.sum(jnp.where(w, out, 0.0) ** 2)
        return f

    g_pal = jax.grad(loss("pallas"), argnums=(0, 1, 2))(qj, kj, vj)
    g_jnp = jax.grad(loss("jnp"), argnums=(0, 1, 2))(qj, kj, vj)
    for a, b in zip(g_pal, g_jnp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"grad seed={seed}")


@pytest.mark.parametrize("seed", range(4))
def test_paged_attention_fuzz(seed):
    """Random per-row history lengths / page sizes: the paged decode kernel
    must match dense attention over the written prefix."""
    from v2pe_tpu.core.config import LLMConfig
    from v2pe_tpu.infer import paged_kv as pk
    from v2pe_tpu.ops.paged_attention import paged_decode_attention

    rng = np.random.RandomState(3000 + seed)
    Hkv = int(rng.choice([1, 2]))
    G = int(rng.choice([1, 2]))
    Hq, D = Hkv * G, int(rng.choice([16, 32]))
    ps = int(rng.choice([8, 16]))
    B = int(rng.randint(1, 4))
    lens = rng.randint(1, 6 * ps, size=B).astype(np.int32)

    cfg = LLMConfig(vocab_size=64, hidden_size=Hq * D,
                    intermediate_size=32, num_hidden_layers=1,
                    num_attention_heads=Hq, num_key_value_heads=Hkv)
    S = int(lens.max())
    k_hist = rng.standard_normal((1, B, S, Hkv, D)).astype(np.float32)
    v_hist = rng.standard_normal((1, B, S, Hkv, D)).astype(np.float32)
    q = rng.standard_normal((B, 1, Hq, D)).astype(np.float32)
    k_new = rng.standard_normal((B, 1, Hkv, D)).astype(np.float32)
    v_new = rng.standard_normal((B, 1, Hkv, D)).astype(np.float32)

    n_pages = B * (-(-S // ps) + 1) + 1
    cache = pk.PagedKVCache.zeros(cfg, batch=B, n_pages=n_pages,
                                  page_size=ps,
                                  max_pages_per_row=-(-S // ps) + 1,
                                  dtype=jnp.float32)
    cache = pk.allocate_rows(cache, jnp.asarray(lens))
    # write each row's real history, zero past its length (write_all_layers
    # writes the full S per row; mask beyond lens to match dense ref)
    m = (np.arange(S)[None, :, None, None] <
         lens[:, None, None, None]).astype(np.float32)
    cache = pk.write_all_layers(cache, jnp.asarray(k_hist * m),
                                jnp.asarray(v_hist * m))
    cache = cache._replace(lengths=jnp.asarray(lens))

    out = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_new), jnp.asarray(v_new),
        cache.k_pages, cache.v_pages, cache.page_table, cache.lengths,
        jnp.asarray(0, jnp.int32), interpret=True)

    # dense reference per row: history prefix + the fresh token itself
    want = np.zeros_like(q)
    for b in range(B):
        L = int(lens[b])
        kk = np.repeat(np.concatenate([k_hist[0, b, :L], k_new[b]]),
                       G, axis=1)
        vv = np.repeat(np.concatenate([v_hist[0, b, :L], v_new[b]]),
                       G, axis=1)
        s = np.einsum("qhd,khd->hqk", q[b] * (D ** -0.5), kk)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want[b] = np.einsum("hqk,khd->qhd", p, vv)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=2e-5,
                               err_msg=f"paged seed={seed}")
