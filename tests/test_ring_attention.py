"""Ring attention vs single-device flash attention on the 8-device CPU mesh,
forward and backward, zigzag layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from v2pe_tpu.ops.attention import flash_attention
from v2pe_tpu.parallel.ring import (
    ring_attention, zigzag_global_positions, zigzag_shard, zigzag_unshard)

WORLD = 8
B, S, HQ, HKV, D = 1, 256, 4, 2, 16


def _mesh():
    return Mesh(np.array(jax.devices()[:WORLD]), ("seq",))


def _inputs(seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, HQ, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, HKV, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, HKV, D), jnp.float32)
    seg = np.ones((B, S), np.int32)
    seg[:, : S // 3] = 1
    seg[:, S // 3: 2 * S // 3] = 2
    seg[:, 2 * S // 3:] = 3
    return q, k, v, jnp.asarray(seg)


def _to_zigzag(x, axis=1):
    """Rearrange so contiguous shard r == zigzag chunk of rank r."""
    return jnp.concatenate(
        [zigzag_shard(x, r, WORLD, axis=axis) for r in range(WORLD)],
        axis=axis)


def _zig_positions():
    pos = np.concatenate(
        [zigzag_global_positions(S, r, WORLD) for r in range(WORLD)])
    return jnp.asarray(np.broadcast_to(pos, (B, S)).astype(np.int32))


def _ring_fn(q, k, v, seg_q, seg_k, pos_q, pos_k):
    return ring_attention(
        q, k, v, axis_name="seq",
        q_segment_ids=seg_q, kv_segment_ids=seg_k,
        q_positions=pos_q, kv_positions=pos_k,
        causal=True, impl="jnp", block_q=32, block_k=32)


def _run_ring(q, k, v, seg):
    mesh = _mesh()
    qz, kz, vz = _to_zigzag(q), _to_zigzag(k), _to_zigzag(v)
    segz = _to_zigzag(seg)
    posz = _zig_positions()
    shard = jax.shard_map(
        _ring_fn, mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"),
                  P(None, "seq"), P(None, "seq"), P(None, "seq"),
                  P(None, "seq")),
        out_specs=P(None, "seq"),
        check_vma=False,  # lax.cond block-skip branches differ in vma type
    )
    out_z = shard(qz, kz, vz, segz, segz, posz, posz)
    return zigzag_unshard(out_z, WORLD, axis=1)


def test_ring_forward_matches_flash():
    q, k, v, seg = _inputs()
    ref = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                          causal=True, impl="jnp", block_q=32, block_k=32)
    got = _run_ring(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_gradients_match_flash():
    q, k, v, seg = _inputs(seed=1)

    def loss_ref(q, k, v):
        o = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                            causal=True, impl="jnp", block_q=32, block_k=32)
        return jnp.sum(jnp.sin(o))

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(_run_ring(q, k, v, seg)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_zigzag_roundtrip():
    x = jnp.arange(S, dtype=jnp.float32)[None]
    xz = _to_zigzag(x)
    np.testing.assert_array_equal(np.asarray(zigzag_unshard(xz, WORLD)),
                                  np.asarray(x))
    # the zigzag positions are exactly the values stored at each slot
    np.testing.assert_array_equal(np.asarray(_zig_positions())[0],
                                  np.asarray(xz)[0].astype(np.int32))


def _run_ring_w(q, k, v, seg, pos, world, block=32):
    """Ring over the first `world` devices with explicit positions."""
    mesh = Mesh(np.array(jax.devices()[:world]), ("seq",))

    def fn(q, k, v, sq, sk, pq, pk):
        return ring_attention(
            q, k, v, axis_name="seq", q_segment_ids=sq, kv_segment_ids=sk,
            q_positions=pq, kv_positions=pk, causal=True, impl="jnp",
            block_q=block, block_k=block)

    return jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "seq"),) * 7, out_specs=P(None, "seq"),
        check_vma=False,
    )(q, k, v, seg, seg, pos, pos)


@pytest.mark.parametrize("seed", [
    0,
    pytest.param(1, marks=pytest.mark.slow),  # one seed default; the sweep is slow-tier
])
def test_ring_half_chunk_skip_parity(seed):
    """Zigzag half-chunk branch selection (S big enough that
    Hs >= block_q enables the 5-way lax.switch): forward AND backward must
    match dense flash exactly. World=4 so per-shard S=256, halves=128."""
    world, Sbig = 4, 1024
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, Sbig, HQ, D), jnp.float32)
    k = jax.random.normal(kk, (B, Sbig, HKV, D), jnp.float32)
    v = jax.random.normal(kv, (B, Sbig, HKV, D), jnp.float32)
    seg = np.ones((B, Sbig), np.int32)
    seg[:, : Sbig // 2] = 1
    seg[:, Sbig // 2:] = 2
    seg[:, -32:] = 0  # trailing padding
    seg = jnp.asarray(seg)

    zz = lambda x: jnp.concatenate(
        [zigzag_shard(x, r, world, axis=1) for r in range(world)], axis=1)
    pos = np.concatenate(
        [zigzag_global_positions(Sbig, r, world) for r in range(world)])
    pos = jnp.asarray(np.broadcast_to(pos, (B, Sbig)).astype(np.int32))

    ref = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                          causal=True, impl="jnp", block_q=32, block_k=32)
    got_z = _run_ring_w(zz(q), zz(k), zz(v), zz(seg), pos, world)
    got = zigzag_unshard(got_z, world, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_ref(q, k, v):
        o = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                            causal=True, impl="jnp", block_q=32, block_k=32)
        return jnp.sum(jnp.sin(o))

    def loss_ring(q, k, v):
        o = _run_ring_w(zz(q), zz(k), zz(v), zz(seg), pos, world)
        return jnp.sum(jnp.sin(zigzag_unshard(o, world, axis=1)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=name)
