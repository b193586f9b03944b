"""Ulysses SP vs single-device flash attention on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from v2pe_tpu.ops.attention import flash_attention
from v2pe_tpu.parallel.ulysses import ulysses_attention

WORLD = 8
B, S, HQ, HKV, D = 1, 256, 8, 8, 16


def test_ulysses_matches_flash():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, HQ, D), jnp.float32)
    k = jax.random.normal(kk, (B, S, HKV, D), jnp.float32)
    v = jax.random.normal(kv, (B, S, HKV, D), jnp.float32)
    seg = jnp.ones((B, S), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))

    ref = flash_attention(q, k, v, q_segment_ids=seg, kv_segment_ids=seg,
                          causal=True, impl="jnp", block_q=32, block_k=32)

    mesh = Mesh(np.array(jax.devices()[:WORLD]), ("seq",))

    def fn(q, k, v, sq, sk, pq, pk):
        return ulysses_attention(
            q, k, v, axis_name="seq", q_segment_ids=sq, kv_segment_ids=sk,
            q_positions=pq, kv_positions=pk, causal=True, impl="jnp",
            block_q=32, block_k=32)

    shard = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "seq"),) * 3 + (P(None, "seq"),) * 4,
        out_specs=P(None, "seq"), check_vma=False)
    got = shard(q, k, v, seg, seg, pos, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
