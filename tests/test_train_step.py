"""Multichip training-step tests on the virtual 8-device CPU mesh: FSDP +
ring sequence parallelism + tensor parallelism, with loss parity against the
single-device step.

Geometry is deliberately small (112px tiles -> 16 image tokens, S=256):
the 448px/S=640 variant compiled for ~10 minutes per mesh config on the
XLA-CPU backend, making the suite unobservable (round-1 verdict)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.core.config import MeshConfig, debug_tiny
from v2pe_tpu.models.params import init_vlm_params
from v2pe_tpu.parallel.mesh import make_mesh
from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer
from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch
from v2pe_tpu.train.train_step import make_train_step, shard_params

CFG = dataclasses.replace(
    debug_tiny(),
    vision=dataclasses.replace(debug_tiny().vision, image_size=112))
B, S = 2, 256


def _setup(mesh_cfg=None, seq_shards=1, seed=0):
    params = init_vlm_params(jax.random.PRNGKey(seed), CFG)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(tc, params)
    batch = make_synthetic_batch(CFG, B, S, tiles_per_row=1,
                                 seq_shards=seq_shards)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mesh = make_mesh(mesh_cfg) if mesh_cfg else None
    if mesh is not None:
        params = shard_params(params, mesh)
    opt_state = tx.init(params)
    step = make_train_step(CFG, tx, mesh, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=True, donate=False)
    return params, opt_state, batch, step


def test_single_device_step_runs_and_learns():
    params, opt_state, batch, step = _setup()
    p1, o1, m1 = step(params, opt_state, batch)   # warmup step: lr=0
    p2, o2, m2 = step(p1, o1, batch)
    p3, o3, m3 = step(p2, o2, batch)
    assert np.isfinite(float(m1["loss"]))
    assert float(m3["loss"]) < float(m2["loss"])  # memorizing one batch


@pytest.mark.slow
@pytest.mark.parametrize("mesh_cfg,seq_shards", [
    (MeshConfig(data=2, fsdp=2, seq=1, tensor=2), 1),
    (MeshConfig(data=1, fsdp=2, seq=2, tensor=2), 2),
    (MeshConfig(data=1, fsdp=1, seq=4, tensor=2), 4),
])
def test_sharded_step_matches_single_device(mesh_cfg, seq_shards):
    params0, opt0, batch0, step0 = _setup()
    _, _, m_ref = step0(params0, opt0, batch0)

    params, opt_state, batch, step = _setup(mesh_cfg, seq_shards=seq_shards)
    p1, o1, m = step(params, opt_state, batch)
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=2e-3)
    # and after the lr warms up, the loss decreases (memorizing one batch)
    p2, o2, m2 = step(p1, o1, batch)
    _, _, m3 = step(p2, o2, batch)
    assert float(m3["loss"]) < float(m2["loss"])


def test_chunked_ce_stays_chunked_on_data_only_mesh():
    """ADVICE r1 (medium): on a data/fsdp-only mesh (seq=1) the CE must still
    chunk over the sequence — falling back to full (S,V) fp32 logits per
    device reintroduces the OOM the chunking exists to fix. Checks numerics
    match the unchunked CE while a seq=1 ShardingContext is active."""
    from jax.sharding import Mesh
    from v2pe_tpu.models.internvl_chat import (_ce_block,
                                               chunked_cross_entropy)
    from v2pe_tpu.parallel import context as pctx

    rng = np.random.RandomState(0)
    Bc, Sc, D, V = 2, 4096, 16, 64
    hidden = jnp.asarray(rng.randn(Bc, Sc, D).astype(np.float32))
    kernel = jnp.asarray(rng.randn(D, V).astype(np.float32) * 0.1)
    targets = jnp.asarray(rng.randint(0, V, size=(Bc, Sc)).astype(np.int32))
    targets = jnp.where(jnp.asarray(rng.rand(Bc, Sc) < 0.1), -100, targets)
    w = jnp.asarray(rng.rand(Bc, Sc).astype(np.float32))

    num, den = _ce_block(hidden, kernel, targets, w)
    ref = num / den

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4, 1, 1),
                ("data", "fsdp", "seq", "tensor"))
    with pctx.use_sharding(pctx.ShardingContext(mesh=mesh)):
        out = chunked_cross_entropy(hidden, kernel, targets, w, chunk=512)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)


def test_embed_tokens_grad_matches_plain_gather():
    """embed_tokens (custom-vjp staged-reshard embedding) must be
    value- and gradient-identical to a plain table[ids] gather, with and
    without an active ShardingContext (the bwd's explicit replicate
    constraint is a layout annotation, not a math change)."""
    from jax.sharding import Mesh

    from v2pe_tpu.models.internlm2 import embed_tokens
    from v2pe_tpu.parallel import context as pctx

    rng = np.random.RandomState(1)
    V, D = 64, 8
    table = jnp.asarray(rng.randn(V, D).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, size=(2, 16)).astype(np.int32))
    ct = jnp.asarray(rng.randn(2, 16, D).astype(np.float32))

    def loss_plain(t):
        return jnp.sum(t[ids] * ct)

    def loss_custom(t):
        return jnp.sum(embed_tokens(t, ids) * ct)

    g_plain = jax.grad(loss_plain)(table)
    g_custom = jax.grad(loss_custom)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-6)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 1, 2),
                ("data", "fsdp", "seq", "tensor"))
    with pctx.use_sharding(pctx.ShardingContext(mesh=mesh)):
        g_mesh = jax.jit(jax.grad(loss_custom))(table)
    np.testing.assert_allclose(np.asarray(g_mesh), np.asarray(g_plain),
                               rtol=1e-6)


@pytest.mark.parametrize("mode", ["block2", "attn_saved", False])
def test_remat_modes_match_full(mode):
    """Every remat policy computes the SAME loss and gradients as full
    per-layer remat — the policies trade memory for recompute only
    (docs/perf_analysis.md training section). block4 on the 2-layer debug
    model exercises the L%blk fallback to full."""
    from v2pe_tpu.train.train_step import loss_fn

    params = init_vlm_params(jax.random.PRNGKey(0), CFG)
    batch = make_synthetic_batch(CFG, B, S, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def lg(remat):
        return jax.jit(jax.value_and_grad(
            lambda p: loss_fn(p, CFG, batch, IMG_CONTEXT_ID,
                              "jnp", remat)))(params)

    l_full, g_full = lg(True)
    l_m, g_m = lg(mode)
    np.testing.assert_allclose(float(l_m), float(l_full), rtol=1e-6)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_full)
    flat_m, _ = jax.flatten_util.ravel_pytree(g_m)
    np.testing.assert_allclose(np.asarray(flat_m), np.asarray(flat_f),
                               rtol=2e-5, atol=2e-5)


def test_remat_block4_fallback_runs():
    from v2pe_tpu.train.train_step import loss_fn

    params = init_vlm_params(jax.random.PRNGKey(0), CFG)
    batch = make_synthetic_batch(CFG, B, S, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    loss = jax.jit(lambda p: loss_fn(p, CFG, batch, IMG_CONTEXT_ID,
                                     "jnp", "block4"))(params)
    assert np.isfinite(float(loss))


def test_offloaded_optimizer_matches_resident():
    """offload_optimizer (int8 Adam state staged through host memory per
    leaf, the ZeRO-Offload move) must match the RESIDENT int8 Adam step —
    the memory space and staging order are the only differences."""
    params_a = init_vlm_params(jax.random.PRNGKey(0), CFG)
    tc_a = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10,
                       use_8bit_optimizer=True)
    tx_a = build_optimizer(tc_a, params_a)
    opt_a = tx_a.init(params_a)
    batch = make_synthetic_batch(CFG, B, S, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_a = make_train_step(CFG, tx_a, None, IMG_CONTEXT_ID,
                             attn_impl="jnp", remat=True, donate=False)

    params_b = init_vlm_params(jax.random.PRNGKey(0), CFG)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10,
                     use_8bit_optimizer=True, offload_optimizer=True)
    tx = build_optimizer(tc, params_b)
    opt_b = tx.init(params_b)
    step_b = make_train_step(CFG, tx, None, IMG_CONTEXT_ID, attn_impl="jnp",
                             remat=True, donate=False,
                             offload_optimizer=True)
    pa, oa, ma = step_a(params_a, opt_a, batch)
    pb, ob, mb = step_b(params_b, opt_b, batch)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-6)
    fa, _ = jax.flatten_util.ravel_pytree(pa)
    fb, _ = jax.flatten_util.ravel_pytree(pb)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), rtol=1e-6,
                               atol=1e-7)
    # and a second step consumes the host-resident state fine
    pb2, ob2, mb2 = step_b(pb, ob, batch)
    assert np.isfinite(float(mb2["loss"]))
