"""Pipeline parallelism (parallel/pipeline.py): GPipe over the 'pipe' mesh
axis must reproduce the plain layer-scan forward and training step.

The reference has no pipeline axis (DeepSpeed ZeRO only) — this is the
DCN-scale capability for models whose layer stack outgrows one ICI slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from v2pe_tpu.core.config import LLMConfig, MeshConfig
from v2pe_tpu.models.internlm2 import llm_forward
from v2pe_tpu.models.params import init_llm_params
from v2pe_tpu.parallel import context as pctx
from v2pe_tpu.parallel.mesh import make_mesh, param_sharding
from v2pe_tpu.parallel.pipeline import choose_microbatches

CFG = LLMConfig(vocab_size=256, hidden_size=64, intermediate_size=96,
                num_hidden_layers=8, num_attention_heads=4,
                num_key_value_heads=2)


def _setup(mesh_cfg: MeshConfig, B=4, S=64):
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0,
                             CFG.vocab_size)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), (B, S))
    seg = jnp.ones((B, S), jnp.int32)
    mesh = make_mesh(mesh_cfg)
    return params, ids, pos, seg, mesh


def _fwd(params, cfg, ids, pos, seg, ctx):
    def f(params, ids, pos, seg):
        with pctx.use_sharding(ctx):
            logits, _ = llm_forward(params, cfg, input_ids=ids,
                                    rope_pos_ids=pos, segment_ids=seg,
                                    attn_impl="jnp")
        return logits

    return jax.jit(f)(params, ids, pos, seg)


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(pipe=4, fsdp=2),          # pipe x fsdp
    MeshConfig(pipe=2, fsdp=2, tensor=2),  # pipe x fsdp x tp
])
def test_pipeline_forward_matches_dense(jax8, mesh_cfg):
    params, ids, pos, seg, mesh = _setup(mesh_cfg)
    ref = _fwd(params, CFG, ids, pos, seg, None)
    sharded = jax.device_put(params, param_sharding(params, mesh))
    got = _fwd(sharded, CFG, ids, pos, seg,
               pctx.ShardingContext(mesh=mesh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_pipeline_layer_params_sharded_over_pipe(jax8):
    mesh_cfg = MeshConfig(pipe=4, fsdp=2)
    params, _, _, _, mesh = _setup(mesh_cfg)
    sh = param_sharding(params, mesh)
    spec = sh["layers"]["wqkv_kernel"].spec
    assert tuple(spec)[0] == "pipe", spec
    # non-layer params stay unsharded on pipe
    assert "pipe" not in tuple(sh["tok_embeddings"].spec)


def test_pipeline_more_microbatches_than_stages(jax8):
    mesh_cfg = MeshConfig(pipe=2, fsdp=2)
    params, ids, pos, seg, mesh = _setup(mesh_cfg, B=8)
    ref = _fwd(params, CFG, ids, pos, seg, None)
    sharded = jax.device_put(params, param_sharding(params, mesh))
    got = _fwd(sharded, CFG, ids, pos, seg,
               pctx.ShardingContext(mesh=mesh, pipe_microbatches=8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_choose_microbatches():
    assert choose_microbatches(8, 4) == 8          # <= 2P and divides
    assert choose_microbatches(12, 4, 0) == 6      # largest divisor <= 8
    assert choose_microbatches(7, 4) == 7
    assert choose_microbatches(8, 4, requested=2) == 2
    with pytest.raises(ValueError):
        choose_microbatches(8, 4, requested=3)


@pytest.mark.slow  # heavy 8-dev CPU-mesh train-step compile; geometry re-certified every round by dryrun_multichip's pipeline/gpipe check
def test_pipeline_train_step_bf16(jax8):
    """bf16 params through the pipe mesh (the train CLI default). Regression:
    partial-manual shard_map lowers pipe-axis psums with a copy-rooted HLO
    reduction body, and XLA CPU's AllReducePromotion pass aborts the process
    promoting those at bf16 — pipeline_llm_layers must keep every float that
    crosses its shard_map boundary f32 (parallel/pipeline.py)."""
    from v2pe_tpu.core.config import debug_tiny
    from v2pe_tpu.models.params import init_vlm_params
    from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer
    from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch
    from v2pe_tpu.train.train_step import make_train_step, shard_params

    cfg = debug_tiny()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(tc, params)
    batch = make_synthetic_batch(cfg, 4, 320, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    batch["pixel_values"] = batch["pixel_values"].astype(jnp.bfloat16)

    step = make_train_step(cfg, tx, None, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=True, donate=False)
    _, _, m_ref = step(params, tx.init(params), batch)

    mesh = make_mesh(MeshConfig(pipe=2, fsdp=2))
    sharded = shard_params(params, mesh)
    stepp = make_train_step(cfg, tx, mesh, IMG_CONTEXT_ID, attn_impl="jnp",
                            remat=True, donate=False)
    _, _, m_pipe = stepp(sharded, tx.init(sharded), batch)
    np.testing.assert_allclose(float(m_pipe["loss"]), float(m_ref["loss"]),
                               rtol=2e-2)


@pytest.mark.slow  # heavy 8-dev CPU-mesh train-step compile; geometry re-certified every round by dryrun_multichip's pipeline/gpipe check
def test_pipeline_train_step_matches_unpipelined(jax8):
    """Full VLM training step (loss + one update) under a pipe mesh equals
    the single-device step."""
    from v2pe_tpu.core.config import debug_tiny
    from v2pe_tpu.models.params import init_vlm_params
    from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer
    from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch
    from v2pe_tpu.train.train_step import make_train_step, shard_params

    cfg = debug_tiny()
    assert cfg.llm.num_hidden_layers % 2 == 0
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(tc, params)
    batch = make_synthetic_batch(cfg, 4, 320, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    step = make_train_step(cfg, tx, None, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=True, donate=False)
    _, _, m_ref = step(params, tx.init(params), batch)

    mesh_cfg = MeshConfig(pipe=2, fsdp=2, data=2)
    mesh = make_mesh(mesh_cfg)
    sharded = shard_params(params, mesh)
    # force M=2 so the multi-microbatch tick schedule's BACKWARD is held
    # to tight tolerance too (auto would degenerate to M=1 at B == dp)
    stepp = make_train_step(cfg, tx, mesh, IMG_CONTEXT_ID, attn_impl="jnp",
                            remat=True, donate=False, pipe_microbatches=2)
    _, _, m_pipe = stepp(sharded, tx.init(sharded), batch)
    np.testing.assert_allclose(float(m_pipe["loss"]), float(m_ref["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m_pipe["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=2e-4)
