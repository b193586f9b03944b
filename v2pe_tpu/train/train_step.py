"""pjit-compiled training step.

Replaces the reference's HF Trainer + DeepSpeed ZeRO loop
(internvl_chat_finetune.py:1413-1452, zero_stage{1,3}_config.json): parameters
and optimizer state are sharded by the mesh rules (parallel/mesh.py), the
batch is sharded over (data, fsdp) x seq, gradients reduce automatically via
GSPMD, and ring attention engages through the ambient ShardingContext when
the seq axis is >1.

Batch contract (all device arrays; produced by data/packing.py):
  input_ids (B,S) i32 | rope_pos_ids (B,S) f32 | token_positions (B,S) i32
  segment_ids (B,S) i32 | targets (B,S) i32 (pre-shifted, -100 ignore)
  loss_weight (B,S) f32 | pixel_values (T,3,sz,sz) | image_flags (T,) i32
  vit_gather_idx (B,S) i32 (-1 = text token)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2pe_tpu.core.config import VLMConfig
from v2pe_tpu.models import internvl_chat
from v2pe_tpu.parallel import context as pctx
from v2pe_tpu.parallel.mesh import param_sharding


def loss_fn(params, cfg: VLMConfig, batch, img_context_token_id: int,
            attn_impl: str = "auto", remat: bool = True,
            drop_path_rng=None):
    out = internvl_chat.forward(
        params, cfg,
        input_ids=batch["input_ids"],
        pixel_values=batch["pixel_values"],
        image_flags=batch["image_flags"],
        rope_pos_ids=batch["rope_pos_ids"],
        img_context_token_id=img_context_token_id,
        segment_ids=batch["segment_ids"],
        token_positions=batch["token_positions"],
        vit_gather_idx=batch.get("vit_gather_idx"),
        targets=batch["targets"],
        loss_weight=batch["loss_weight"],
        # no loss_weight_sum key: under GSPMD the CE denominator is already
        # the GLOBAL weight sum (the batch is one global array), so the
        # reference's loss_reduction_all_gather all-reduce is automatic
        attn_impl=attn_impl,
        remat=remat,
        drop_path_rng=drop_path_rng,
    )
    return out.loss


def make_train_step(cfg: VLMConfig, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh], img_context_token_id: int,
                    attn_impl: str = "auto", remat: bool = True,
                    donate: bool = True, pipe_microbatches: int = 0,
                    ring_mode: str = "scan", lora: bool = False,
                    offload_optimizer: bool = False):
    """Returns step(params, opt_state, batch) -> (params, opt_state, metrics).

    When `mesh` is given the step is jitted with sharded in/out specs and a
    ShardingContext is active during tracing so attention routes through
    shard_map (ring over 'seq' when sized).

    ``offload_optimizer=True`` declares that ``tx`` was built with
    ``TrainConfig(use_8bit_optimizer=True, offload_optimizer=True)``: the
    int8 Adam moments live in HOST memory and stage through HBM one leaf
    at a time during the update (adam8bit.scale_by_adam8bit(offload=True)
    — the ZeRO-Offload idea, TPU-native). The point is peak SEPARATION:
    the backward's peak (params + grads + activations/residuals) and the
    update's peak (params + grads + one staged leaf) each fit a 16 GB
    chip where their union does not — what fits the 32k-recipe step on
    ONE v5e (resident moments measured 2.6-4.2 GB over HBM;
    docs/perf_analysis.md training section).

    With ``lora=True`` the step is
    step(lora_tree, opt_state, batch, base_params) -> (lora_tree, ...):
    the forward runs on merge_lora(base, adapters) inside jit, gradients
    flow ONLY into the adapter tree (base params are a frozen, non-donated
    argument), and tx/opt_state cover just the adapters — the optimizer
    state is rank-sized, which is the point of LoRA (reference:
    wrap_backbone_lora/wrap_llm_lora, modeling_internvl_chat.py:142-163)."""
    if offload_optimizer:
        # the actual staging lives INSIDE the int8 Adam transformation
        # (adam8bit.scale_by_adam8bit(offload=True)): moments are fetched
        # from host memory one leaf at a time, barrier-chained, which
        # bounds their HBM residency at ~one stacked leaf. A tree-level
        # host-staging wrapper here was tried first and rejected: XLA's
        # scheduler staged the whole state (plus layout-reshape copies)
        # concurrently, costing +0.5-9 GB of transient HBM depending on
        # the build. The flag is kept for API clarity/validation — the tx
        # passed in must have been built with
        # TrainConfig(offload_optimizer=True).
        assert not lora, "LoRA state is rank-sized; offload is pointless"

    if lora:
        from v2pe_tpu.models.lora import merge_lora

        def step(adapters, opt_state, batch, base_params, dropout_rng=None):
            def lora_loss(adapters):
                eff = merge_lora(base_params, adapters)
                return loss_fn(eff, cfg, batch, img_context_token_id,
                               attn_impl, remat, dropout_rng)

            loss, grads = jax.value_and_grad(lora_loss)(adapters)
            updates, opt_state = tx.update(grads, opt_state, adapters)
            adapters = optax.apply_updates(adapters, updates)
            gnorm = optax.global_norm(grads)
            return adapters, opt_state, {"loss": loss, "grad_norm": gnorm}
    else:
        def step(params, opt_state, batch, dropout_rng=None):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, cfg, batch, img_context_token_id, attn_impl, remat,
                dropout_rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gnorm = optax.global_norm(grads)
            return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    if (ring_mode == "fused" and remat
            and jax.default_backend() != "tpu"):
        # interpret-mode pallas (the off-TPU rendering of the fused kernel)
        # uses ordered-IO callbacks that jax.checkpoint cannot partial-eval
        raise ValueError(
            "ring_mode='fused' off-TPU runs via the Pallas interpreter and "
            "cannot be rematerialized — pass remat=False (CLI: --no_remat) "
            "or use ring_mode='scan'")
    ctx = pctx.ShardingContext(mesh=mesh,
                               pipe_microbatches=pipe_microbatches,
                               ring_mode=ring_mode)

    def step_with_ctx(params, opt_state, batch, dropout_rng=None):
        with pctx.use_sharding(ctx):
            return step(params, opt_state, batch, dropout_rng)

    return jax.jit(step_with_ctx, donate_argnums=(0, 1) if donate else ())


def host_opt_state(opt_state):
    """Move an optimizer state's int8 moment tensors to host memory.

    Only needed when restoring a checkpointed state for an offloaded run —
    ``scale_by_adam8bit(offload=True).init`` already returns host-resident
    moments."""
    return jax.tree.map(
        lambda a: jax.device_put(a, jax.memory.Space.Host), opt_state)


def shard_params(params, mesh: Mesh):
    """Device-put params onto the mesh with the framework sharding rules."""
    shardings = param_sharding(params, mesh)
    return jax.device_put(params, shardings)


def init_opt_state(tx, params, mesh: Optional[Mesh] = None):
    """Initialize optimizer state; under a mesh the moments inherit the
    param shardings through GSPMD propagation (jitted init)."""
    if mesh is None:
        return tx.init(params)
    shardings = param_sharding(params, mesh)
    return jax.jit(tx.init, in_shardings=(shardings,))(params)
