"""Optimizer construction: AdamW with warmup+cosine schedule, no-decay for
norms/biases/LayerScale, layer-wise lr decay and per-tower lr scales.

Port of the reference's custom param grouping
(``internvl/train/trainer_monkey_patch.py:67-165``): groups vit / llm /
layer_scale params, applies env-var decay rates (VIT_LAYER_DECAY_RATE,
QLLAMA_LR_SCALE) — here typed config fields; layer-wise decay acts on the
stacked layer dim directly."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 4e-5
    min_lr_ratio: float = 0.0
    warmup_steps: int = 100
    total_steps: int = 20_000
    weight_decay: float = 0.01
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    # trainer_monkey_patch parity knobs
    vit_lr_scale: float = 1.0          # QLLAMA_LR_SCALE analogue for towers
    vit_layer_decay_rate: float = 1.0  # VIT_LAYER_DECAY_RATE
    llm_layer_decay_rate: float = 1.0
    layer_scale_lr_scale: float = 1.0  # SCALE for ls1/ls2 (compress-seq :113)
    grad_accum_steps: int = 1
    # freeze flags (internvl_chat_finetune.py:110-138, applied :1375-1400):
    # frozen subtrees get zero gradient before Adam, so moments stay clean
    use_8bit_optimizer: bool = False  # block-wise int8 Adam state
                                      # (trainer_monkey_patch.py:147-159)
    offload_optimizer: bool = False   # int8 Adam state resident in HOST
                                      # memory, staged per leaf (ZeRO-
                                      # Offload equivalent; requires
                                      # use_8bit_optimizer; adam8bit.py)
    freeze_llm: bool = False
    freeze_backbone: bool = False
    freeze_mlp: bool = False
    unfreeze_lm_head: bool = False       # with freeze_llm: train output head
    unfreeze_vit_layers: int = 0         # e.g. -4: last 4 ViT layers train
                                         # even under freeze_backbone


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _no_decay(path: str, leaf) -> bool:
    return (leaf.ndim <= 1 and not path.startswith("llm/tok_embeddings")) or \
        "norm" in path or path.endswith("ls1") or path.endswith("ls2") or \
        "bias" in path or path.startswith("compress/layer_scale")


def decay_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda p, x: not _no_decay(_path_str(p), x), params)


def lr_scale_tree(params, tc: TrainConfig):
    """Per-leaf lr multiplier; stacked layer tensors get a per-layer vector
    broadcast along the leading L dim (layer-wise decay: later layers get
    higher lr, rate**(L-1-i) like trainer_monkey_patch.py:87-112)."""

    def visit(path, leaf):
        p = _path_str(path)
        scale = 1.0
        if p.startswith("vision/"):
            scale *= tc.vit_lr_scale
        if p.endswith("/ls1") or p.endswith("/ls2") or \
                p.startswith("compress/layer_scale"):
            scale *= tc.layer_scale_lr_scale
        rate = None
        if p.startswith("vision/layers/") and tc.vit_layer_decay_rate != 1.0:
            rate = tc.vit_layer_decay_rate
        if p.startswith("llm/layers/") and tc.llm_layer_decay_rate != 1.0:
            rate = tc.llm_layer_decay_rate
        if rate is not None and leaf.ndim >= 1:
            L = leaf.shape[0]
            vec = rate ** jnp.arange(L - 1, -1, -1, dtype=jnp.float32)
            vec = vec.reshape((L,) + (1,) * (leaf.ndim - 1))
            return scale * vec
        return jnp.asarray(scale, jnp.float32)

    return jax.tree_util.tree_map_with_path(visit, params)


def freeze_mask_tree(params, tc: TrainConfig):
    """Per-leaf 0/1 trainability multipliers for the freeze flags.

    Mirrors _freeze_params + the unfreeze carve-outs
    (internvl_chat_finetune.py:1375-1400). Stacked ViT layer tensors get a
    per-layer (L,1,..) vector so ``unfreeze_vit_layers`` (negative index:
    keep the last |n| layers trainable) works on the scanned layout."""

    def visit(path, leaf):
        p = _path_str(path)
        trainable = 1.0
        if tc.freeze_backbone and p.startswith("vision/"):
            trainable = 0.0
        if tc.freeze_llm and p.startswith("llm/"):
            trainable = 0.0
        if tc.freeze_mlp and p.startswith("mlp1/"):
            trainable = 0.0
        if tc.unfreeze_lm_head and p == "llm/output_kernel":
            trainable = 1.0
        if (tc.unfreeze_vit_layers != 0 and p.startswith("vision/layers/")
                and leaf.ndim >= 1):
            L = leaf.shape[0]
            vec = jnp.full((L,), trainable, jnp.float32)
            idx = jnp.arange(L)
            start = tc.unfreeze_vit_layers % L \
                if tc.unfreeze_vit_layers < 0 else tc.unfreeze_vit_layers
            vec = jnp.where(idx >= start, 1.0, vec)
            return vec.reshape((L,) + (1,) * (leaf.ndim - 1))
        return jnp.asarray(trainable, jnp.float32)

    return jax.tree_util.tree_map_with_path(visit, params)


def _any_freeze(tc: TrainConfig) -> bool:
    return (tc.freeze_llm or tc.freeze_backbone or tc.freeze_mlp
            or tc.unfreeze_vit_layers != 0)


def _scale_by_tree(scales):
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree.map(lambda u, s: u * s, updates, scales)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def lr_schedule(tc: TrainConfig):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=tc.warmup_steps,
        decay_steps=max(tc.total_steps, tc.warmup_steps + 1),
        end_value=tc.learning_rate * tc.min_lr_ratio,
    )


def build_optimizer(tc: TrainConfig, params) -> optax.GradientTransformation:
    scales = lr_scale_tree(params, tc)
    steps = []
    if _any_freeze(tc):
        # zero frozen gradients FIRST: the global-norm clip and Adam moments
        # then see exactly what a torch requires_grad=False run would
        steps.append(_scale_by_tree(freeze_mask_tree(params, tc)))
    if tc.use_8bit_optimizer:
        from v2pe_tpu.train.adam8bit import scale_by_adam8bit

        adam = scale_by_adam8bit(b1=tc.beta1, b2=tc.beta2, eps=tc.eps,
                                 offload=tc.offload_optimizer)
    else:
        assert not tc.offload_optimizer, \
            "offload_optimizer requires use_8bit_optimizer (the fp32 " \
            "moment state has no per-leaf staging path)"
        adam = optax.scale_by_adam(b1=tc.beta1, b2=tc.beta2, eps=tc.eps)
    steps += [
        optax.clip_by_global_norm(tc.max_grad_norm),
        adam,
        optax.add_decayed_weights(tc.weight_decay, mask=decay_mask(params)),
        _scale_by_tree(scales),
        optax.scale_by_learning_rate(lr_schedule(tc)),
    ]
    if _any_freeze(tc):
        # weight decay is additive after Adam — re-mask so frozen params
        # receive strictly zero updates
        steps.append(_scale_by_tree(freeze_mask_tree(params, tc)))
    tx = optax.chain(*steps)
    if tc.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, tc.grad_accum_steps)
    return tx
