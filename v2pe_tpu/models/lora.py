"""LoRA adapters for the functional param tree.

Replaces the reference's peft wrappers (``wrap_backbone_lora`` /
``wrap_llm_lora``, modeling_internvl_chat.py:142-163; default targets:
ViT qkv/proj, LLM wqkv/wo/w1/w2/w3) with explicit low-rank trees:
``lora[path] = {"a": (in, r), "b": (r, out)}``. Adapters can be applied
merged (exact, for inference) or trained with a mask that freezes base
params."""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

# peft target parity (modeling_internvl_chat.py:144-146, 155-158)
BACKBONE_TARGETS = [r"vision/layers/qkv_kernel", r"vision/layers/proj_kernel"]
LLM_TARGETS = [
    r"llm/layers/wqkv_kernel", r"llm/layers/wo_kernel",
    r"llm/layers/w1_kernel", r"llm/layers/w2_kernel",
    r"llm/layers/w3_kernel",
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def init_lora(key, params, targets: List[str], r: int = 16,
              alpha: Optional[float] = None, dtype=jnp.float32) -> dict:
    """Build a LoRA tree mirroring `params` with {"a","b"} at matched kernel
    leaves and None elsewhere. alpha defaults to 2*r (reference uses
    lora_alpha = 2 * r, :151/:162)."""
    alpha = alpha if alpha is not None else 2.0 * r
    keys = iter(jax.random.split(key, 4096))

    def visit(path, leaf):
        p = _path_str(path)
        if leaf.ndim >= 2 and any(re.fullmatch(t, p) for t in targets):
            *batch, fan_in, fan_out = leaf.shape
            a = jax.random.normal(next(keys),
                                  (*batch, fan_in, r), jnp.float32) * 0.01
            b = jnp.zeros((*batch, r, fan_out), jnp.float32)
            return {"a": a.astype(dtype), "b": b.astype(dtype),
                    "alpha": jnp.asarray(alpha, jnp.float32)}
        return None

    return jax.tree_util.tree_map_with_path(visit, params)


def merge_lora(params, lora) -> dict:
    """W' = W + (alpha/r) * A @ B — exact merged weights.

    Differentiable through A/B (the LoRA train step computes the forward on
    the merged weights and backprops into the adapters only); alpha is a
    fixed hyperparameter, so it is stop_gradient'ed."""

    def visit(w, ad):
        if ad is None:
            return w
        r = ad["a"].shape[-1]
        scale = jax.lax.stop_gradient(ad["alpha"]) / r
        delta = jnp.einsum("...ir,...ro->...io",
                           ad["a"].astype(jnp.float32),
                           ad["b"].astype(jnp.float32)) * scale
        return (w.astype(jnp.float32) + delta).astype(w.dtype)

    return jax.tree.map(visit, params, lora,
                        is_leaf=lambda x: x is None or isinstance(x, dict)
                        and "a" in x)


def combine_lora(*loras) -> dict:
    """Union of adapter trees built over the same params (e.g. backbone +
    llm target sets with different ranks); at most one may be non-None at
    any leaf."""

    def visit(*ads):
        present = [a for a in ads if a is not None]
        assert len(present) <= 1, "overlapping LoRA target sets"
        return present[0] if present else None

    return jax.tree.map(visit, *loras,
                        is_leaf=lambda x: x is None or isinstance(x, dict)
                        and "a" in x)


def build_lora(key, params, backbone_r: int = 0, llm_r: int = 0,
               dtype=jnp.float32) -> Optional[dict]:
    """The reference's use_backbone_lora/use_llm_lora entry
    (modeling_internvl_chat.py:142-163; finetune args :98-105): rank per
    tower, peft-parity targets, alpha = 2*r. Returns None when both 0."""
    if not backbone_r and not llm_r:
        return None
    kb, kl = jax.random.split(key)
    trees = []
    if backbone_r:
        trees.append(init_lora(kb, params, BACKBONE_TARGETS, r=backbone_r,
                               dtype=dtype))
    if llm_r:
        trees.append(init_lora(kl, params, LLM_TARGETS, r=llm_r,
                               dtype=dtype))
    return trees[0] if len(trees) == 1 else combine_lora(*trees)


def lora_trainable_mask(params, lora):
    """Optax mask: True only where a LoRA adapter exists (train adapters,
    freeze the base model)."""

    def visit(w, ad):
        return ad is not None

    return jax.tree.map(visit, params, lora,
                        is_leaf=lambda x: x is None or isinstance(x, dict)
                        and "a" in x)
