"""LoRA adapter tests: shape mirroring, zero-init identity, merge math."""

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import debug_tiny
from v2pe_tpu.models.internlm2 import llm_forward
from v2pe_tpu.models.lora import (BACKBONE_TARGETS, LLM_TARGETS, init_lora,
                                  lora_trainable_mask, merge_lora)
from v2pe_tpu.models.params import init_vlm_params


def test_lora_zero_init_is_identity():
    cfg = debug_tiny(vocab_size=200)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params,
                     BACKBONE_TARGETS + LLM_TARGETS, r=4)
    merged = merge_lora(params, lora)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 200)
    a, _ = llm_forward(params["llm"], cfg.llm, input_ids=ids, attn_impl="jnp")
    b, _ = llm_forward(merged["llm"], cfg.llm, input_ids=ids,
                       attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lora_merge_changes_output_when_b_nonzero():
    cfg = debug_tiny(vocab_size=200)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, LLM_TARGETS, r=4)
    # poke b of wqkv
    lora = jax.tree.map(
        lambda x: x + 0.1 if isinstance(x, jnp.ndarray) and x.ndim == 3
        and x.shape[-2] == 4 else x, lora)
    merged = merge_lora(params, lora)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 200)
    a, _ = llm_forward(params["llm"], cfg.llm, input_ids=ids, attn_impl="jnp")
    b, _ = llm_forward(merged["llm"], cfg.llm, input_ids=ids,
                       attn_impl="jnp")
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_lora_mask_targets_only():
    cfg = debug_tiny(vocab_size=200)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora(jax.random.PRNGKey(1), params, LLM_TARGETS, r=4)
    mask = lora_trainable_mask(params, lora)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    marked = {"/".join(str(getattr(k, "key", k)) for k in p)
              for p, v in leaves if v}
    assert "llm/layers/wqkv_kernel" in marked
    assert "llm/tok_embeddings" not in marked
    assert not any(p.startswith("vision/") for p in marked)
