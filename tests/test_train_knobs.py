"""Training-recipe knob tests: DropPath stochastic depth (torch-matched
in expectation + exact per-sample semantics) and freeze flags (frozen
subtrees receive strictly zero updates)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.models import intern_vit
from v2pe_tpu.models.params import init_vlm_params
from v2pe_tpu.train.optimizer import (TrainConfig, build_optimizer,
                                      freeze_mask_tree)
from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch
from v2pe_tpu.train.train_step import make_train_step


def test_drop_path_matches_torch_semantics():
    """Per-sample Bernoulli keep, scaled by 1/keep_prob: zero rows are fully
    zeroed, kept rows are x/keep (timm DropPath, the dep wrapped at
    modeling_intern_vit.py:213-214)."""
    x = jnp.ones((512, 3, 4), jnp.float32)
    rate = 0.3
    out = intern_vit.drop_path(x, rate, jax.random.PRNGKey(0))
    out = np.asarray(out)
    row_means = out.mean(axis=(1, 2))
    kept = row_means > 0
    # kept rows are exactly 1/keep_prob
    np.testing.assert_allclose(row_means[kept], 1.0 / (1 - rate), rtol=1e-6)
    # dropped rows are exactly zero
    np.testing.assert_allclose(row_means[~kept], 0.0)
    # expectation preserved (binomial CI at n=512)
    assert abs(out.mean() - 1.0) < 0.1
    # rate=0 is identity-like: everything kept
    out0 = intern_vit.drop_path(x, 0.0, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x))


def _vision_cfg(rate):
    return VisionConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=4, num_attention_heads=2,
                        image_size=56, patch_size=14, drop_path_rate=rate)


def test_vision_forward_drop_path_train_vs_eval():
    from v2pe_tpu.models.params import init_vision_params

    cfg = _vision_cfg(0.8)
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    px = jnp.asarray(np.random.RandomState(0).randn(2, 3, 56, 56),
                     jnp.float32)
    eval_out = intern_vit.vision_forward(params, cfg, px, attn_impl="jnp")
    # no rng -> deterministic, equal runs
    eval_out2 = intern_vit.vision_forward(params, cfg, px, attn_impl="jnp")
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))
    # training with a high rate differs from eval (stochastic depth active)
    train_out = intern_vit.vision_forward(
        params, cfg, px, attn_impl="jnp",
        drop_path_rng=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(train_out), np.asarray(eval_out))
    # layer 0 has rate 0 by the linear schedule, later layers ramp to 0.8
    # (modeling_intern_vit.py:245) — different keys give different outputs
    train_out2 = intern_vit.vision_forward(
        params, cfg, px, attn_impl="jnp",
        drop_path_rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(train_out), np.asarray(train_out2))


def _tiny_vlm():
    return VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=112, patch_size=14),
        llm=LLMConfig(vocab_size=92553, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2))


# one vision-freeze + one llm-freeze spec stay in the default tier; the
# other two combinations ride the slow tier (each param is a full
# train-step compile; the masking logic is shared across specs)
@pytest.mark.parametrize("spec,frozen_prefixes,trainable_probe", [
    (dict(freeze_backbone=True), ["vision/"], "llm/layers/wqkv_kernel"),
    (dict(freeze_llm=True), ["llm/"], "vision/layers/qkv_kernel"),
    pytest.param(dict(freeze_mlp=True), ["mlp1/"],
                 "llm/layers/wqkv_kernel", marks=pytest.mark.slow),
    pytest.param(dict(freeze_llm=True, unfreeze_lm_head=True),
                 ["llm/layers/"], "llm/output_kernel",
                 marks=pytest.mark.slow),
])
def test_freeze_flags_zero_updates(spec, frozen_prefixes, trainable_probe):
    cfg = _tiny_vlm()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10,
                     **spec)
    tx = build_optimizer(tc, params)
    opt_state = tx.init(params)
    batch = make_synthetic_batch(cfg, 2, 128, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step = make_train_step(cfg, tx, None, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=False, donate=False)
    p1, o1, _ = step(params, opt_state, batch)
    p2, _, _ = step(p1, o1, batch)  # step 2: lr nonzero after warmup

    flat0 = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat2 = dict(jax.tree_util.tree_flatten_with_path(p2)[0])
    moved_any_trainable = False
    for path in flat0:
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        a, b = np.asarray(flat0[path]), np.asarray(flat2[path])
        frozen = any(pstr.startswith(f) for f in frozen_prefixes)
        if spec.get("unfreeze_lm_head") and pstr == "llm/output_kernel":
            frozen = False
        if frozen:
            np.testing.assert_array_equal(a, b, err_msg=pstr)
        elif pstr == trainable_probe:
            moved_any_trainable = not np.array_equal(a, b)
    assert moved_any_trainable, f"{trainable_probe} did not train"


@pytest.mark.slow  # vision-tower freeze masking stays default via test_freeze_flags_zero_updates[spec1]
def test_unfreeze_vit_layers_partial():
    """freeze_backbone + unfreeze_vit_layers=-1: only the LAST ViT layer
    trains (internvl_chat_finetune.py:1398-1400)."""
    cfg = _tiny_vlm()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10,
                     freeze_backbone=True, unfreeze_vit_layers=-1)
    mask = freeze_mask_tree(params, tc)
    m = np.asarray(mask["vision"]["layers"]["qkv_kernel"]).reshape(-1)
    assert m.tolist() == [0.0, 1.0]  # 2 layers: first frozen, last trains
    assert float(np.asarray(mask["vision"]["embeddings"]["patch_kernel"])) \
        == 0.0
    assert float(np.asarray(mask["llm"]["layers"]["wqkv_kernel"])) == 1.0

    tx = build_optimizer(tc, params)
    opt_state = tx.init(params)
    batch = make_synthetic_batch(cfg, 2, 128, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step = make_train_step(cfg, tx, None, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=False, donate=False)
    p1, o1, _ = step(params, opt_state, batch)
    p2, _, _ = step(p1, o1, batch)
    qkv0 = np.asarray(params["vision"]["layers"]["qkv_kernel"])
    qkv2 = np.asarray(p2["vision"]["layers"]["qkv_kernel"])
    np.testing.assert_array_equal(qkv0[0], qkv2[0])   # layer 0 frozen
    assert not np.array_equal(qkv0[1], qkv2[1])       # layer 1 trains


@pytest.mark.slow  # heavy train-step compile; drop-path math is unit-covered in test_intern_vit.py
def test_drop_path_through_train_step():
    """A full train step with drop_path_rate>0 + rng runs and yields a
    different loss than the deterministic step (rate high enough to bite)."""
    cfg = _tiny_vlm()
    cfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision, drop_path_rate=0.9))
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(tc, params)
    opt_state = tx.init(params)
    batch = make_synthetic_batch(cfg, 2, 128, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step = make_train_step(cfg, tx, None, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=False, donate=False)
    _, _, m_det = step(params, opt_state, batch)
    _, _, m_dp = step(params, opt_state, batch, jax.random.PRNGKey(9))
    assert np.isfinite(float(m_dp["loss"]))
    assert float(m_dp["loss"]) != float(m_det["loss"])
