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


def _train_setup(backbone_r=0, llm_r=4):
    import dataclasses

    from v2pe_tpu.models.lora import build_lora
    from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer
    from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch
    from v2pe_tpu.train.train_step import make_train_step

    cfg = dataclasses.replace(
        debug_tiny(),
        vision=dataclasses.replace(debug_tiny().vision, image_size=112))
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    adapters = build_lora(jax.random.PRNGKey(1), params,
                          backbone_r=backbone_r, llm_r=llm_r)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(tc, adapters)
    opt_state = tx.init(adapters)
    step = make_train_step(cfg, tx, None, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=True, donate=False, lora=True)
    batch = make_synthetic_batch(cfg, 2, 256, tiles_per_row=1)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return cfg, params, adapters, opt_state, step, batch


def test_lora_train_step_updates_only_adapters():
    """VERDICT r3 #3: the LoRA train step must update ONLY the adapters.
    Base params are structurally frozen (a non-donated jit argument the
    optimizer never sees); adapter a/b receive updates; alpha stays a
    fixed hyperparameter."""
    cfg, params, adapters, opt_state, step, batch = _train_setup()
    params_before = jax.tree.map(np.asarray, params)
    a1, o1, m1 = step(adapters, opt_state, batch, params)
    a2, o2, m2 = step(a1, o1, batch, params)
    a3, o3, m3 = step(a2, o2, batch, params)
    assert np.isfinite(float(m1["loss"]))
    assert float(m3["loss"]) < float(m2["loss"])  # memorizing one batch

    # base params bit-identical
    for (p, before), after in zip(
            jax.tree_util.tree_leaves_with_path(params_before),
            jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(before, np.asarray(after))

    # adapters moved, alpha didn't
    def leafset(tree, name):
        return [np.asarray(v) for p, v in
                jax.tree_util.tree_leaves_with_path(tree)
                if str(getattr(p[-1], "key", p[-1])) == name]

    assert any(not np.array_equal(x, y)
               for x, y in zip(leafset(adapters, "b"), leafset(a3, "b")))
    assert any(not np.array_equal(x, y)
               for x, y in zip(leafset(adapters, "a"), leafset(a3, "a")))
    for x, y in zip(leafset(adapters, "alpha"), leafset(a3, "alpha")):
        np.testing.assert_array_equal(x, y)


def test_lora_merged_export_logit_equivalence():
    """Exporting with lora= must equal exporting pre-merged weights, and
    the converted-back model must reproduce merged logits (the peft
    merge_and_unload contract)."""
    from v2pe_tpu.models.export import export_torch_state_dict
    from v2pe_tpu.models.lora import build_lora
    from v2pe_tpu.models.params import convert_torch_state_dict

    cfg = debug_tiny(vocab_size=200)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    adapters = build_lora(jax.random.PRNGKey(1), params, backbone_r=2,
                          llm_r=4)
    # nonzero b so the merge is a real perturbation
    adapters = jax.tree.map(
        lambda x: x + 0.05 if isinstance(x, jnp.ndarray) and x.ndim == 3
        and x.shape[-2] in (2, 4) else x, adapters)
    merged = merge_lora(params, adapters)

    sd_lora = export_torch_state_dict(params, cfg, lora=adapters)
    sd_merged = export_torch_state_dict(merged, cfg)
    assert sd_lora.keys() == sd_merged.keys()
    for k in sd_lora:
        np.testing.assert_allclose(sd_lora[k], sd_merged[k], atol=1e-6)

    back = convert_torch_state_dict(sd_lora, cfg, jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 200)
    want, _ = llm_forward(merged["llm"], cfg.llm, input_ids=ids,
                          attn_impl="jnp")
    got, _ = llm_forward(back["llm"], cfg.llm, input_ids=ids,
                         attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_lora_chat_model_merges_at_load():
    """infer.chat.ChatModel(lora=...) must behave exactly like a model
    constructed from pre-merged weights."""
    from v2pe_tpu.models.lora import build_lora

    cfg = debug_tiny(vocab_size=200)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    adapters = build_lora(jax.random.PRNGKey(1), params, llm_r=4)
    adapters = jax.tree.map(
        lambda x: x + 0.05 if isinstance(x, jnp.ndarray) and x.ndim == 3
        and x.shape[-2] == 4 else x, adapters)

    class _Tok:
        def convert_tokens_to_ids(self, t):
            return 0

    from v2pe_tpu.infer.chat import ChatModel

    m = ChatModel(params, cfg, _Tok(), lora=adapters)
    merged = merge_lora(params, adapters)
    for (pa, a), b in zip(jax.tree_util.tree_leaves_with_path(m.params),
                          jax.tree_util.tree_leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
