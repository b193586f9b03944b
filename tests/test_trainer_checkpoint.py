"""Trainer loop + orbax checkpoint/resume tests (tiny model, CPU)."""

import logging
import os

import jax
import numpy as np
import pytest

from v2pe_tpu.core import checkpoint as ckpt_lib
from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.data.datasets import build_datasets
from v2pe_tpu.data.packing import PackedSampleIterator
from v2pe_tpu.models.params import init_vlm_params
from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer
from v2pe_tpu.train.trainer import RunConfig, train

from .test_data_pipeline import _toy_tokenizer
from .test_datasets_packing import tokenizer, toy_dataset  # fixtures


def _cfg(vocab):
    return VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=vocab, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2),
        rope_pos_id_stride=2,
    )


def test_train_loop_with_checkpoint_resume(toy_dataset, tokenizer, tmp_path):
    cfg = _cfg(len(tokenizer))
    ctx_id = tokenizer.convert_tokens_to_ids("<IMG_CONTEXT>")

    def make_packer():
        dsets = build_datasets(
            toy_dataset, tokenizer, image_size=56, num_image_token=4,
            max_dynamic_patch=6, rope_pos_id_stride=2)
        return PackedSampleIterator(dsets, max_tokens=192,
                                    max_tiles_per_row=8, seed=5,
                                    img_context_token_id=ctx_id)

    run = RunConfig(output_dir=str(tmp_path / "out"), max_steps=4,
                    save_steps=2, save_total_limit=2, log_steps=1,
                    max_packed_tokens=192, max_tiles=8)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=4)

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    p1, _, _ = train(cfg, params, make_packer(), run, tc,
                     img_context_token_id=ctx_id, attn_impl="jnp",
                     resume=False)

    ckpts = ckpt_lib.list_checkpoints(run.output_dir)
    assert ckpts == [2, 4]

    # resume from step 2: run to 4 again, final params finite
    params2 = init_vlm_params(jax.random.PRNGKey(0), cfg)
    # drop the step-4 checkpoint so resume picks step 2
    import shutil

    shutil.rmtree(os.path.join(run.output_dir, "step_00000004"))
    p2, _, step = train(cfg, params2, make_packer(), run, tc,
                        img_context_token_id=ctx_id, attn_impl="jnp",
                        resume=True)
    flat1 = jax.tree.leaves(p1)
    flat2 = jax.tree.leaves(p2)
    for a, b in zip(flat1, flat2):
        assert np.isfinite(np.asarray(b)).all()
    # checkpoints pruned to the save_total_limit
    assert len(ckpt_lib.list_checkpoints(run.output_dir)) <= 2


def test_checkpoint_roundtrip_exact(tmp_path):
    cfg = _cfg(300)
    params = init_vlm_params(jax.random.PRNGKey(1), cfg)
    tc = TrainConfig()
    tx = build_optimizer(tc, params)
    opt_state = tx.init(params)

    import dataclasses

    cfg_saved = dataclasses.replace(cfg, rope_pos_id_stride=32)
    path = ckpt_lib.save_checkpoint(str(tmp_path), 7, params, opt_state,
                                    data_state={"cursors": {"a": 3},
                                                "epochs": {"a": 0},
                                                "rng_state": (1, (2, 3), None),
                                                "pushback_ref": ("a", 5)},
                                    cfg=cfg_saved)
    p2, o2, step, ds = ckpt_lib.restore_checkpoint(path, params, opt_state)
    assert step == 7
    assert ds["cursors"] == {"a": 3}
    assert tuple(ds["pushback_ref"]) == ("a", 5)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the pipeline config rides the checkpoint (the reference persists all
    # V2PE knobs in the HF config so eval reads them back — see
    # core/checkpoint.py); roundtrip must preserve every field
    import os

    from v2pe_tpu.core.config import VLMConfig

    with open(os.path.join(path, "config.json")) as f:
        cfg_back = VLMConfig.from_json(f.read())
    assert cfg_back == cfg_saved
    assert cfg_back.rope_pos_id_stride == 32


def test_async_saver_commit_semantics(tmp_path):
    """AsyncSaver: a step dir is invisible to list/latest until finalize
    writes the commit marker; after finalize the restore is exact; the
    next save finalizes the previous one; pruning respects the limit."""
    cfg = _cfg(300)
    params = init_vlm_params(jax.random.PRNGKey(2), cfg)
    tc = TrainConfig()
    tx = build_optimizer(tc, params)
    opt_state = tx.init(params)

    saver = ckpt_lib.AsyncSaver()
    try:
        path1 = saver.save(str(tmp_path), 1, params, opt_state,
                           data_state={"cursors": {"a": 1}},
                           save_total_limit=2, cfg=cfg)
        # orbax may still be writing; the commit marker must NOT exist yet,
        # so a crash here can't leave a resumable-looking corrupt dir
        assert not os.path.exists(os.path.join(path1, "meta.json"))
        assert ckpt_lib.latest_checkpoint(str(tmp_path)) is None

        assert saver.finalize() == path1
        assert ckpt_lib.latest_checkpoint(str(tmp_path)) == path1
        p2, o2, step, ds = ckpt_lib.restore_checkpoint(
            path1, params, opt_state)
        assert step == 1 and ds["cursors"] == {"a": 1}
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # saves 2 and 3: each save commits its predecessor; limit=2 prunes
        # step 1 once step 3 commits
        saver.save(str(tmp_path), 2, params, opt_state,
                   save_total_limit=2)
        saver.save(str(tmp_path), 3, params, opt_state,
                   save_total_limit=2)  # finalizes step 2
        assert ckpt_lib.list_checkpoints(str(tmp_path)) == [1, 2]
    finally:
        saver.close()  # finalizes step 3 + prunes step 1
    assert ckpt_lib.list_checkpoints(str(tmp_path)) == [2, 3]


def test_train_loop_lora_checkpoints_adapters(toy_dataset, tokenizer,
                                              tmp_path):
    """LoRA trainer integration (VERDICT r3 #3): checkpoints hold the
    ADAPTER tree (small), resume restores it, base weights stay frozen
    through the loop, and the returned params are merged."""
    cfg = _cfg(len(tokenizer))
    ctx_id = tokenizer.convert_tokens_to_ids("<IMG_CONTEXT>")

    def make_packer():
        dsets = build_datasets(
            toy_dataset, tokenizer, image_size=56, num_image_token=4,
            max_dynamic_patch=6, rope_pos_id_stride=2)
        return PackedSampleIterator(dsets, max_tokens=192,
                                    max_tiles_per_row=8, seed=5,
                                    img_context_token_id=ctx_id)

    run = RunConfig(output_dir=str(tmp_path / "out"), max_steps=2,
                    save_steps=2, save_total_limit=2, log_steps=1,
                    max_packed_tokens=192, max_tiles=8)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=2)

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    frozen = jax.tree.map(np.asarray, params)
    merged, _, _ = train(cfg, params, make_packer(), run, tc,
                         img_context_token_id=ctx_id, attn_impl="jnp",
                         resume=False, use_llm_lora=4, use_backbone_lora=2)

    # base weights untouched by the loop
    for a, b in zip(jax.tree.leaves(frozen), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # returned tree is merged base+adapters: same structure as params,
    # wqkv kernels differ (adapters trained), embeddings identical
    assert (jax.tree_util.tree_structure(merged)
            == jax.tree_util.tree_structure(params))
    np.testing.assert_array_equal(np.asarray(merged["llm"]["tok_embeddings"]),
                                  frozen["llm"]["tok_embeddings"])
    assert not np.array_equal(np.asarray(merged["llm"]["layers"]["wqkv_kernel"]),
                              frozen["llm"]["layers"]["wqkv_kernel"])

    # the checkpoint holds the adapter tree: restore with an adapter
    # template and merge reproduces the returned params
    from v2pe_tpu.models.lora import build_lora, merge_lora
    from v2pe_tpu.train.optimizer import build_optimizer as _bo

    tmpl = build_lora(jax.random.PRNGKey(123), params, backbone_r=2,
                      llm_r=4)
    tx = _bo(tc, tmpl)
    last = ckpt_lib.latest_checkpoint(run.output_dir)
    adapters, _, step, _ = ckpt_lib.restore_checkpoint(last, tmpl,
                                                       tx.init(tmpl))
    assert step == 2
    remerged = merge_lora(params, adapters)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(remerged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
