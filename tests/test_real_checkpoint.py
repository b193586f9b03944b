"""Real-checkpoint runbook (scripts/run_real_checkpoint.sh).

A user with a downloaded HF-hub snapshot (safetensors shards + HF-format
config.json + tokenizer files) must be able to point the CLI at the
directory and get architecture + V2PE settings from the checkpoint itself,
like the reference's ``InternVLChatConfig.from_pretrained`` + chat flow
(``/root/reference/pretrained/inference_test.py``). Real weights cannot be
downloaded in this environment, so the snapshot is assembled in-test with
random weights: a tiny-dim end-to-end chat smoke, config-bridge checks at
the published 2B / 8B hyperparameters, and (slow) full-shape conversions.
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.core.config import (LLMConfig, VisionConfig, VLMConfig,
                                  debug_tiny, internvl2_2b, internvl2_5_8b,
                                  is_hf_config, vlm_config_from_hf)
from v2pe_tpu.models.export import export_torch_state_dict, save_safetensors
from v2pe_tpu.models.params import init_vlm_params


def _hf_config_dict(cfg: VLMConfig, extra_top=None) -> dict:
    """Render a VLMConfig the way an HF-hub snapshot's config.json looks
    (InternVLChatConfig.to_dict(): nested llm_config/vision_config with
    `architectures`, plus HF boilerplate keys the bridge must ignore)."""
    arch_name = {v: k for k, v in
                 {"InternLM2ForCausalLM": "internlm2",
                  "Qwen2ForCausalLM": "qwen2",
                  "LlamaForCausalLM": "llama",
                  "Phi3ForCausalLM": "phi3"}.items()}[cfg.llm.arch]
    d = {
        "model_type": "internvl_chat",
        "architectures": ["InternVLChatModel"],
        "transformers_version": "4.37.2",
        "torch_dtype": "bfloat16",
        "vision_config": {
            "model_type": "intern_vit_6b",
            **{k: getattr(cfg.vision, k) for k in (
                "hidden_size", "intermediate_size", "num_hidden_layers",
                "num_attention_heads", "patch_size", "image_size",
                "qkv_bias", "qk_normalization", "norm_type",
                "layer_norm_eps", "hidden_act", "drop_path_rate")},
        },
        "llm_config": {
            "architectures": [arch_name],
            **{k: getattr(cfg.llm, k) for k in (
                "vocab_size", "hidden_size", "intermediate_size",
                "num_hidden_layers", "num_attention_heads",
                "num_key_value_heads", "hidden_act",
                "max_position_embeddings", "rms_norm_eps", "bias",
                "rope_theta", "tie_word_embeddings", "pad_token_id",
                "bos_token_id", "eos_token_id")},
            "rope_scaling": None,
        },
        "downsample_ratio": cfg.downsample_ratio,
        "template": cfg.template,
        "select_layer": cfg.select_layer,
        "ps_version": cfg.ps_version,
        "dynamic_image_size": cfg.dynamic_image_size,
        "use_thumbnail": cfg.use_thumbnail,
        "min_dynamic_patch": cfg.min_dynamic_patch,
        "max_dynamic_patch": cfg.max_dynamic_patch,
        "rope_pos_id_version": cfg.rope_pos_id_version,
        "rope_pos_id_stride": cfg.rope_pos_id_stride,
        "force_image_size": cfg.force_image_size or cfg.vision.image_size,
    }
    d.update(extra_top or {})
    return d


def test_hf_config_bridge_2b():
    want = internvl2_2b()
    d = _hf_config_dict(want)
    assert is_hf_config(d)
    got = vlm_config_from_hf(d)
    # force_image_size is spelled out in hub snapshots; equal effect
    want = dataclasses.replace(want, force_image_size=448)
    assert got == want


def test_hf_config_bridge_8b():
    want = internvl2_5_8b()
    got = vlm_config_from_hf(_hf_config_dict(want))
    assert got == dataclasses.replace(want, force_image_size=448)
    assert got.llm.num_key_value_heads == 8
    assert got.template == "internvl2_5"


def test_hf_config_bridge_vanilla_defaults():
    """A vanilla (non-V2PE) snapshot: explicit null stride + 'default'
    version must override this framework's V2PE-preset defaults, and a
    qwen2 decoder must pick up its implied qkv bias."""
    cfg = dataclasses.replace(
        internvl2_2b(),
        llm=dataclasses.replace(internvl2_2b().llm, arch="qwen2",
                                qkv_bias=True),
        rope_pos_id_version="default", rope_pos_id_stride=None)
    d = _hf_config_dict(cfg)
    del d["llm_config"]["bias"]  # Qwen2Config has no such field
    got = vlm_config_from_hf(d)
    assert got.rope_pos_id_version == "default"
    assert got.rope_pos_id_stride is None
    assert got.llm.arch == "qwen2" and got.llm.qkv_bias
    # our own flat config.json must NOT be mistaken for an HF one
    assert not is_hf_config(json.loads(cfg.to_json()))


def test_hf_config_bridge_rope_scaling():
    d = _hf_config_dict(internvl2_2b())
    d["llm_config"]["rope_scaling"] = {"type": "dynamic", "factor": 2.0}
    got = vlm_config_from_hf(d)
    assert got.llm.rope_mode == "dynamic"
    assert got.llm.rope_scaling_factor == 2.0


def _assemble_snapshot(tmp_path, cfg, n_shards=2):
    """Write an HF-layout snapshot dir: sharded safetensors + HF
    config.json + tokenizer files, exactly what huggingface-cli download
    leaves on disk."""
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    sd = export_torch_state_dict(params, cfg)
    keys = sorted(sd)
    per = -(-len(keys) // n_shards)
    for i in range(n_shards):
        shard = {k: sd[k] for k in keys[i * per:(i + 1) * per]}
        save_safetensors(
            shard,
            str(tmp_path / f"model-{i + 1:05d}-of-{n_shards:05d}.safetensors"),
            dtype="float32")
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_hf_config_dict(cfg), f)
    from tests.test_data_pipeline import _toy_tokenizer

    tok = _toy_tokenizer()
    tok.save_pretrained(str(tmp_path))
    return params


def test_hf_snapshot_chat_end_to_end(tmp_path):
    """The full runbook path: snapshot dir -> load_chat_model (config from
    the HF config.json, weights through load_safetensors_checkpoint) ->
    single-image chat returns text."""
    from PIL import Image

    from v2pe_tpu.evalkit.cli import load_chat_model
    from v2pe_tpu.infer.generate import GenerationConfig

    cfg = debug_tiny(vocab_size=256)
    # stamp non-default V2PE settings into the snapshot: chat must pick
    # them up from config.json, not from the preset
    cfg = dataclasses.replace(cfg, rope_pos_id_version="v2pe_rnd",
                              rope_pos_id_stride=32)
    _assemble_snapshot(tmp_path, cfg)

    class A:
        checkpoint = str(tmp_path)
        tokenizer = str(tmp_path)
        config_preset = "internvl2_2b"  # wrong on purpose; config.json wins
        rope_pos_id_version = None
        rope_pos_id_stride = None

    model = load_chat_model(A())
    assert model.cfg.rope_pos_id_version == "v2pe_rnd"
    assert model.cfg.rope_pos_id_stride == 32
    assert model.cfg.llm.num_hidden_layers == cfg.llm.num_hidden_layers

    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8))
    pixels, n_tiles = model.load_pixels(img, max_num=2)
    out = model.chat(pixels, "What is in the image?",
                     GenerationConfig(max_new_tokens=4),
                     num_patches_list=[n_tiles])
    assert isinstance(out, str)

    # runbook step 3: the MM-NIAH infer fn must resolve the jsonl's
    # relative images_list paths against the distribution dir (the bug
    # class: relative paths silently failing every sample in run_shard)
    from v2pe_tpu.evalkit import mm_niah

    (tmp_path / "images").mkdir()
    img.save(tmp_path / "images" / "i0.png")
    infer = mm_niah.build_infer_fn(
        model, max_tiles=2,
        generation_config=GenerationConfig(max_new_tokens=4),
        data_root=str(tmp_path))
    rec = infer({"id": 7, "context": "Ctx. <image>\n",
                 "images_list": ["images/i0.png"],
                 "question": "Needle?", "answer": "x",
                 "meta": {"context_length": 1000, "placed_depth": 0.3}})
    assert rec["id"] == 7 and isinstance(rec["response"], str)
    assert rec["context_length"] == 1000


@pytest.mark.slow
@pytest.mark.parametrize("preset", [internvl2_2b, internvl2_5_8b])
def test_full_shape_conversion(preset):
    """Converter at the published checkpoint shapes (random-free: zeros),
    2B and 8B: stacking + transposes + dtype cast must produce the exact
    init_vlm_params tree structure and shapes without shape surprises."""
    from v2pe_tpu.models.params import convert_torch_state_dict

    cfg = preset()
    shapes = jax.eval_shape(
        lambda: init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    # zero weights: np.zeros is calloc-backed, so the multi-GB full-shape
    # trees cost pages only where the converter actually writes
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    sd = export_torch_state_dict(zeros, cfg)
    del zeros
    got = convert_torch_state_dict(sd, cfg, jnp.bfloat16)
    flat_got = jax.tree_util.tree_flatten_with_path(got)[0]
    flat_want = jax.tree_util.tree_flatten_with_path(shapes)[0]
    assert [k for k, _ in flat_got] == [k for k, _ in flat_want]
    for (kp, x), (_, w) in zip(flat_got, flat_want):
        assert x.shape == w.shape and x.dtype == w.dtype, (kp, x.shape,
                                                           w.shape)
