"""img_emb_down_sample_ratio adaptive avg-pool parity vs torch
F.adaptive_avg_pool1d (modeling_internvl_chat.py:379-383)."""

import dataclasses

import jax
import numpy as np

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.models.internvl_chat import extract_feature
from v2pe_tpu.models.params import init_vlm_params
import pytest


@pytest.mark.slow  # torch-reference builder (VERDICT r3 #8)
def test_adaptive_pool_matches_torch():
    import torch
    import torch.nn.functional as F

    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=100, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2),
        img_emb_down_sample_ratio=2,  # 4 -> 2 tokens per tile
    )
    assert cfg.num_image_token == 2
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    pixels = np.random.RandomState(0).randn(1, 3, 56, 56).astype(np.float32)

    got = np.asarray(extract_feature(params, cfg, pixels, attn_impl="jnp"))

    cfg_full = dataclasses.replace(cfg, img_emb_down_sample_ratio=None)
    full = np.asarray(extract_feature(params, cfg_full, pixels,
                                      attn_impl="jnp"))
    ref = F.adaptive_avg_pool1d(
        torch.from_numpy(full).permute(0, 2, 1), 2).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
