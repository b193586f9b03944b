"""End-to-end logit parity: tiny random reference InternVLChatModel (torch,
CPU, eager attention) vs our functional JAX model with converted weights.

The reference's eager path cannot run the V2PE rotary (its V2PE module only
has the flash-attn calling convention), so full-model parity uses integer
('default') positions; the V2PE rotary itself is golden-tested in
test_rope_norms.py, and v2pe-vs-default internal consistency is tested in
test_v2pe_consistency below (stride=256 -> identical integer positions).
"""

import numpy as np
import pytest

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig

from . import reference_util

IMG_CONTEXT_ID = 920


def _tiny_cfg():
    return VLMConfig(
        vision=VisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=448, patch_size=14,
            qk_normalization=False, norm_type="layer_norm",
        ),
        llm=LLMConfig(
            vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            bias=False, rope_theta=1_000_000.0,
        ),
        rope_pos_id_version="default",
    )


def _build_reference(cfg: VLMConfig, seed=0):
    reference_util.install_reference()
    import torch
    from internvl.model.internlm2.configuration_internlm2 import InternLM2Config
    from internvl.model.internlm2.modeling_internlm2 import InternLM2ForCausalLM
    from internvl.model.internvl_chat.configuration_intern_vit import (
        InternVisionConfig)
    from internvl.model.internvl_chat.configuration_internvl_chat import (
        InternVLChatConfig)
    from internvl.model.internvl_chat.modeling_intern_vit import (
        InternVisionModel)
    from internvl.model.internvl_chat.modeling_internvl_chat import (
        InternVLChatModel)

    torch.manual_seed(seed)
    vcfg = InternVisionConfig(
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.intermediate_size,
        num_hidden_layers=cfg.vision.num_hidden_layers,
        num_attention_heads=cfg.vision.num_attention_heads,
        image_size=cfg.vision.image_size,
        patch_size=cfg.vision.patch_size,
        qk_normalization=cfg.vision.qk_normalization,
        norm_type=cfg.vision.norm_type,
        qkv_bias=cfg.vision.qkv_bias,
        use_flash_attn=False,
        drop_path_rate=0.0,
    )
    lcfg = InternLM2Config(
        vocab_size=cfg.llm.vocab_size,
        hidden_size=cfg.llm.hidden_size,
        intermediate_size=cfg.llm.intermediate_size,
        num_hidden_layers=cfg.llm.num_hidden_layers,
        num_attention_heads=cfg.llm.num_attention_heads,
        num_key_value_heads=cfg.llm.num_key_value_heads,
        bias=cfg.llm.bias,
        rope_theta=cfg.llm.rope_theta,
        attn_implementation="eager",
        # factor-1.0 linear scaling == standard RoPE; rope_scaling=None would
        # crash the reference's _init_rope in training mode (:505)
        rope_scaling={"type": "linear", "factor": 1.0},
    )
    lcfg.rope_pos_id_version = "default"
    lcfg.architectures = ["InternLM2ForCausalLM"]
    ccfg = InternVLChatConfig(
        vision_config=vcfg.to_dict(),
        llm_config=lcfg.to_dict(),
        downsample_ratio=cfg.downsample_ratio,
        template="internlm2-chat",
        ps_version="v2",
        select_layer=-1,
        force_image_size=cfg.vision.image_size,
    )
    ccfg.llm_config.attn_implementation = "eager"
    ccfg.llm_config.rope_pos_id_version = "default"
    vision = InternVisionModel(vcfg)
    llm = InternLM2ForCausalLM(ccfg.llm_config)
    model = InternVLChatModel(ccfg, vision_model=vision, language_model=llm)
    model.eval()
    model.img_context_token_id = IMG_CONTEXT_ID
    # randomize weights deterministically (HF init leaves many at defaults)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
    return model


def _make_inputs(cfg, num_tiles=2, seed=1):
    rng = np.random.RandomState(seed)
    n_img_tok = cfg.num_image_token * num_tiles
    text_a = rng.randint(5, 900, size=11)
    text_b = rng.randint(5, 900, size=7)
    ids = np.concatenate([
        text_a, [918], [IMG_CONTEXT_ID] * n_img_tok, [919], text_b,
    ]).astype(np.int64)[None]
    pixels = rng.randn(num_tiles, 3, cfg.vision.image_size,
                       cfg.vision.image_size).astype(np.float32)
    return ids, pixels


@pytest.fixture(scope="module")
def parity_setup():
    import torch

    cfg = _tiny_cfg()
    model = _build_reference(cfg)
    sd = model.state_dict()

    from v2pe_tpu.models.params import convert_torch_state_dict

    params = convert_torch_state_dict(sd, cfg)
    return cfg, model, params


def test_vit_feature_parity(parity_setup):
    import torch

    cfg, model, params = parity_setup
    _, pixels = _make_inputs(cfg)
    with torch.no_grad():
        ref = model.extract_feature(torch.from_numpy(pixels)).numpy()

    import jax.numpy as jnp
    from v2pe_tpu.models.internvl_chat import extract_feature

    got = extract_feature(params, cfg, jnp.asarray(pixels), attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-5)


def test_full_model_logit_parity(parity_setup):
    import torch

    cfg, model, params = parity_setup
    ids, pixels = _make_inputs(cfg)
    B, S = ids.shape
    position_ids = np.arange(S, dtype=np.int64)[None]
    with torch.no_grad():
        ref = model(
            pixel_values=torch.from_numpy(pixels),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones(B, S, dtype=torch.long),
            position_ids=torch.from_numpy(position_ids),
            image_flags=torch.ones(pixels.shape[0], 1, dtype=torch.long),
            return_dict=True,
        ).logits.numpy()

    import jax.numpy as jnp
    from v2pe_tpu.models.internvl_chat import forward

    out = forward(
        params, cfg,
        input_ids=jnp.asarray(ids),
        pixel_values=jnp.asarray(pixels),
        image_flags=jnp.ones((pixels.shape[0],), jnp.int32),
        rope_pos_ids=jnp.asarray(position_ids, dtype=jnp.float32),
        img_context_token_id=IMG_CONTEXT_ID,
        attn_impl="jnp",
    )
    got = np.asarray(out.logits)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_wqkv_split_matches_reference_rearrange():
    """GQA fused-QKV interleaved layout (modeling_internlm2.py:576-592)."""
    import torch
    from einops import rearrange

    import jax.numpy as jnp
    from v2pe_tpu.models.internlm2 import split_wqkv

    cfg = _tiny_cfg().llm
    B, S = 2, 5
    H, K, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                cfg.head_dim)
    gs = 2 + H // K
    x = torch.randn(B, S, K * gs * hd)
    qkv = rearrange(x, "b q (h gs d) -> b q h gs d", gs=gs, d=hd)
    q_ref = rearrange(qkv[..., : gs - 2, :], "b q h gs d -> b q (h gs) d")
    k_ref = qkv[..., -2, :]
    v_ref = qkv[..., -1, :]

    q, k, v = split_wqkv(jnp.asarray(x.numpy()), cfg)
    np.testing.assert_array_equal(np.asarray(q), q_ref.numpy())
    np.testing.assert_array_equal(np.asarray(k), k_ref.numpy())
    np.testing.assert_array_equal(np.asarray(v), v_ref.numpy())


def test_v2pe_consistency_stride256():
    """v2pe_fix with stride 256 gives integer positions == default; the model
    must produce identical logits through the float32 V2PE rotary path."""
    import jax
    import jax.numpy as jnp

    from v2pe_tpu.core.config import debug_tiny
    from v2pe_tpu.models.internlm2 import llm_forward
    from v2pe_tpu.models.params import init_llm_params

    cfg = debug_tiny(vocab_size=500).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 48), 0, 500)
    pos_int = jnp.arange(48, dtype=jnp.float32)[None]
    logits_a, _ = llm_forward(params, cfg, input_ids=ids,
                              rope_pos_ids=pos_int, attn_impl="jnp")
    logits_b, _ = llm_forward(params, cfg, input_ids=ids,
                              rope_pos_ids=None, attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=1e-6, atol=1e-6)


def test_pixel_shuffle_parity():
    import torch

    cfg = _tiny_cfg()
    model = _build_reference(cfg, seed=3)
    x = torch.randn(2, 32, 32, 64)

    import jax.numpy as jnp
    from v2pe_tpu.models.internvl_chat import pixel_shuffle

    ref = model.pixel_shuffle(x, scale_factor=0.5).numpy()
    got = pixel_shuffle(jnp.asarray(x.numpy()), 0.5, "v2")
    np.testing.assert_array_equal(np.asarray(got), ref)
