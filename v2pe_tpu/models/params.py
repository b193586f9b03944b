"""Parameter initialization and HF/torch checkpoint conversion.

Pytree layout (all linears stored as (in, out) for ``x @ W``; torch stores
(out, in), so the converter transposes):

vision:
  embeddings: class_embedding (D,), patch_kernel (C*P*P, D) [(c,kh,kw) flat
    order], patch_bias (D,), position_embedding (1, 1+N, D)
  layers (stacked over L): norm1[,_bias], norm2[,_bias], ls1, ls2,
    qkv_kernel (D, 3D), qkv_bias (3D,), q_norm/k_norm (D,) [if qk_norm],
    proj_kernel, proj_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias
llm:
  tok_embeddings (V, D)
  layers (stacked over L): attention_norm, ffn_norm, wqkv_kernel
    (D, (Hkv*(2+G))*hd) [interleaved GQA layout preserved exactly —
    modeling_internlm2.py:576-592], wqkv_bias?, wo_kernel, wo_bias?,
    w1_kernel, w3_kernel, w2_kernel
  norm (D,), output_kernel (D, V)
mlp1: ln_weight, ln_bias, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig


# --------------------------------------------------------------------------
# Random init (used for debug-size models; real runs convert a checkpoint)
# --------------------------------------------------------------------------


def _dense(key, shape, dtype, scale=0.02):
    return (scale * jax.random.normal(key, shape, jnp.float32)).astype(dtype)


def init_vision_params(key, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    D, I = cfg.hidden_size, cfg.intermediate_size
    L = cfg.num_hidden_layers
    P, C = cfg.patch_size, cfg.num_channels
    n_pos = cfg.num_patches_per_side ** 2 + 1

    layers = {
        "norm1": jnp.ones((L, D), dtype),
        "norm2": jnp.ones((L, D), dtype),
        "ls1": jnp.full((L, D), cfg.initializer_factor, dtype),
        "ls2": jnp.full((L, D), cfg.initializer_factor, dtype),
        "qkv_kernel": _dense(keys[0], (L, D, 3 * D), dtype),
        "proj_kernel": _dense(keys[1], (L, D, D), dtype),
        "proj_bias": jnp.zeros((L, D), dtype),
        "fc1_kernel": _dense(keys[2], (L, D, I), dtype),
        "fc1_bias": jnp.zeros((L, I), dtype),
        "fc2_kernel": _dense(keys[3], (L, I, D), dtype),
        "fc2_bias": jnp.zeros((L, D), dtype),
    }
    if cfg.qkv_bias:
        layers["qkv_bias"] = jnp.zeros((L, 3 * D), dtype)
    if cfg.norm_type == "layer_norm":
        layers["norm1_bias"] = jnp.zeros((L, D), dtype)
        layers["norm2_bias"] = jnp.zeros((L, D), dtype)
    if cfg.qk_normalization:
        layers["q_norm"] = jnp.ones((L, D), dtype)
        layers["k_norm"] = jnp.ones((L, D), dtype)

    return {
        "embeddings": {
            "class_embedding": _dense(keys[4], (D,), dtype, 1.0),
            "patch_kernel": _dense(keys[5], (C * P * P, D), dtype),
            "patch_bias": jnp.zeros((D,), dtype),
            "position_embedding": _dense(keys[6], (1, n_pos, D), dtype, 1.0),
        },
        "layers": layers,
    }


def init_llm_params(key, cfg: LLMConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    L = cfg.num_hidden_layers
    qkv_out = (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) \
        * cfg.head_dim

    layers = {
        "attention_norm": jnp.ones((L, D), dtype),
        "ffn_norm": jnp.ones((L, D), dtype),
        "wqkv_kernel": _dense(keys[0], (L, D, qkv_out), dtype),
        "wo_kernel": _dense(keys[1], (L, cfg.num_attention_heads *
                                      cfg.head_dim, D), dtype),
        "w1_kernel": _dense(keys[2], (L, D, I), dtype),
        "w3_kernel": _dense(keys[3], (L, D, I), dtype),
        "w2_kernel": _dense(keys[4], (L, I, D), dtype),
    }
    if cfg.bias or cfg.qkv_bias:
        layers["wqkv_bias"] = jnp.zeros((L, qkv_out), dtype)
    if cfg.bias:
        layers["wo_bias"] = jnp.zeros((L, D), dtype)

    return {
        "tok_embeddings": _dense(keys[5], (V, D), dtype),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "output_kernel": _dense(keys[6], (D, V), dtype),
    }


def init_vlm_params(key, cfg: VLMConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    vit_hidden = cfg.vision.hidden_size * int(1 / cfg.downsample_ratio) ** 2
    llm_hidden = cfg.llm.hidden_size
    return {
        "vision": init_vision_params(k1, cfg.vision, dtype),
        "llm": init_llm_params(k2, cfg.llm, dtype),
        "mlp1": {
            "ln_weight": jnp.ones((vit_hidden,), dtype),
            "ln_bias": jnp.zeros((vit_hidden,), dtype),
            "fc1_kernel": _dense(jax.random.fold_in(k3, 0),
                                 (vit_hidden, llm_hidden), dtype),
            "fc1_bias": jnp.zeros((llm_hidden,), dtype),
            "fc2_kernel": _dense(jax.random.fold_in(k3, 1),
                                 (llm_hidden, llm_hidden), dtype),
            "fc2_bias": jnp.zeros((llm_hidden,), dtype),
        },
    }


# --------------------------------------------------------------------------
# Torch / HF safetensors conversion
# --------------------------------------------------------------------------


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().float().cpu().numpy()
    return np.asarray(t)


def _stack(sd: dict, pattern: str, L: int, transform=None):
    """Stack per-layer tensors matched by pattern with {i} placeholder."""
    out = []
    for i in range(L):
        t = _np(sd[pattern.format(i=i)])
        if transform is not None:
            t = transform(t)
        out.append(t)
    return np.stack(out)


def convert_qwen2_llm(sd: dict, lc, prefix: str = "") -> dict:
    """Convert an HF Qwen2ForCausalLM (or LlamaForCausalLM — identical
    module names, no qkv bias) state dict into this framework's decoder
    pytree by REPACKING the separate q/k/v projections into the fused
    interleaved ``wqkv`` layout (modeling_internvl_chat.py:108-117
    dispatches Qwen2ForCausalLM/LlamaForCausalLM; split_wqkv's q-head ->
    kv-head mapping ``h // G`` equals theirs, so only the weight layout
    changes — the whole InternLM2 compute path, caches and kernels
    included, is reused).

    ``prefix``: '' for a bare *ForCausalLM, 'language_model.' inside an
    InternVLChatModel state dict."""
    L = lc.num_hidden_layers
    Hq, Hkv, hd, D = (lc.num_attention_heads, lc.num_key_value_heads,
                      lc.head_dim, lc.hidden_size)
    G = lc.num_key_value_groups
    qkv_out = (Hq + 2 * Hkv) * hd
    if lc.arch == "qwen2":
        assert lc.qkv_bias and not lc.bias, \
            "qwen2 biases q/k/v but not o_proj (qkv_bias=True, bias=False)"
    else:
        assert lc.arch == "llama" and not lc.qkv_bias and not lc.bias

    def fuse_w(i):
        q = _np(sd[f"{prefix}model.layers.{i}.self_attn.q_proj.weight"])
        k = _np(sd[f"{prefix}model.layers.{i}.self_attn.k_proj.weight"])
        v = _np(sd[f"{prefix}model.layers.{i}.self_attn.v_proj.weight"])
        w = np.concatenate([q.reshape(Hkv, G, hd, D),
                            k.reshape(Hkv, 1, hd, D),
                            v.reshape(Hkv, 1, hd, D)], axis=1)
        return w.reshape(qkv_out, D).T

    def fuse_b(i):
        q = _np(sd[f"{prefix}model.layers.{i}.self_attn.q_proj.bias"])
        k = _np(sd[f"{prefix}model.layers.{i}.self_attn.k_proj.bias"])
        v = _np(sd[f"{prefix}model.layers.{i}.self_attn.v_proj.bias"])
        b = np.concatenate([q.reshape(Hkv, G, hd), k.reshape(Hkv, 1, hd),
                            v.reshape(Hkv, 1, hd)], axis=1)
        return b.reshape(qkv_out)

    T = np.transpose
    layers = {
        "attention_norm": _stack(
            sd, prefix + "model.layers.{i}.input_layernorm.weight", L),
        "ffn_norm": _stack(
            sd, prefix + "model.layers.{i}.post_attention_layernorm.weight",
            L),
        "wqkv_kernel": np.stack([fuse_w(i) for i in range(L)]),
        "wo_kernel": _stack(
            sd, prefix + "model.layers.{i}.self_attn.o_proj.weight", L, T),
        "w1_kernel": _stack(
            sd, prefix + "model.layers.{i}.mlp.gate_proj.weight", L, T),
        "w3_kernel": _stack(
            sd, prefix + "model.layers.{i}.mlp.up_proj.weight", L, T),
        "w2_kernel": _stack(
            sd, prefix + "model.layers.{i}.mlp.down_proj.weight", L, T),
    }
    if lc.qkv_bias:
        layers["wqkv_bias"] = np.stack([fuse_b(i) for i in range(L)])
    embed = _np(sd[f"{prefix}model.embed_tokens.weight"])
    head_key = f"{prefix}lm_head.weight"
    output = _np(sd[head_key]).T if head_key in sd else embed.T  # tied
    return {
        "tok_embeddings": embed,
        "layers": layers,
        "norm": _np(sd[f"{prefix}model.norm.weight"]),
        "output_kernel": output,
    }


def convert_phi3_llm(sd: dict, lc, prefix: str = "") -> dict:
    """Convert an HF Phi3ForCausalLM state dict (the reference's fourth
    composite-LLM branch, modeling_internvl_chat.py:112-113): Phi3 fuses
    q/k/v into one ``qkv_proj`` in [q; k; v] CONCATENATED order and the
    MLP gate/up into ``gate_up_proj`` — both are split here and the q/k/v
    repacked into the interleaved wqkv layout (see convert_qwen2_llm).
    Long-context 'su'/longrope scaling is not converted (no V2PE
    checkpoint uses Phi3; gate at the config level)."""
    L = lc.num_hidden_layers
    Hq, Hkv, hd, D = (lc.num_attention_heads, lc.num_key_value_heads,
                      lc.head_dim, lc.hidden_size)
    G = lc.num_key_value_groups
    qkv_out = (Hq + 2 * Hkv) * hd
    assert lc.arch == "phi3" and not lc.qkv_bias and not lc.bias

    def fuse_w(i):
        w = _np(sd[f"{prefix}model.layers.{i}.self_attn.qkv_proj.weight"])
        q, k, v = (w[:Hq * hd], w[Hq * hd:(Hq + Hkv) * hd],
                   w[(Hq + Hkv) * hd:])
        out = np.concatenate([q.reshape(Hkv, G, hd, D),
                              k.reshape(Hkv, 1, hd, D),
                              v.reshape(Hkv, 1, hd, D)], axis=1)
        return out.reshape(qkv_out, D).T

    def gate_up(i, part):
        w = _np(sd[f"{prefix}model.layers.{i}.mlp.gate_up_proj.weight"])
        I = lc.intermediate_size
        return (w[:I] if part == 0 else w[I:]).T

    T = np.transpose
    layers = {
        "attention_norm": _stack(
            sd, prefix + "model.layers.{i}.input_layernorm.weight", L),
        "ffn_norm": _stack(
            sd, prefix + "model.layers.{i}.post_attention_layernorm.weight",
            L),
        "wqkv_kernel": np.stack([fuse_w(i) for i in range(L)]),
        "wo_kernel": _stack(
            sd, prefix + "model.layers.{i}.self_attn.o_proj.weight", L, T),
        "w1_kernel": np.stack([gate_up(i, 0) for i in range(L)]),
        "w3_kernel": np.stack([gate_up(i, 1) for i in range(L)]),
        "w2_kernel": _stack(
            sd, prefix + "model.layers.{i}.mlp.down_proj.weight", L, T),
    }
    embed = _np(sd[f"{prefix}model.embed_tokens.weight"])
    head_key = f"{prefix}lm_head.weight"
    output = _np(sd[head_key]).T if head_key in sd else embed.T
    return {
        "tok_embeddings": embed,
        "layers": layers,
        "norm": _np(sd[f"{prefix}model.norm.weight"]),
        "output_kernel": output,
    }


def convert_torch_state_dict(sd: dict, cfg: VLMConfig,
                             dtype=jnp.float32) -> dict:
    """Convert an InternVLChatModel torch state dict (HF layout) into our
    pytree. Handles the fused wqkv GQA interleaving by plain copy (layout is
    preserved) and transposes all linears to (in, out)."""
    vc, lc = cfg.vision, cfg.llm
    T = np.transpose

    # ---------------- vision tower
    pk = _np(sd["vision_model.embeddings.patch_embedding.weight"])  # (D,C,P,P)
    patch_kernel = pk.reshape(vc.hidden_size, -1).T  # (C*P*P, D), (c,kh,kw)

    vlayers = {
        "norm1": _stack(sd, "vision_model.encoder.layers.{i}.norm1.weight",
                        vc.num_hidden_layers),
        "norm2": _stack(sd, "vision_model.encoder.layers.{i}.norm2.weight",
                        vc.num_hidden_layers),
        "ls1": _stack(sd, "vision_model.encoder.layers.{i}.ls1",
                      vc.num_hidden_layers),
        "ls2": _stack(sd, "vision_model.encoder.layers.{i}.ls2",
                      vc.num_hidden_layers),
        "qkv_kernel": _stack(
            sd, "vision_model.encoder.layers.{i}.attn.qkv.weight",
            vc.num_hidden_layers, T),
        "proj_kernel": _stack(
            sd, "vision_model.encoder.layers.{i}.attn.proj.weight",
            vc.num_hidden_layers, T),
        "proj_bias": _stack(
            sd, "vision_model.encoder.layers.{i}.attn.proj.bias",
            vc.num_hidden_layers),
        "fc1_kernel": _stack(sd, "vision_model.encoder.layers.{i}.mlp.fc1.weight",
                             vc.num_hidden_layers, T),
        "fc1_bias": _stack(sd, "vision_model.encoder.layers.{i}.mlp.fc1.bias",
                           vc.num_hidden_layers),
        "fc2_kernel": _stack(sd, "vision_model.encoder.layers.{i}.mlp.fc2.weight",
                             vc.num_hidden_layers, T),
        "fc2_bias": _stack(sd, "vision_model.encoder.layers.{i}.mlp.fc2.bias",
                           vc.num_hidden_layers),
    }
    if vc.qkv_bias:
        vlayers["qkv_bias"] = _stack(
            sd, "vision_model.encoder.layers.{i}.attn.qkv.bias",
            vc.num_hidden_layers)
    if vc.norm_type == "layer_norm":
        vlayers["norm1_bias"] = _stack(
            sd, "vision_model.encoder.layers.{i}.norm1.bias",
            vc.num_hidden_layers)
        vlayers["norm2_bias"] = _stack(
            sd, "vision_model.encoder.layers.{i}.norm2.bias",
            vc.num_hidden_layers)
    if vc.qk_normalization:
        vlayers["q_norm"] = _stack(
            sd, "vision_model.encoder.layers.{i}.attn.q_norm.weight",
            vc.num_hidden_layers)
        vlayers["k_norm"] = _stack(
            sd, "vision_model.encoder.layers.{i}.attn.k_norm.weight",
            vc.num_hidden_layers)

    vision = {
        "embeddings": {
            "class_embedding": _np(
                sd["vision_model.embeddings.class_embedding"]).reshape(-1),
            "patch_kernel": patch_kernel,
            "patch_bias": _np(
                sd["vision_model.embeddings.patch_embedding.bias"]),
            "position_embedding": _np(
                sd["vision_model.embeddings.position_embedding"]),
        },
        "layers": vlayers,
    }

    # ---------------- language model
    if lc.arch in ("qwen2", "llama", "phi3"):
        conv = convert_phi3_llm if lc.arch == "phi3" else convert_qwen2_llm
        llm = conv(sd, lc, prefix="language_model.")
        mlp1 = {
            "ln_weight": _np(sd["mlp1.0.weight"]),
            "ln_bias": _np(sd["mlp1.0.bias"]),
            "fc1_kernel": _np(sd["mlp1.1.weight"]).T,
            "fc1_bias": _np(sd["mlp1.1.bias"]),
            "fc2_kernel": _np(sd["mlp1.3.weight"]).T,
            "fc2_bias": _np(sd["mlp1.3.bias"]),
        }
        tree = {"vision": vision, "llm": llm, "mlp1": mlp1}
        return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)
    L = lc.num_hidden_layers
    llayers = {
        "attention_norm": _stack(
            sd, "language_model.model.layers.{i}.attention_norm.weight", L),
        "ffn_norm": _stack(
            sd, "language_model.model.layers.{i}.ffn_norm.weight", L),
        "wqkv_kernel": _stack(
            sd, "language_model.model.layers.{i}.attention.wqkv.weight", L, T),
        "wo_kernel": _stack(
            sd, "language_model.model.layers.{i}.attention.wo.weight", L, T),
        "w1_kernel": _stack(
            sd, "language_model.model.layers.{i}.feed_forward.w1.weight", L, T),
        "w3_kernel": _stack(
            sd, "language_model.model.layers.{i}.feed_forward.w3.weight", L, T),
        "w2_kernel": _stack(
            sd, "language_model.model.layers.{i}.feed_forward.w2.weight", L, T),
    }
    if lc.bias:
        llayers["wqkv_bias"] = _stack(
            sd, "language_model.model.layers.{i}.attention.wqkv.bias", L)
        llayers["wo_bias"] = _stack(
            sd, "language_model.model.layers.{i}.attention.wo.bias", L)

    llm = {
        "tok_embeddings": _np(
            sd["language_model.model.tok_embeddings.weight"]),
        "layers": llayers,
        "norm": _np(sd["language_model.model.norm.weight"]),
        "output_kernel": _np(sd["language_model.output.weight"]).T,
    }

    mlp1 = {
        "ln_weight": _np(sd["mlp1.0.weight"]),
        "ln_bias": _np(sd["mlp1.0.bias"]),
        "fc1_kernel": _np(sd["mlp1.1.weight"]).T,
        "fc1_bias": _np(sd["mlp1.1.bias"]),
        "fc2_kernel": _np(sd["mlp1.3.weight"]).T,
        "fc2_bias": _np(sd["mlp1.3.bias"]),
    }

    tree = {"vision": vision, "llm": llm, "mlp1": mlp1}
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)


def load_safetensors_checkpoint(path: str, cfg: VLMConfig,
                                dtype=jnp.bfloat16) -> dict:
    """Load an HF-sharded safetensors checkpoint directory."""
    import glob
    import os

    from safetensors import safe_open

    sd = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    assert files, f"no safetensors under {path}"
    for f in files:
        with safe_open(f, framework="np") as st:
            for k in st.keys():
                sd[k] = st.get_tensor(k)
    return convert_torch_state_dict(sd, cfg, dtype)
