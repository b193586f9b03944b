"""Export framework checkpoints back to the HF torch layout.

The reverse of ``models/params.py``'s converters — the ``save_pretrained``
analogue the reference gets from HF Trainer (internvl_chat_finetune.py
saves checkpoints InternVLChatModel.from_pretrained can reload). A model
fine-tuned here can be handed back to the reference/HF ecosystem: the
state dict this produces round-trips bit-exactly through
``convert_torch_state_dict`` and uses the exact key names the reference's
``modeling_internvl_chat.py`` modules expose, including the fused
interleaved ``wqkv`` GQA layout for InternLM2 (modeling_internlm2.py:
576-592) and the split/repacked layouts for the composite-LLM dispatch
branches (qwen2 / llama separate q/k/v; phi3 fused qkv_proj +
gate_up_proj — modeling_internvl_chat.py:108-117).

Config/tokenizer files are not synthesized: the intended workflow is to
copy the original HF checkpoint dir (which carries config.json, tokenizer,
remote code) and replace its weights with the exported safetensors —
`tools/export_hf.py` automates that.
"""

from __future__ import annotations

import numpy as np

from v2pe_tpu.core.config import VLMConfig


def _f32(a):
    from v2pe_tpu.ops.quantized_matmul import QuantizedWeight

    if isinstance(a, QuantizedWeight):  # dequantize int8-serving weights
        a = (np.asarray(a.q, np.float32)
             * np.asarray(a.scale, np.float32))[..., :a.n_out]
    return np.asarray(a).astype(np.float32)


def _slice_layer(w, i):
    from v2pe_tpu.ops.quantized_matmul import QuantizedWeight

    if isinstance(w, QuantizedWeight):  # layer-stacked children
        return QuantizedWeight(w.q[i], w.scale[i], w.n_out)
    return w[i]


def _per_layer(sd, layers, pattern, name, i, transpose=False):
    t = _f32(_slice_layer(layers[name], i))
    sd[pattern.format(i=i)] = t.T if transpose else t


def export_vision_state_dict(vision: dict, cfg, sd: dict) -> None:
    vc = cfg
    D, P, C = vc.hidden_size, vc.patch_size, vc.num_channels
    emb = vision["embeddings"]
    sd["vision_model.embeddings.class_embedding"] = \
        _f32(emb["class_embedding"]).reshape(1, 1, D)
    sd["vision_model.embeddings.patch_embedding.weight"] = \
        _f32(emb["patch_kernel"]).T.reshape(D, C, P, P)
    sd["vision_model.embeddings.patch_embedding.bias"] = \
        _f32(emb["patch_bias"])
    sd["vision_model.embeddings.position_embedding"] = \
        _f32(emb["position_embedding"])
    ls = vision["layers"]
    base = "vision_model.encoder.layers.{i}."
    for i in range(vc.num_hidden_layers):
        _per_layer(sd, ls, base + "norm1.weight", "norm1", i)
        _per_layer(sd, ls, base + "norm2.weight", "norm2", i)
        _per_layer(sd, ls, base + "ls1", "ls1", i)
        _per_layer(sd, ls, base + "ls2", "ls2", i)
        _per_layer(sd, ls, base + "attn.qkv.weight", "qkv_kernel", i, True)
        _per_layer(sd, ls, base + "attn.proj.weight", "proj_kernel", i, True)
        _per_layer(sd, ls, base + "attn.proj.bias", "proj_bias", i)
        _per_layer(sd, ls, base + "mlp.fc1.weight", "fc1_kernel", i, True)
        _per_layer(sd, ls, base + "mlp.fc1.bias", "fc1_bias", i)
        _per_layer(sd, ls, base + "mlp.fc2.weight", "fc2_kernel", i, True)
        _per_layer(sd, ls, base + "mlp.fc2.bias", "fc2_bias", i)
        if vc.qkv_bias:
            _per_layer(sd, ls, base + "attn.qkv.bias", "qkv_bias", i)
        if vc.norm_type == "layer_norm":
            _per_layer(sd, ls, base + "norm1.bias", "norm1_bias", i)
            _per_layer(sd, ls, base + "norm2.bias", "norm2_bias", i)
        if vc.qk_normalization:
            _per_layer(sd, ls, base + "attn.q_norm.weight", "q_norm", i)
            _per_layer(sd, ls, base + "attn.k_norm.weight", "k_norm", i)


def _unpack_wqkv(wqkv_t: np.ndarray, lc):
    """Fused interleaved (D, qkv_out) kernel -> HF (q, k, v) .weight
    matrices ((Hq*hd, D), (Hkv*hd, D), (Hkv*hd, D))."""
    Hkv, hd, D = lc.num_key_value_heads, lc.head_dim, lc.hidden_size
    G = lc.num_key_value_groups
    w = wqkv_t.T.reshape(Hkv, G + 2, hd, D)
    q = w[:, :G].reshape(-1, D)
    k = w[:, G].reshape(-1, D)
    v = w[:, G + 1].reshape(-1, D)
    return q, k, v


def _unpack_wqkv_bias(b: np.ndarray, lc):
    Hkv, hd = lc.num_key_value_heads, lc.head_dim
    G = lc.num_key_value_groups
    b = b.reshape(Hkv, G + 2, hd)
    return (b[:, :G].reshape(-1), b[:, G].reshape(-1),
            b[:, G + 1].reshape(-1))


def export_llm_state_dict(llm: dict, lc, sd: dict,
                          prefix: str = "language_model.") -> None:
    L = lc.num_hidden_layers
    ls = llm["layers"]
    if lc.arch == "internlm2":
        base = prefix + "model.layers.{i}."
        for i in range(L):
            _per_layer(sd, ls, base + "attention_norm.weight",
                       "attention_norm", i)
            _per_layer(sd, ls, base + "ffn_norm.weight", "ffn_norm", i)
            _per_layer(sd, ls, base + "attention.wqkv.weight",
                       "wqkv_kernel", i, True)
            _per_layer(sd, ls, base + "attention.wo.weight",
                       "wo_kernel", i, True)
            _per_layer(sd, ls, base + "feed_forward.w1.weight",
                       "w1_kernel", i, True)
            _per_layer(sd, ls, base + "feed_forward.w3.weight",
                       "w3_kernel", i, True)
            _per_layer(sd, ls, base + "feed_forward.w2.weight",
                       "w2_kernel", i, True)
            if lc.bias:
                _per_layer(sd, ls, base + "attention.wqkv.bias",
                           "wqkv_bias", i)
                _per_layer(sd, ls, base + "attention.wo.bias", "wo_bias", i)
        sd[prefix + "model.tok_embeddings.weight"] = \
            _f32(llm["tok_embeddings"])
        sd[prefix + "model.norm.weight"] = _f32(llm["norm"])
        sd[prefix + "output.weight"] = _f32(llm["output_kernel"]).T
        return

    # composite-LLM dispatch branches share HF llama-style module names
    base = prefix + "model.layers.{i}."
    for i in range(L):
        _per_layer(sd, ls, base + "input_layernorm.weight",
                   "attention_norm", i)
        _per_layer(sd, ls, base + "post_attention_layernorm.weight",
                   "ffn_norm", i)
        _per_layer(sd, ls, base + "self_attn.o_proj.weight",
                   "wo_kernel", i, True)
        _per_layer(sd, ls, base + "mlp.down_proj.weight", "w2_kernel", i,
                   True)
        q, k, v = _unpack_wqkv(_f32(_slice_layer(ls["wqkv_kernel"], i)), lc)
        w1t = _f32(_slice_layer(ls["w1_kernel"], i)).T
        w3t = _f32(_slice_layer(ls["w3_kernel"], i)).T
        if lc.arch in ("qwen2", "llama"):
            sd[base.format(i=i) + "self_attn.q_proj.weight"] = q
            sd[base.format(i=i) + "self_attn.k_proj.weight"] = k
            sd[base.format(i=i) + "self_attn.v_proj.weight"] = v
            sd[base.format(i=i) + "mlp.gate_proj.weight"] = w1t
            sd[base.format(i=i) + "mlp.up_proj.weight"] = w3t
            if lc.qkv_bias:
                qb, kb, vb = _unpack_wqkv_bias(_f32(ls["wqkv_bias"][i]), lc)
                sd[base.format(i=i) + "self_attn.q_proj.bias"] = qb
                sd[base.format(i=i) + "self_attn.k_proj.bias"] = kb
                sd[base.format(i=i) + "self_attn.v_proj.bias"] = vb
        elif lc.arch == "phi3":
            sd[base.format(i=i) + "self_attn.qkv_proj.weight"] = \
                np.concatenate([q, k, v], axis=0)
            sd[base.format(i=i) + "mlp.gate_up_proj.weight"] = \
                np.concatenate([w1t, w3t], axis=0)
        else:
            raise NotImplementedError(f"export for arch {lc.arch!r}")
    sd[prefix + "model.embed_tokens.weight"] = _f32(llm["tok_embeddings"])
    sd[prefix + "model.norm.weight"] = _f32(llm["norm"])
    sd[prefix + "lm_head.weight"] = _f32(llm["output_kernel"]).T


def export_torch_state_dict(params: dict, cfg: VLMConfig,
                            lora=None) -> dict:
    """Full InternVLChatModel state dict (numpy float32 values, HF key
    names); round-trips through ``convert_torch_state_dict``.

    ``lora``: an adapter tree from a --use_llm_lora/--use_backbone_lora
    training run — merged exactly into the base weights before export, the
    analogue of peft's merge_and_unload at save time."""
    if lora is not None:
        import jax

        from v2pe_tpu.models.lora import merge_lora

        params = jax.jit(merge_lora)(params, lora)
    sd: dict = {}
    export_vision_state_dict(params["vision"], cfg.vision, sd)
    export_llm_state_dict(params["llm"], cfg.llm, sd)
    m = params["mlp1"]
    sd["mlp1.0.weight"] = _f32(m["ln_weight"])
    sd["mlp1.0.bias"] = _f32(m["ln_bias"])
    sd["mlp1.1.weight"] = _f32(m["fc1_kernel"]).T
    sd["mlp1.1.bias"] = _f32(m["fc1_bias"])
    sd["mlp1.3.weight"] = _f32(m["fc2_kernel"]).T
    sd["mlp1.3.bias"] = _f32(m["fc2_bias"])
    return sd


def save_safetensors(sd: dict, path: str, dtype: str = "bfloat16") -> None:
    """Write an exported state dict as a single HF safetensors file."""
    import torch
    from safetensors.torch import save_file

    td = {"bfloat16": torch.bfloat16, "float16": torch.float16,
          "float32": torch.float32}[dtype]
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)).to(td)
               for k, v in sd.items()}
    save_file(tensors, path, metadata={"format": "pt"})
