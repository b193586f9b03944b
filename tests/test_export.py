"""HF export (models/export.py): the state dict must round-trip bit-exactly
through convert_torch_state_dict for every decoder arch, and the
safetensors file must reload through load_safetensors_checkpoint."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from v2pe_tpu.core.config import debug_tiny
from v2pe_tpu.models.export import (export_torch_state_dict,
                                    save_safetensors)
from v2pe_tpu.models.params import (convert_torch_state_dict,
                                    init_vlm_params,
                                    load_safetensors_checkpoint)


def _cfg(arch="internlm2"):
    cfg = debug_tiny(vocab_size=256)
    qkv_bias = arch == "qwen2"
    return dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, arch=arch, qkv_bias=qkv_bias))


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert [k for k, _ in fa] == [k for k, _ in fb]
    for (kp, x), (_, y) in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=str(kp))


@pytest.mark.parametrize("arch", ["internlm2", "qwen2", "llama", "phi3"])
def test_roundtrip(arch):
    cfg = _cfg(arch)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    sd = export_torch_state_dict(params, cfg)
    back = convert_torch_state_dict(sd, cfg, jnp.float32)
    _assert_tree_equal(params, back)


def test_safetensors_file_roundtrip(tmp_path):
    cfg = _cfg()
    params = init_vlm_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    sd = export_torch_state_dict(params, cfg)
    save_safetensors(sd, str(tmp_path / "model.safetensors"),
                     dtype="float32")
    back = load_safetensors_checkpoint(str(tmp_path), cfg, jnp.float32)
    _assert_tree_equal(params, back)


def test_quantized_weights_dequantize_on_export():
    from v2pe_tpu.ops.quantized_matmul import quantize_weight

    cfg = _cfg()
    params = init_vlm_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    w = params["llm"]["layers"]["w1_kernel"]
    qw = quantize_weight(w)
    params["llm"]["layers"]["w1_kernel"] = qw
    sd = export_torch_state_dict(params, cfg)
    got = sd["language_model.model.layers.0.feed_forward.w1.weight"]
    want = (np.asarray(qw.q[0], np.float32)
            * np.asarray(qw.scale[0], np.float32))[:, :qw.n_out].T
    np.testing.assert_array_equal(got, want.astype(np.float32))
