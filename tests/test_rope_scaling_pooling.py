"""RoPE-scaling ablation modes golden vs reference rotary classes, and the
compress-seq pooling variants vs reference modules."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import debug_tiny
from v2pe_tpu.models.compress_seq import (attention_pooling, sigmoid_gate,
                                          topk_pooling)
from v2pe_tpu.models.internlm2 import llm_forward
from v2pe_tpu.models.params import init_llm_params
from v2pe_tpu.ops.rope import compute_rope_cos_sin, scale_positions

from . import reference_util


def test_linear_scaling_matches_reference():
    reference_util.install_reference()
    import torch
    from internvl.model.internlm2.modeling_internlm2 import (
        InternLM2LinearScalingRotaryEmbedding)

    D, S, factor = 64, 40, 4.0
    rot = InternLM2LinearScalingRotaryEmbedding(
        D, max_position_embeddings=2048, base=10000, scaling_factor=factor)
    cos_ref, _ = rot(torch.zeros(1, 1, S, D), seq_len=S)

    pos = jnp.arange(S, dtype=jnp.float32)
    spos, base = scale_positions(pos, D, 10000, mode="linear",
                                 scaling_factor=factor)
    cos, _ = compute_rope_cos_sin(spos, D, base)
    np.testing.assert_allclose(np.asarray(cos), cos_ref.numpy(),
                               rtol=1e-6, atol=1e-6)


def test_dynamic_ntk_matches_reference():
    reference_util.install_reference()
    import torch
    from internvl.model.internlm2.modeling_internlm2 import (
        InternLM2DynamicNTKScalingRotaryEmbedding)

    D, max_pos, factor = 64, 32, 2.0
    S = 100  # beyond max_pos -> NTK base rescale kicks in
    rot = InternLM2DynamicNTKScalingRotaryEmbedding(
        D, max_position_embeddings=max_pos, base=10000,
        scaling_factor=factor)
    cos_ref, _ = rot(torch.zeros(1, 1, S, D), seq_len=S)

    pos = jnp.arange(S, dtype=jnp.float32)
    spos, base = scale_positions(pos, D, 10000, mode="dynamic",
                                 scaling_factor=factor,
                                 max_position_embeddings=max_pos, seq_len=S)
    cos, _ = compute_rope_cos_sin(spos, D, base)
    np.testing.assert_allclose(np.asarray(cos), cos_ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_llm_forward_rope_modes_run():
    cfg = dataclasses.replace(debug_tiny(vocab_size=100).llm,
                              rope_mode="linear", rope_scaling_factor=2.0)
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, 100)
    logits, _ = llm_forward(params, cfg, input_ids=ids, attn_impl="jnp")
    assert np.isfinite(np.asarray(logits)).all()


def test_pooling_variants_match_reference():
    reference_util.install_reference()
    import torch
    from internvl.model.internlm2.modeling_internlm2 import (
        AttentionPooling, TopKPooling)

    torch.manual_seed(0)
    B, N, C, nprime = 2, 40, 16, 5
    x = torch.randn(B, N, C)

    ap = AttentionPooling(C, nprime)
    ref = ap(x).detach().numpy()
    got = attention_pooling(
        jnp.asarray(x.numpy()),
        jnp.asarray(ap.query.weight.detach().numpy().T),
        jnp.asarray(ap.query.bias.detach().numpy()))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)

    tp = TopKPooling(C, nprime)
    ref = tp(x).detach().numpy()
    got = topk_pooling(
        jnp.asarray(x.numpy()),
        jnp.asarray(tp.query.weight.detach().numpy().T),
        jnp.asarray(tp.query.bias.detach().numpy()), nprime)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-6)


def test_sigmoid_gate():
    x1 = jnp.ones((2, 3)) * 4
    x2 = jnp.zeros((2, 3))
    out = sigmoid_gate(x1, x2, jnp.zeros((3,)))
    np.testing.assert_allclose(np.asarray(out), 2.0)  # sigmoid(0)=0.5
