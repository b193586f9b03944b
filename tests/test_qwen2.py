"""Qwen2 decoder option: logit parity vs transformers' Qwen2ForCausalLM.

The reference's composite-LLM dispatch
(``modeling_internvl_chat.py:108-117``) builds Qwen2ForCausalLM when the
checkpoint says so; this framework reuses the InternLM2 compute path with
the q/k/v projections repacked into the fused interleaved wqkv layout
(``models/params.py:convert_qwen2_llm``). The reference's
``patch/qwen2_packed_training_patch.py`` (cu_seqlens flash attention for
packed rows) is subsumed by the segment-id flash kernel, which is
arch-agnostic — tested here with a packed 2-segment row.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import LLMConfig
from v2pe_tpu.models.internlm2 import llm_forward
from v2pe_tpu.models.params import convert_qwen2_llm


def _cfgs():
    from transformers import Qwen2Config

    lc = LLMConfig(arch="qwen2", vocab_size=500, hidden_size=64,
                   intermediate_size=128, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2,
                   bias=False, qkv_bias=True, rope_theta=1_000_000.0,
                   rms_norm_eps=1e-6, rope_mode="default")
    hf = Qwen2Config(
        vocab_size=lc.vocab_size, hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_hidden_layers,
        num_attention_heads=lc.num_attention_heads,
        num_key_value_heads=lc.num_key_value_heads,
        rope_theta=lc.rope_theta, rms_norm_eps=lc.rms_norm_eps,
        max_position_embeddings=lc.max_position_embeddings,
        use_sliding_window=False, tie_word_embeddings=False,
        attn_implementation="eager")
    return lc, hf


@pytest.fixture(scope="module")
def qwen2_pair():
    import torch
    from transformers import Qwen2ForCausalLM

    lc, hf = _cfgs()
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf).eval()
    params = convert_qwen2_llm(model.state_dict(), lc)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    return lc, model, params


def test_qwen2_logit_parity(qwen2_pair):
    import torch

    lc, model, params = qwen2_pair
    rng = np.random.RandomState(0)
    ids = rng.randint(0, lc.vocab_size, (2, 11)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    pos = np.broadcast_to(np.arange(11, dtype=np.float32), (2, 11))
    out, _ = llm_forward(params, lc, input_ids=jnp.asarray(ids),
                         rope_pos_ids=jnp.asarray(pos), attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_qwen2_packed_segments_match_separate(qwen2_pair):
    """Packed-row training parity: two samples packed into one row with
    segment ids reproduce each sample's standalone logits (the behavior the
    reference gets from qwen2_packed_training_patch.py's cu_seqlens)."""
    lc, _, params = qwen2_pair
    rng = np.random.RandomState(1)
    a = rng.randint(0, lc.vocab_size, (1, 7)).astype(np.int32)
    b = rng.randint(0, lc.vocab_size, (1, 5)).astype(np.int32)
    packed = np.concatenate([a, b], axis=1)
    seg = np.asarray([[1] * 7 + [2] * 5], np.int32)
    pos = np.asarray([list(range(7)) + list(range(5))], np.float32)

    out_p, _ = llm_forward(params, lc, input_ids=jnp.asarray(packed),
                           rope_pos_ids=jnp.asarray(pos),
                           segment_ids=jnp.asarray(seg), attn_impl="jnp")
    for chunk, lo, hi in ((a, 0, 7), (b, 7, 12)):
        pos_c = np.arange(hi - lo, dtype=np.float32)[None]
        out_c, _ = llm_forward(params, lc, input_ids=jnp.asarray(chunk),
                               rope_pos_ids=jnp.asarray(pos_c),
                               attn_impl="jnp")
        np.testing.assert_allclose(np.asarray(out_p[:, lo:hi]),
                                   np.asarray(out_c), rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # heavy decode-loop compile; qwen2 logit/packing parity stays default above, prefill-decode consistency via test_decode.py
def test_qwen2_decode_matches_teacher_forced(qwen2_pair):
    """KV-cache decode (the InternLM2 cache machinery, unchanged) works for
    the qwen2 arch: token-by-token equals the full forward."""
    from v2pe_tpu.infer import paged_kv as pk

    lc, _, params = qwen2_pair
    rng = np.random.RandomState(2)
    S_prompt, S_total = 9, 14
    ids = rng.randint(0, lc.vocab_size, (1, S_total)).astype(np.int32)
    pos = np.arange(S_total, dtype=np.float32)[None]
    full, _ = llm_forward(params, lc, input_ids=jnp.asarray(ids),
                          rope_pos_ids=jnp.asarray(pos), attn_impl="jnp")

    cache = pk.PagedKVCache.zeros(lc, batch=1, n_pages=16, page_size=4,
                                  max_pages_per_row=8, dtype=jnp.float32)
    lens = jnp.asarray([S_prompt], jnp.int32)
    cache = pk.allocate_rows(cache, lens)
    _, cache = llm_forward(params, lc, input_ids=jnp.asarray(ids[:, :S_prompt]),
                           rope_pos_ids=jnp.asarray(pos[:, :S_prompt]),
                           paged_cache=cache, attn_impl="jnp")
    cache = cache._replace(lengths=lens)
    for t in range(S_prompt, S_total):
        cache = pk.allocate_rows(cache, jnp.asarray([1], jnp.int32))
        lg, cache = llm_forward(params, lc,
                                input_ids=jnp.asarray(ids[:, t:t + 1]),
                                rope_pos_ids=jnp.asarray(pos[:, t:t + 1]),
                                paged_cache=cache, attn_impl="jnp")
        cache = pk.advance_lengths(cache, 1)
        np.testing.assert_allclose(np.asarray(lg[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_llama_logit_parity():
    """LlamaForCausalLM (same module names, no qkv bias) through the same
    repacking converter — the reference's third composite-LLM branch."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    lc = LLMConfig(arch="llama", vocab_size=500, hidden_size=64,
                   intermediate_size=128, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2,
                   bias=False, qkv_bias=False, rope_theta=10_000.0,
                   rms_norm_eps=1e-6, rope_mode="default")
    hf = LlamaConfig(
        vocab_size=lc.vocab_size, hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_hidden_layers,
        num_attention_heads=lc.num_attention_heads,
        num_key_value_heads=lc.num_key_value_heads,
        rope_theta=lc.rope_theta, rms_norm_eps=lc.rms_norm_eps,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf).eval()
    params = convert_qwen2_llm(model.state_dict(), lc)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    assert "wqkv_bias" not in params["layers"]

    rng = np.random.RandomState(0)
    ids = rng.randint(0, lc.vocab_size, (2, 10)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    pos = np.broadcast_to(np.arange(10, dtype=np.float32), (2, 10))
    out, _ = llm_forward(params, lc, input_ids=jnp.asarray(ids),
                         rope_pos_ids=jnp.asarray(pos), attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_phi3_logit_parity():
    """Phi3ForCausalLM — the fourth composite-LLM branch: fused qkv_proj
    ([q; k; v] concatenated) and gate_up_proj are split and repacked."""
    import torch
    from transformers import Phi3Config, Phi3ForCausalLM

    lc = LLMConfig(arch="phi3", vocab_size=500, hidden_size=64,
                   intermediate_size=128, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2,
                   bias=False, qkv_bias=False, rope_theta=10_000.0,
                   rms_norm_eps=1e-5, rope_mode="default")
    hf = Phi3Config(
        vocab_size=lc.vocab_size, hidden_size=lc.hidden_size,
        intermediate_size=lc.intermediate_size,
        num_hidden_layers=lc.num_hidden_layers,
        num_attention_heads=lc.num_attention_heads,
        num_key_value_heads=lc.num_key_value_heads,
        rope_theta=lc.rope_theta, rms_norm_eps=lc.rms_norm_eps,
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0,
        pad_token_id=0,  # Phi3Config default 32000 > tiny test vocab
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(2)
    model = Phi3ForCausalLM(hf).eval()
    from v2pe_tpu.models.params import convert_phi3_llm

    params = convert_phi3_llm(model.state_dict(), lc)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    assert "wqkv_bias" not in params["layers"]

    rng = np.random.RandomState(4)
    ids = rng.randint(0, lc.vocab_size, (2, 10)).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids).long()).logits.numpy()
    pos = np.broadcast_to(np.arange(10, dtype=np.float32), (2, 10))
    out, _ = llm_forward(params, lc, input_ids=jnp.asarray(ids),
                         rope_pos_ids=jnp.asarray(pos), attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_qwen2_v2pe_positions_run():
    """V2PE fractional positions compose with the qwen2 arch (the reference
    only wires V2PE into InternLM2; here it is arch-independent)."""
    lc = LLMConfig(arch="qwen2", vocab_size=100, hidden_size=32,
                   intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2,
                   bias=False, qkv_bias=True)
    from v2pe_tpu.models.params import init_llm_params

    params = init_llm_params(jax.random.PRNGKey(0), lc)
    assert "wqkv_bias" in params["layers"]
    assert "wo_bias" not in params["layers"]
    ids = jnp.zeros((1, 8), jnp.int32)
    pos = jnp.asarray([[0, 1, 1.25, 1.5, 1.75, 2, 3, 4]], jnp.float32)
    out, _ = llm_forward(params, lc, input_ids=ids, rope_pos_ids=pos,
                         attn_impl="jnp")
    assert np.isfinite(np.asarray(out)).all()
