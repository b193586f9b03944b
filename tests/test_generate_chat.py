"""Generation + chat API tests: greedy decode consistency with teacher-forced
forward, ragged batched prompts, and the end-to-end chat() surface."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.infer.chat import ChatModel
from v2pe_tpu.infer.generate import GenerationConfig, generate
from v2pe_tpu.models import internvl_chat
from v2pe_tpu.models.params import init_vlm_params

from .test_data_pipeline import _toy_tokenizer
import pytest


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


@pytest.mark.slow  # heavy decode-loop compile; teacher-forced consistency also covered by test_qwen2.py and test_decode.py defaults
def test_greedy_generate_matches_teacher_forced():
    """Greedy decode must reproduce the argmax chain of full forwards."""
    cfg = _cfg(vocab=300)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    nit = cfg.num_image_token  # 4

    ids = np.concatenate([
        np.arange(10, 20), [290], [291] * nit, [292], np.arange(30, 35),
    ]).astype(np.int32)
    S = len(ids)
    pos = np.arange(S, dtype=np.float32)
    pixels = np.random.RandomState(0).randn(1, 3, 56, 56).astype(np.float32)

    gc = GenerationConfig(max_new_tokens=6)
    tokens, n, lens = generate(
        params, cfg, gc,
        jnp.asarray(ids[None]), jnp.asarray([S], jnp.int32),
        jnp.asarray(pos[None]), jnp.asarray(pixels),
        jnp.ones((1,), jnp.int32), 291, attn_impl="jnp")
    tokens = np.asarray(tokens[0])
    assert int(n) == 6
    assert int(lens[0]) == 6

    # teacher-forced: extend the prompt with generated tokens and verify the
    # full forward's argmax at each boundary reproduces them
    cur_ids, cur_pos = ids, pos
    for t in range(6):
        out = internvl_chat.forward(
            params, cfg,
            input_ids=jnp.asarray(cur_ids[None]),
            pixel_values=jnp.asarray(pixels),
            image_flags=jnp.ones((1,), jnp.int32),
            rope_pos_ids=jnp.asarray(cur_pos[None]),
            img_context_token_id=291,
            attn_impl="jnp")
        nxt = int(np.argmax(np.asarray(out.logits[0, -1])))
        assert nxt == int(tokens[t]), f"step {t}: {nxt} vs {tokens[t]}"
        cur_ids = np.append(cur_ids, nxt).astype(np.int32)
        cur_pos = np.append(cur_pos, cur_pos[-1] + 1.0).astype(np.float32)


@pytest.mark.slow  # ragged batched-vs-single parity stays default via test_evalkit_general_e2e.py::test_pope_engine_batched_matches_sequential and engine admission tests
def test_ragged_batch_prompts_match_single():
    """Right-padded batched prompts must decode like single prompts."""
    cfg = _cfg(vocab=300)
    params = init_vlm_params(jax.random.PRNGKey(1), cfg)
    gc = GenerationConfig(max_new_tokens=4)
    pixels = np.zeros((1, 3, 56, 56), np.float32)
    flags = np.zeros((1,), np.int32)

    p1 = np.arange(10, 25).astype(np.int32)          # len 15
    p2 = np.arange(40, 48).astype(np.int32)          # len 8

    def single(p):
        toks, _, _ = generate(
            params, cfg, gc, jnp.asarray(p[None]),
            jnp.asarray([len(p)], jnp.int32),
            jnp.asarray(np.arange(len(p), dtype=np.float32)[None]),
            jnp.asarray(pixels), jnp.asarray(flags), 291, attn_impl="jnp")
        return np.asarray(toks[0])

    S = 15
    batch_ids = np.zeros((2, S), np.int32)
    batch_ids[0, :15] = p1
    batch_ids[1, :8] = p2
    pos = np.broadcast_to(np.arange(S, dtype=np.float32), (2, S)).copy()
    toks, _, _ = generate(
        params, cfg, gc, jnp.asarray(batch_ids),
        jnp.asarray([15, 8], jnp.int32), jnp.asarray(pos),
        jnp.asarray(np.concatenate([pixels, pixels])),
        jnp.asarray(np.concatenate([flags, flags])), 291, attn_impl="jnp")
    toks = np.asarray(toks)
    np.testing.assert_array_equal(toks[0], single(p1))
    np.testing.assert_array_equal(toks[1], single(p2))


def test_chat_end_to_end():
    from PIL import Image

    tokenizer = _toy_tokenizer()
    cfg = _cfg(vocab=len(tokenizer))
    params = init_vlm_params(jax.random.PRNGKey(2), cfg)
    model = ChatModel(params, cfg, tokenizer, attn_impl="jnp")

    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (100, 160, 3),
                                         dtype=np.uint8))
    pixels, n_tiles = model.load_pixels(img, max_num=4)
    assert pixels.shape[1:] == (3, 56, 56)

    gc = GenerationConfig(max_new_tokens=8)
    response, history = model.chat(
        pixels, "What is in the image?", gc, return_history=True,
        num_patches_list=[n_tiles])
    assert isinstance(response, str)
    # reference keeps the '<image>' marker in history (:446-448)
    assert history[-1][0] == "<image>\nWhat is in the image?"

    # multi-turn: second turn consumes history without error
    r2 = model.chat(pixels, "Describe more.", gc, history=history,
                    num_patches_list=[n_tiles])
    assert isinstance(r2, str)

    # text-only chat
    r3 = model.chat(None, "What is 2 plus 2?", gc)
    assert isinstance(r3, str)
