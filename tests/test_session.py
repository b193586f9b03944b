"""ChatSession: multi-turn chat over a persistent paged cache must
reproduce the stateless history-rebuilding chat turn for turn."""

import jax
import numpy as np
import pytest

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.infer.chat import ChatModel
from v2pe_tpu.infer.generate import GenerationConfig
from v2pe_tpu.infer.session import ChatSession
from v2pe_tpu.models.params import init_vlm_params


@pytest.fixture(scope="module")
def chat_model():
    from .test_data_pipeline import _toy_tokenizer

    tok = _toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tok), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        max_dynamic_patch=2)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return ChatModel(params, cfg, tok, attn_impl="jnp")


def test_session_matches_stateless_chat(chat_model):
    from PIL import Image

    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (64, 80, 3), np.uint8))
    gc = GenerationConfig(max_new_tokens=5)

    # stateless reference: history re-prefilled every turn
    pv, _ = chat_model.load_pixels(img)
    r1_ref, hist = chat_model.chat(pv, "Describe.", gc, return_history=True)
    r2_ref = chat_model.chat(None, "More?", gc, history=hist)

    sess = ChatSession(chat_model, max_len=2048, page_size=8,
                       chunk_multiple=64)
    pv2, _ = chat_model.load_pixels(img)
    r1 = sess.send(pv2, "Describe.", gc)
    r2 = sess.send(None, "More?", gc)
    assert r1 == r1_ref
    assert r2 == r2_ref
    assert sess.consumed > 0 and len(sess.history) == 2


@pytest.mark.slow  # heavy multi-turn decode compile; session-vs-stateless parity stays default via test_session_matches_stateless_chat, multi-turn paged reuse via test_chunked_prefill defaults
def test_session_three_turns_two_images(chat_model):
    from PIL import Image

    rng = np.random.RandomState(1)
    img1 = Image.fromarray(rng.randint(0, 255, (64, 80, 3), np.uint8))
    img2 = Image.fromarray(rng.randint(0, 255, (80, 64, 3), np.uint8))
    gc = GenerationConfig(max_new_tokens=4)

    pv1, _ = chat_model.load_pixels(img1)
    r1_ref, hist = chat_model.chat(pv1, "One.", gc, return_history=True)
    pv2, _ = chat_model.load_pixels(img2)
    # stateless multi-image turn: ALL images' tiles + a num_patches_list
    # covering every <image> marker in the rebuilt prompt (the reference's
    # contract)
    pv_all = np.concatenate([pv1, pv2], axis=0)
    r2_ref, hist = chat_model.chat(
        pv_all, "<image>\nTwo.", gc, history=hist, return_history=True,
        num_patches_list=[pv1.shape[0], pv2.shape[0]])
    r3_ref = chat_model.chat(None, "Three?", gc, history=hist)

    sess = ChatSession(chat_model, max_len=4096, page_size=8,
                       chunk_multiple=64)
    pv1b, _ = chat_model.load_pixels(img1)
    pv2b, _ = chat_model.load_pixels(img2)
    assert sess.send(pv1b, "One.", gc) == r1_ref
    assert sess.send(pv2b, "Two.", gc) == r2_ref
    assert sess.send(None, "Three?", gc) == r3_ref
