"""Video eval adapter: frame pipeline + MC scoring."""

import os

import numpy as np
import pytest

from v2pe_tpu.evalkit.video import build_infer_fn, build_video_prompt, score


def test_build_video_prompt():
    p = build_video_prompt("What happens?", 3, ["run", "jump"])
    assert p.count("<image>") == 3
    assert "Frame2: <image>" in p
    assert "A. run" in p and "B. jump" in p


def test_score_mc():
    results = [
        {"response": "A", "answer": "A", "options": ["x", "y"]},
        {"response": "the y thing", "answer": "B", "options": ["x", "y thing"]},
        {"response": "C", "answer": "A", "options": ["x", "y"]},
    ]
    s = score(results)
    assert s["n"] == 3
    assert s["accuracy"] == pytest.approx(2 / 3)


def test_video_infer_end_to_end(tmp_path):
    import jax

    cv2 = pytest.importorskip("cv2")

    from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
    from v2pe_tpu.infer.chat import ChatModel
    from v2pe_tpu.infer.generate import GenerationConfig
    from v2pe_tpu.models.params import init_vlm_params

    from .test_data_pipeline import _toy_tokenizer

    # write a tiny mp4
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 48))
    rng = np.random.RandomState(0)
    for _ in range(12):
        w.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    tokenizer = _toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tokenizer), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        rope_pos_id_stride=2, max_dynamic_patch=1, use_thumbnail=False,
    )
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    model = ChatModel(params, cfg, tokenizer, attn_impl="jnp")
    infer = build_infer_fn(model, str(tmp_path), num_frames=4,
                           generation_config=GenerationConfig(
                               max_new_tokens=4))
    out = infer({"id": 0, "video": "clip.mp4", "question": "What is shown?",
                 "candidates": ["a cat", "a dog"], "answer": "a cat"})
    assert isinstance(out["response"], str)
    assert out["options"] == ["a cat", "a dog"]
