"""Video benchmark adapter (MVBench / VideoMME / MLVU-style).

Parity with the reference's video suite pattern (``eval/eval/*`` and
``eval/mvbench``): sample N frames per clip, rewrite the prompt with
``Frame{i}: <image>`` markers (like training, dataset.py:771-773), run chat
with 1-tile-per-frame budgets, score multiple-choice answers with the
shared MC matcher."""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from v2pe_tpu.evalkit.metrics import exact_match_mc


def build_video_prompt(question: str, num_frames: int,
                       options: Sequence[str] = ()) -> str:
    special = "".join(f"Frame{i + 1}: <image>\n" for i in range(num_frames))
    prompt = special + question
    if options:
        prompt += "\nOptions:\n" + "\n".join(
            f"{chr(65 + i)}. {o}" for i, o in enumerate(options))
        prompt += "\nAnswer with the option's letter from the given choices."
    return prompt


def build_infer_fn(chat_model, data_root: str, num_frames: int = 16,
                   generation_config=None,
                   rope_pos_id_version: Optional[str] = None,
                   rope_pos_id_stride: Optional[int] = None):
    """infer_fn over items {id, video, question, candidates?, answer}."""
    from v2pe_tpu.data.datasets import read_video_frames

    def infer(item: dict) -> dict:
        frames = read_video_frames(
            os.path.join(data_root, item["video"]), num_frames, "middle")
        pixel_list, num_patches_list = [], []
        for f in frames:
            pv, n = chat_model.load_pixels(f, max_num=1)
            pixel_list.append(pv)
            num_patches_list.append(n)
        pixels = np.concatenate(pixel_list) if pixel_list else None
        options = item.get("candidates") or item.get("options") or ()
        prompt = build_video_prompt(item["question"], len(frames), options)
        response = chat_model.chat(
            pixels, prompt, generation_config,
            num_patches_list=num_patches_list,
            rope_pos_id_version=rope_pos_id_version,
            rope_pos_id_stride=rope_pos_id_stride)
        return {"id": item.get("id", item["video"]),
                "question": item["question"],
                "answer": item.get("answer"),
                "options": list(options),
                "response": response}

    return infer


def score(results: List[dict]) -> dict:
    scores = []
    for r in results:
        if r.get("answer") is None:
            continue
        scores.append(float(exact_match_mc(r["response"], r["answer"],
                                           r.get("options", ()))))
    return {"accuracy": float(np.mean(scores)) if scores else 0.0,
            "n": len(scores)}
