"""Video benchmark adapters: VideoMME / MVBench / MLVU + a generic fallback.

Parity with the reference video suite (``eval/eval/*``):

* shared answer extraction — every script lowercases the response, strips a
  leading "the answer is"/"answer:"/"the option is" indicator, then takes
  the FIRST alphabetic character and compares it case-insensitively to the
  gold letter (eval_videomme.py:113-125, eval_mvbench.py:133-145,
  eval_mlvu.py:123-135);
* VideoMME prompt — the fixed "Select the best answer..." instruction +
  question + raw option lines, '\\n'-joined (utils_videomme.py:271-275);
  optional subtitles block (:254-259); accuracy per task_type AND per
  duration bucket + overall (eval_videomme.py:132-159);
* MVBench prompt — "Question: ...\\n" + lettered candidates + the
  option-letter instruction, rstripped (utils_mvbench.py:583-594); accuracy
  per task_type (eval_mvbench.py:152-167);
* MLVU — same instruction block as VideoMME (utils_mlvu.py:144-147);
  accuracy per question_type (eval_mlvu.py:141-157);
* frames enter the conversation as ``Frame{i}: <image>`` markers, matching
  the training-time video prompt rewrite (dataset.py:771-773).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from v2pe_tpu.evalkit.metrics import exact_match_mc

MC_VIDEO_INSTRUCTION = (
    "Select the best answer to the following multiple-choice question "
    "based on the video. Respond with only the letter (A, B, C, or D) "
    "of the correct option.")


def extract_answer_letter(response: str) -> str:
    """The shared videomme/mvbench/mlvu extraction: lowercase, strip a
    trailing answer-indicator phrase, first alphabetic char ('' if none)."""
    response = response.lower()
    if "the answer is" in response:
        response = response.split("the answer is")[-1].strip()
    elif "answer:" in response:
        response = response.split("answer:")[-1].strip()
    elif "the option is" in response:
        response = response.split("the option is")[-1].strip()
    for ch in response:
        if ch.isalpha():
            return ch
    return ""


def judge_mc_video(response: str, answer: str) -> bool:
    """correct iff the extracted char equals the gold letter in either case
    (eval_videomme.py:125)."""
    ch = extract_answer_letter(response)
    return bool(ch) and (ch == answer or ch == answer.lower())


def videomme_prompt(question: str, options: Sequence[str],
                    subtitles: str = "") -> str:
    """utils_videomme.py:254-275 — options are pre-lettered lines."""
    parts = []
    if subtitles:
        parts += ["This video's subtitles are listed below:", subtitles]
    parts += [MC_VIDEO_INSTRUCTION, question]
    parts += list(options)
    return "\n".join(parts)


def mvbench_prompt(question: str, candidates: Sequence[str]) -> str:
    """utils_mvbench.py:583-592 qa_template (question half)."""
    out = f"Question: {question}\n"
    for i, c in enumerate(candidates):
        out += f"{chr(ord('A') + i)}. {c}\n"
    out += "Answer with the option's letter from the given choices directly."
    return out.rstrip()


def mvbench_gold(candidates: Sequence[str], answer_text: str) -> str:
    """Gold letter from the answer's candidate position
    (utils_mvbench.py:585-593)."""
    for i, c in enumerate(candidates):
        if c == answer_text:
            return chr(ord("A") + i)
    return chr(ord("A") - 1)  # reference's answer_idx = -1 quirk


def mlvu_prompt(question: str, options: Sequence[str]) -> str:
    """utils_mlvu.py:144-147 — same instruction block as VideoMME."""
    return "\n".join([MC_VIDEO_INSTRUCTION, question] + list(options))


def score_buckets(results: List[dict], bucket_keys: Sequence[str]
                  ) -> dict:
    """Per-bucket + overall accuracy over records with a bool 'correct'
    (the aggregation loops of eval_videomme.py:132-159 et al.)."""
    out: Dict[str, dict] = {}
    for key in bucket_keys:
        buckets: Dict[str, List[bool]] = {}
        for r in results:
            if key in r:
                buckets.setdefault(str(r[key]), []).append(bool(r["correct"]))
        out[key] = {k: round(sum(v) / len(v), 4)
                    for k, v in sorted(buckets.items())}
    n = len(results)
    out["overall"] = {
        "accuracy": round(sum(bool(r["correct"]) for r in results) / n, 4)
        if n else 0.0,
        "n": n}
    return out


def build_mc_video_infer_fn(benchmark: str, chat_model, data_root: str,
                            num_frames: int = 16, sample: str = "middle",
                            generation_config=None,
                            rope_pos_id_version: Optional[str] = None,
                            rope_pos_id_stride: Optional[int] = None):
    """infer_fn for videomme / mvbench / mlvu jsonl items.

    Item schemas:
      videomme {question_id, videoID|video, question, options[] (lettered
                lines), answer, task_type, duration, domain?, subtitles?}
      mvbench  {id, video, question, candidates[], answer (text),
                task_type}
      mlvu     {id, video, question, options[] (lettered lines), answer
                (letter), question_type}
    """
    from v2pe_tpu.data.datasets import read_video_frames

    def infer(item: dict) -> dict:
        video = item.get("video") or item.get("videoID")
        frames = read_video_frames(os.path.join(data_root, video),
                                   num_frames, sample)
        pixel_list, npl = [], []
        for f in frames:
            pv, n = chat_model.load_pixels(f, max_num=1)
            pixel_list.append(pv)
            npl.append(n)
        pixels = np.concatenate(pixel_list) if pixel_list else None

        if benchmark == "videomme":
            prompt = videomme_prompt(item["question"], item.get(
                "options", []), item.get("subtitles", ""))
            gold = item["answer"]
        elif benchmark == "mvbench":
            prompt = mvbench_prompt(item["question"],
                                    item.get("candidates", []))
            gold = mvbench_gold(item.get("candidates", []), item["answer"]) \
                if len(item["answer"]) > 1 else item["answer"]
        elif benchmark == "mlvu":
            prompt = mlvu_prompt(item["question"], item.get("options", []))
            gold = item["answer"]
        else:
            raise ValueError(benchmark)

        markers = "".join(f"Frame{i + 1}: <image>\n"
                          for i in range(len(frames)))
        response = chat_model.chat(
            pixels, markers + prompt, generation_config,
            num_patches_list=npl,
            rope_pos_id_version=rope_pos_id_version,
            rope_pos_id_stride=rope_pos_id_stride)
        rec = {"id": item.get("id", item.get("question_id", video)),
               "question": item["question"], "answer": gold,
               "outputs": response,
               "correct": judge_mc_video(response, gold)}
        for k in ("question_id", "task_type", "duration", "domain",
                  "question_type"):
            if k in item:
                rec[k] = item[k]
        return rec

    return infer


VIDEO_BUCKET_KEYS = {
    "videomme": ("task_type", "duration"),
    "mvbench": ("task_type",),
    "mlvu": ("question_type",),
}


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
