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
    scored = [r for r in results if r.get("correct") is not None]
    out: Dict[str, dict] = {}
    for key in bucket_keys:
        buckets: Dict[str, List[bool]] = {}
        for r in scored:
            if key in r:
                vals = r[key] if isinstance(r[key], (list, tuple)) \
                    else [r[key]]  # lvbench question_type is a LIST and
                # each element counts the sample (eval_lvbench.py:130-137)
                for v in vals:
                    buckets.setdefault(str(v), []).append(bool(r["correct"]))
        out[key] = {k: round(sum(v) / len(v), 4)
                    for k, v in sorted(buckets.items())}
    n = len(scored)
    out["overall"] = {
        "accuracy": round(sum(bool(r["correct"]) for r in scored) / n, 4)
        if n else 0.0,
        "n": n}
    if len(scored) < len(results):  # gold-less records (hourvideo test set)
        out["unscored"] = len(results) - len(scored)
    return out


def build_mc_video_infer_fn(benchmark: str, chat_model, data_root: str,
                            num_frames: int = 16, sample: str = "middle",
                            generation_config=None,
                            rope_pos_id_version: Optional[str] = None,
                            rope_pos_id_stride: Optional[int] = None):
    """infer_fn for videomme / mvbench / mlvu jsonl items.

    Item schemas:
      videomme  {question_id, videoID|video, question, options[] (lettered
                 lines), answer, task_type, duration, domain?, subtitles?}
      mvbench   {id, video, question, candidates[], answer (text),
                 task_type}
      mlvu      {id, video, question, options[] (lettered lines), answer
                 (letter), question_type}
      nextqa    {id, video, question, candidates[] (5), answer (0-4 index
                 or letter), type} (utils_nextqa.py:157-185)
      perceptiontest  same as nextqa (utils_perceptiontest.py:172-190)
      lvbench   {id, video|file_path, question (options embedded), answer
                 (letter), uid, question_type (list), time_reference}
                 (utils_lvbench.py:234-255)
      longvideobench  {id, video|video_path, question, candidates[],
                 correct_choice (index) or answer, question_category}
                 (utils_longvideobench.py:125-141)
      hourvideo {id, video_uid (+ video path override), question, mcq_test,
                 answer? / correct_answer_label?, task?} — use
                 :func:`hourvideo_flatten` on the reference json
                 (eval_hourvideo.py:84-117)
    """
    from v2pe_tpu.data.datasets import read_video_frames

    def infer(item: dict) -> dict:
        video = item.get("video") or item.get("videoID") or \
            item.get("file_path") or item.get("video_path") or \
            item.get("path") or (item.get("video_uid", "") + ".mp4")
        frames = read_video_frames(os.path.join(data_root, video),
                                   num_frames, sample)
        pixel_list, npl = [], []
        for f in frames:
            pv, n = chat_model.load_pixels(f, max_num=1)
            pixel_list.append(pv)
            npl.append(n)
        pixels = np.concatenate(pixel_list) if pixel_list else None

        extra_keys = ("question_id", "task_type", "duration", "domain",
                      "question_type", "type", "question_category", "uid",
                      "time_reference", "file_path", "task", "answer_text",
                      "category")
        question_text = item.get("question")
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
        elif benchmark in ("nextqa", "perceptiontest"):
            prompt = nextqa_prompt(item["question"],
                                   item.get("candidates", []))
            a = item["answer"]  # int index in the reference parquet/json
            # (utils_nextqa.py:184 chr(65+answer)); accept a pre-mapped
            # letter, but "0".."4" strings are indices, not letters
            gold = a if isinstance(a, str) and len(a) == 1 and a.isalpha() \
                else chr(65 + int(a))
        elif benchmark == "lvbench":
            prompt = lvbench_prompt(item["question"])
            gold = item["answer"]
        elif benchmark == "longvideobench":
            prompt = longvideobench_prompt(item["question"],
                                           item.get("candidates", []))
            gold = item["answer"] if "answer" in item \
                else chr(65 + int(item["correct_choice"]))
        elif benchmark == "hourvideo":
            prompt = hourvideo_prompt(item["question"],
                                      item.get("mcq_test", ""))
            gold = item.get("answer") or item.get("correct_answer_label")
        elif benchmark == "highres_qa":
            # item: {path, qa: {question}, mcq: {options[], correct_option},
            # category, qa_type} (utils_highres_qa.py:173-198)
            q = item["qa"]["question"] if "qa" in item else item["question"]
            question_text = q
            opts = item["mcq"]["options"] if "mcq" in item \
                else item.get("options", [])
            prompt = highres_qa_prompt(q, opts)
            gold = item["mcq"]["correct_option"][0] if "mcq" in item \
                else item["answer"]
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
               "question": question_text, "answer": gold,
               "outputs": response,
               "correct": judge_mc_video(response, gold) if gold else None}
        if benchmark == "highres_qa":
            # di uses question_type := meta["qa_type"]
            # (eval_highres_qa.py:101-107)
            rec["question_type"] = item.get("qa_type")
            rec["answer_text"] = item["mcq"]["correct_option"] \
                if "mcq" in item else item.get("answer_text")
        if benchmark == "hourvideo":
            # submission format: the question dict + the predicted letter
            # (eval_hourvideo.py:115)
            rec["video_uid"] = item.get("video_uid", video)
            rec["mcq_test"] = item.get("mcq_test", "")
            letter = extract_answer_letter(response)
            rec["predicted_answer_label"] = letter.upper() if letter else ""
        for k in extra_keys:
            if k in item:
                rec[k] = item[k]
        return rec

    return infer


OPEN_ENDED_INSTRUCTION = "Answer the question with a short phrase or a " \
    "sentence."

OPEN_ENDED_BENCHMARKS = ("activitynet", "msrvtt", "msvd", "tgif")


def build_open_ended_infer_fn(benchmark: str, chat_model, data_root: str,
                              num_frames: int = 16, sample: str = "middle",
                              generation_config=None,
                              rope_pos_id_version: Optional[str] = None,
                              rope_pos_id_stride: Optional[int] = None):
    """Open-ended video QA (activitynet / msrvtt / msvd / tgif): prompt is
    the shared short-phrase instruction + question
    (utils_activitynet.py:191-194 et al.); output records carry the
    GPT-judge contract keys {question, question_raw, answer, id, video_id,
    outputs} (eval_activitynet.py:103-130) consumed by
    ``evalkit.gpt_judge``."""
    from v2pe_tpu.data.datasets import read_video_frames

    def infer(item: dict) -> dict:
        video = item.get("video")
        if not video:
            # ActivityNet videos are stored as v_<video_name>.mp4
            # (utils_activitynet.py:173-176)
            name = item["video_name"]
            prefix = "v_" if benchmark == "activitynet" else ""
            video = f"{prefix}{name}.mp4"
        frames = read_video_frames(os.path.join(data_root, video),
                                   num_frames, sample)
        pixel_list, npl = [], []
        for f in frames:
            pv, n = chat_model.load_pixels(f, max_num=1)
            pixel_list.append(pv)
            npl.append(n)
        pixels = np.concatenate(pixel_list) if pixel_list else None

        prompt = "\n".join([OPEN_ENDED_INSTRUCTION, item["question"]])
        markers = "".join(f"Frame{i + 1}: <image>\n"
                          for i in range(len(frames)))
        response = chat_model.chat(
            pixels, markers + prompt, generation_config,
            num_patches_list=npl,
            rope_pos_id_version=rope_pos_id_version,
            rope_pos_id_stride=rope_pos_id_stride)
        return {"question": prompt, "question_raw": item["question"],
                "answer": item.get("answer"),
                "id": item.get("id", item.get("question_id")),
                "video_id": item.get("video_name", video),
                "outputs": response}

    return infer


VIDEO_BUCKET_KEYS = {
    "videomme": ("task_type", "duration"),
    "mvbench": ("task_type",),
    "mlvu": ("question_type",),
    "nextqa": ("type",),
    "perceptiontest": ("type",),
    "lvbench": ("question_type",),       # list-valued: counted per element
    "longvideobench": ("question_category",),
    "hourvideo": ("task",),
    "highres_qa": ("question_type",),
}

# The A-E benchmarks use a 5-letter instruction variant
MC_VIDEO_INSTRUCTION_5 = (
    "Select the best answer to the following multiple-choice question "
    "based on the video. Respond with only the letter (A, B, C, D, or E) "
    "of the correct option.")


def nextqa_prompt(question: str, candidates: Sequence[str]) -> str:
    """utils_nextqa.py:178-181 (shared by perceptiontest :178-181): A-E
    instruction + question + lettered candidate lines."""
    return "\n".join([MC_VIDEO_INSTRUCTION_5, question] +
                     [f"{chr(65 + i)}. {c}" for i, c in
                      enumerate(candidates)])


def lvbench_prompt(question: str) -> str:
    """utils_lvbench.py:246-249: A-D instruction + question only (LVBench
    questions embed their option lines)."""
    return "\n".join([MC_VIDEO_INSTRUCTION, question])


def longvideobench_prompt(question: str, candidates: Sequence[str]) -> str:
    """utils_longvideobench.py:131-135."""
    return "\n".join([MC_VIDEO_INSTRUCTION, question] +
                     [f"{chr(65 + i)}. {c}" for i, c in
                      enumerate(candidates)])


def highres_qa_prompt(question: str, options: Sequence[str]) -> str:
    """utils_highres_qa.py:186-189: A-D instruction + question + the mcq
    option lines verbatim (already lettered in the data)."""
    return "\n".join([MC_VIDEO_INSTRUCTION, question] + list(options))


def hourvideo_prompt(question: str, mcq_test: str) -> str:
    """eval_hourvideo.py:85-89: A-E instruction + question + the
    pre-rendered mcq_test option block."""
    return "\n".join([MC_VIDEO_INSTRUCTION_5, question, mcq_test])


def hourvideo_flatten(full_data: dict) -> List[dict]:
    """The reference's HourVideo json maps video_uid -> benchmark_dataset
    (a list of question dicts, utils_hourvideo.py:224-238); flatten to one
    runner item per (video, question) keeping the question dict intact so
    predictions can be folded back into the submission format."""
    items = []
    for video_uid, content in full_data.items():
        for qi, q in enumerate(content.get("benchmark_dataset", [])):
            item = dict(q)
            item["video_uid"] = video_uid
            item.setdefault("id", q.get("qid", f"{video_uid}:{qi}"))
            items.append(item)
    return items


def hourvideo_fold(results: List[dict]) -> dict:
    """Inverse of flatten: video_uid -> {benchmark_dataset: [question dicts
    incl. predicted_answer_label]} (eval_hourvideo.py:82-119 output)."""
    out: Dict[str, dict] = {}
    for r in results:
        uid = r["video_uid"]
        q = {k: v for k, v in r.items()
             if k not in ("video_uid", "id", "correct")}
        out.setdefault(uid, {"benchmark_dataset": []})
        out[uid]["benchmark_dataset"].append(q)
    return out


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
