"""Per-benchmark video suite tests: fps frame sampling golden vs the
reference get_frame_indices, videomme/mvbench/mlvu prompts + answer
extraction + bucketed scoring, and end-to-end runs on synthetic mp4s."""

import random

import numpy as np
import pytest

from v2pe_tpu.data.datasets import _frame_indices
from v2pe_tpu.evalkit import video

from . import reference_util


# ---------------------------------------------------------------------------
# fps sampling parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("vlen,fps,mode,max_frames", [
    (300, 30.0, "fps1", -1),
    (300, 30.0, "fps0.5", -1),
    (1000, 24.0, "fps2", 16),
    (47, 12.5, "fps1", 8),
    (10, 30.0, "fps1", -1),  # shorter than one clip
])
def test_fps_indices_match_reference(vlen, fps, mode, max_frames):
    reference_util.install_reference()
    from internvl.train.dataset import get_frame_indices

    want = get_frame_indices(max_frames, vlen, sample=mode, input_fps=fps,
                             max_num_frames=max_frames)
    got = _frame_indices(vlen, max_frames, mode, random, input_fps=fps)
    assert list(map(int, got)) == list(map(int, want))


def test_fps_mode_via_read_video_frames(tmp_path):
    cv2 = pytest.importorskip("cv2")

    from v2pe_tpu.data.datasets import read_video_frames

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    rng = np.random.RandomState(0)
    for _ in range(40):  # 4 seconds at 10 fps
        w.write(rng.randint(0, 255, (24, 32, 3), dtype=np.uint8))
    w.release()
    frames = read_video_frames(path, 100, "fps1")
    assert len(frames) == 4  # 1 frame per second of wall time
    frames = read_video_frames(path, 2, "fps1")
    assert len(frames) == 2  # truncated by the budget


# ---------------------------------------------------------------------------
# answer extraction (eval_videomme.py:113-125 semantics)
# ---------------------------------------------------------------------------

EXTRACT_CASES = [
    ("The answer is B.", "b"),
    ("Answer: (C)", "c"),
    ("the option is D", "d"),
    ("A. the red one", "a"),
    ("  2 + 2 = 4, B", "b"),   # first ALPHA char, digits skipped
    ("....", ""),
    # reference quirk: the tail after "the answer is" starts with "probably",
    # so the first alpha char is 'p' — kept bug-for-bug
    ("I think the answer is probably C because...", "p"),
]


@pytest.mark.parametrize("resp,want", EXTRACT_CASES)
def test_extract_answer_letter(resp, want):
    assert video.extract_answer_letter(resp) == want


def test_judge_mc_video():
    assert video.judge_mc_video("The answer is B", "B")
    assert video.judge_mc_video("b", "B")
    assert not video.judge_mc_video("The answer is A", "B")
    assert not video.judge_mc_video("...", "B")


# ---------------------------------------------------------------------------
# prompts
# ---------------------------------------------------------------------------


def test_videomme_prompt_format():
    p = video.videomme_prompt("What color?", ["A. red", "B. blue"])
    assert p == (video.MC_VIDEO_INSTRUCTION + "\nWhat color?\n"
                 "A. red\nB. blue")
    p2 = video.videomme_prompt("Q?", ["A. x"], subtitles="hello world")
    assert p2.startswith("This video's subtitles are listed below:\n"
                         "hello world\n")


def test_mvbench_prompt_and_gold():
    p = video.mvbench_prompt("What moves?", ["a car", "a cat"])
    assert p == ("Question: What moves?\nA. a car\nB. a cat\n"
                 "Answer with the option's letter from the given choices "
                 "directly.")
    assert video.mvbench_gold(["a car", "a cat"], "a cat") == "B"


def test_mlvu_prompt():
    p = video.mlvu_prompt("Q?", ["A. one", "B. two"])
    assert p == video.MC_VIDEO_INSTRUCTION + "\nQ?\nA. one\nB. two"


def test_score_buckets():
    results = [
        {"correct": True, "task_type": "count", "duration": "short"},
        {"correct": False, "task_type": "count", "duration": "long"},
        {"correct": True, "task_type": "ocr", "duration": "long"},
    ]
    s = video.score_buckets(results, ("task_type", "duration"))
    assert s["task_type"] == {"count": 0.5, "ocr": 1.0}
    assert s["duration"] == {"long": 0.5, "short": 1.0}
    assert s["overall"] == {"accuracy": round(2 / 3, 4), "n": 3}


# ---------------------------------------------------------------------------
# end-to-end on synthetic mp4s
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def toy_setup(tmp_path_factory):
    import jax

    cv2 = pytest.importorskip("cv2")

    from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
    from v2pe_tpu.infer.chat import ChatModel
    from v2pe_tpu.models.params import init_vlm_params

    from .test_data_pipeline import _toy_tokenizer

    root = tmp_path_factory.mktemp("vids")
    path = str(root / "clip.mp4")
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
    return ChatModel(params, cfg, tokenizer, attn_impl="jnp"), str(root)


@pytest.mark.parametrize("benchmark,item", [
    ("videomme", {"question_id": "v1", "videoID": "clip.mp4",
                  "question": "What color?", "options": ["A. red", "B. blue"],
                  "answer": "A", "task_type": "perception",
                  "duration": "short"}),
    ("mvbench", {"id": "m1", "video": "clip.mp4", "question": "What moves?",
                 "candidates": ["a car", "a cat"], "answer": "a cat",
                 "task_type": "action"}),
    ("mlvu", {"id": "l1", "video": "clip.mp4", "question": "Topic?",
              "options": ["A. x", "B. y"], "answer": "B",
              "question_type": "topic_reasoning"}),
])
def test_mc_video_end_to_end(toy_setup, benchmark, item):
    from v2pe_tpu.infer.generate import GenerationConfig

    model, root = toy_setup
    infer = video.build_mc_video_infer_fn(
        benchmark, model, root, num_frames=3,
        generation_config=GenerationConfig(max_new_tokens=4))
    rec = infer(item)
    assert isinstance(rec["outputs"], str)
    assert isinstance(rec["correct"], bool)
    if benchmark == "mvbench":
        assert rec["answer"] == "B"  # mapped from answer text
    s = video.score_buckets([rec], video.VIDEO_BUCKET_KEYS[benchmark])
    assert s["overall"]["n"] == 1


# ---------------------------------------------------------------------------
# round 3: the remaining MC benchmarks (nextqa / lvbench / longvideobench /
# perceptiontest / hourvideo) + open-ended GPT-judge suite
# ---------------------------------------------------------------------------


def test_nextqa_prompt_format():
    p = video.nextqa_prompt("Why?", ["a", "b", "c", "d", "e"])
    assert p == (video.MC_VIDEO_INSTRUCTION_5 + "\nWhy?\n"
                 "A. a\nB. b\nC. c\nD. d\nE. e")


def test_lvbench_prompt_no_candidates():
    # lvbench question strings already embed the options
    # (utils_lvbench.py:246-249 joins instruction + question only)
    p = video.lvbench_prompt("Q?\n(A) x\n(B) y")
    assert p == video.MC_VIDEO_INSTRUCTION + "\nQ?\n(A) x\n(B) y"


def test_longvideobench_prompt():
    p = video.longvideobench_prompt("Q?", ["one", "two"])
    assert p == video.MC_VIDEO_INSTRUCTION + "\nQ?\nA. one\nB. two"


def test_hourvideo_prompt_flatten_fold():
    p = video.hourvideo_prompt("Q?", "A. x\nB. y")
    assert p == video.MC_VIDEO_INSTRUCTION_5 + "\nQ?\nA. x\nB. y"

    full = {"vid1": {"benchmark_dataset": [
        {"qid": "q1", "question": "Q1?", "mcq_test": "A. x\nB. y",
         "task": "summarization"},
        {"question": "Q2?", "mcq_test": "A. p\nB. q", "task": "recall"},
    ]}}
    items = video.hourvideo_flatten(full)
    assert len(items) == 2
    assert items[0]["id"] == "q1" and items[0]["video_uid"] == "vid1"
    assert items[1]["id"] == "vid1:1"

    results = [dict(it, outputs="A", predicted_answer_label="A",
                    correct=None, answer=None) for it in items]
    folded = video.hourvideo_fold(results)
    assert set(folded) == {"vid1"}
    qs = folded["vid1"]["benchmark_dataset"]
    assert len(qs) == 2 and qs[0]["predicted_answer_label"] == "A"
    assert "video_uid" not in qs[0] and "correct" not in qs[0]


def test_score_buckets_list_valued_and_unscored():
    results = [
        {"correct": True, "question_type": ["temporal", "spatial"]},
        {"correct": False, "question_type": ["temporal"]},
        {"correct": None, "question_type": ["spatial"]},  # gold-less
    ]
    s = video.score_buckets(results, ("question_type",))
    # lvbench counts a sample once per type element (eval_lvbench.py:130-137)
    assert s["question_type"] == {"spatial": 1.0, "temporal": 0.5}
    assert s["overall"] == {"accuracy": 0.5, "n": 2}
    assert s["unscored"] == 1


@pytest.mark.parametrize("benchmark,item,want_gold", [
    ("nextqa", {"id": "n1", "video": "clip.mp4", "question": "Why?",
                "candidates": ["a", "b", "c", "d", "e"], "answer": 2,
                "type": "causal"}, "C"),
    ("perceptiontest", {"id": "p1", "video": "clip.mp4", "question": "Q?",
                        "candidates": ["x", "y", "z"], "answer": "0",
                        "type": "memory"}, "A"),
    ("lvbench", {"id": "lv1", "video": "clip.mp4",
                 "question": "Q?\n(A) x\n(B) y", "answer": "B",
                 "uid": "u1", "question_type": ["temporal"],
                 "time_reference": [0, 1], "file_path": "clip.mp4"}, "B"),
    ("longvideobench", {"id": "lb1", "video_path": "clip.mp4",
                        "video": "clip.mp4", "question": "Q?",
                        "candidates": ["m", "n"], "correct_choice": 1,
                        "question_category": "E2O"}, "B"),
    ("hourvideo", {"id": "h1", "video_uid": "clip", "video": "clip.mp4",
                   "question": "Q?", "mcq_test": "A. x\nB. y",
                   "answer": "A", "task": "recall"}, "A"),
])
def test_new_mc_video_end_to_end(toy_setup, benchmark, item, want_gold):
    from v2pe_tpu.infer.generate import GenerationConfig

    model, root = toy_setup
    infer = video.build_mc_video_infer_fn(
        benchmark, model, root, num_frames=2,
        generation_config=GenerationConfig(max_new_tokens=4))
    rec = infer(item)
    assert rec["answer"] == want_gold
    assert isinstance(rec["outputs"], str)
    assert isinstance(rec["correct"], bool)
    if benchmark == "hourvideo":
        # reference semantics: first isalpha() char, uppercased
        # (eval_hourvideo.py:110-115) — any Unicode letter passes isalpha
        want = video.extract_answer_letter(rec["outputs"])
        assert rec["predicted_answer_label"] == (want.upper() if want
                                                 else "")
    s = video.score_buckets([rec], video.VIDEO_BUCKET_KEYS[benchmark])
    assert s["overall"]["n"] == 1


def test_open_ended_end_to_end_and_gpt_judge(toy_setup, tmp_path):
    from v2pe_tpu.evalkit import gpt_judge
    from v2pe_tpu.infer.generate import GenerationConfig

    model, root = toy_setup
    infer = video.build_open_ended_infer_fn(
        "msvd", model, root, num_frames=2,
        generation_config=GenerationConfig(max_new_tokens=4))
    rec = infer({"id": "q1", "question_id": "q1", "video": "clip.mp4",
                 "video_name": "clip", "question": "What happens?",
                 "answer": "nothing"})
    assert set(rec) == {"question", "question_raw", "answer", "id",
                        "video_id", "outputs"}
    assert rec["question"].startswith(video.OPEN_ENDED_INSTRUCTION)

    # judge with a deterministic fake client; duplicate video_id gets _1
    recs = [rec, dict(rec, id="q2", outputs="other")]

    calls = []

    def fake_judge(messages):
        calls.append(messages)
        assert messages[0]["role"] == "system"
        assert "Predicted Answer:" in messages[1]["content"]
        return "{'pred': 'yes', 'score': 4}"

    combined = gpt_judge.run_generation_benchmark(
        recs, str(tmp_path / "eval_results"),
        str(tmp_path / "gpt_eval.json"), fake_judge)
    assert set(combined) == {"clip_0", "clip_1"}
    summary = gpt_judge.summarize(combined)
    assert summary == {"n": 2, "accuracy": 1.0, "avg_score": 4.0}
    assert len(calls) == 2

    # resume: a second run re-judges nothing
    combined2 = gpt_judge.run_generation_benchmark(
        recs, str(tmp_path / "eval_results"),
        str(tmp_path / "gpt_eval.json"), fake_judge)
    assert len(calls) == 2 and set(combined2) == {"clip_0", "clip_1"}


def test_gpt_judge_retry_on_bad_response(tmp_path):
    from v2pe_tpu.evalkit import gpt_judge

    recs = [{"question": "q", "question_raw": "q", "answer": "a",
             "id": "x", "video_id": "v", "outputs": "o"}]
    attempts = []

    def flaky_judge(messages):
        attempts.append(1)
        if len(attempts) < 3:
            return "garbage not a dict"
        return "{'pred': 'no', 'score': 1}"

    combined = gpt_judge.run_generation_benchmark(
        recs, str(tmp_path / "er"), str(tmp_path / "out.json"), flaky_judge)
    assert len(attempts) == 3
    assert gpt_judge.summarize(combined) == {"n": 1, "accuracy": 0.0,
                                             "avg_score": 1.0}
