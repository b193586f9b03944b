"""Eval harness tests: VQAEval + mmniah_is_correct golden vs the reference's
pure-Python scorers; runner shard/resume; MM-NIAH bucket scorer parity."""

import json
import os
import random
import string

import numpy as np
import pytest

from v2pe_tpu.evalkit import runner
from v2pe_tpu.evalkit.metrics import (VQAEval, anls, exact_match_mc,
                                      has_word, mmniah_is_correct,
                                      relaxed_accuracy)
from v2pe_tpu.evalkit.mm_niah import score_jsonl

from . import reference_util


CASES = [
    ("A cat.", "cat"),
    ("The answer is B.", "b"),
    ("two dogs", "2 dogs"),
    ("it's a sunny day", "its a sunny day"),
    ("isn't", "isnt"),
    ("yes, definitely!", ["no", "yes"]),
    ("the quick brown fox", ["fox"]),
    ("4", ["four"]),
    ("a bird on a tree", "bird"),
    ("completely wrong", "right"),
]


def test_vqa_eval_matches_reference():
    reference_util.install_reference()
    from eval.mm_niah.tools import VQAEval as RefVQAEval

    ref, got = RefVQAEval(), VQAEval()
    for ans, gt in CASES:
        gt_ref = list(gt) if isinstance(gt, list) else gt
        assert got.evaluate(ans, gt) == ref.evaluate(ans, gt_ref), (ans, gt)


def test_mmniah_is_correct_matches_reference():
    reference_util.install_reference()
    from eval.mm_niah.calculate_scores import is_correct as ref_is_correct

    cases = [
        (1, "B"), (1, "b."), (0, "The answer is A."), (2, "right"),
        (0, "left"), (3, "none"), (1, "not a letter at all"),
        ([1, 2, 3], "[1, 2, 3]"), ([1, 2], "```json\n[1, 2]\n```"),
        ([1, 2], "nonsense"), ("cat", "A cat."), ("dog", "cat"),
        ("42", "The answer is 42."),
    ]
    for answer, response in cases:
        assert mmniah_is_correct(answer, response) == \
            ref_is_correct(answer, response), (answer, response)


def test_anls():
    assert anls("hello world", ["hello world"]) == 1.0
    assert anls("helo world", ["hello world"]) > 0.8
    assert anls("zzz", ["hello world"]) == 0.0
    assert anls("", [""]) == 1.0


def test_relaxed_accuracy():
    assert relaxed_accuracy("102", "100")
    assert not relaxed_accuracy("110", "100")
    assert relaxed_accuracy("50%", "0.5")
    assert relaxed_accuracy("cat", "CAT")


def test_exact_match_mc():
    assert exact_match_mc("B", "B")
    assert exact_match_mc("B.", "B")
    assert exact_match_mc("The cat", "A", options=["the cat", "a dog"])
    assert not exact_match_mc("D", "B")


def test_runner_shard_resume(tmp_path):
    items = [{"id": i, "q": f"q{i}"} for i in range(10)]
    out = str(tmp_path / "rank0.jsonl")

    calls = []

    def infer(item):
        calls.append(item["id"])
        if item["id"] == 4 and len(calls) <= 5:  # fail only on the 1st pass
            raise RuntimeError("flaky")
        return {"id": item["id"], "response": f"a{item['id']}"}

    n = runner.run_shard(items, infer, out, rank=0, world=2)
    # rank 0 gets ids 0,2,4,6,8; id 4 failed once
    assert n == 4
    # resume answers only the missing one
    n2 = runner.run_shard(items, infer, out, rank=0, world=2)
    assert n2 == 1
    merged = runner.merge_shards([out], str(tmp_path / "m.jsonl"))
    assert sorted(d["id"] for d in merged) == [0, 2, 4, 6, 8]


def test_mmniah_bucket_scorer(tmp_path):
    rng = random.Random(0)
    path = str(tmp_path / "model_retrieval-text-test.jsonl")
    with open(path, "w") as f:
        for i in range(200):
            correct = i % 2 == 0
            ans = rng.choice(["cat", "dog", "bird"])
            f.write(json.dumps({
                "id": i,
                "context_length": rng.choice([900, 3000, 30000, 60000]),
                "placed_depth": rng.random(),
                "answer": ans,
                "response": ans if correct else "wrong",
            }) + "\n")
    s = score_jsonl(path)
    assert abs(s["weighted_avg_acc"] - 0.5) < 0.1
    assert len(s["scores_by_length"]) == len(s["context_ranges"]) == 11
    assert len(s["weighted_acc"]) == 11
