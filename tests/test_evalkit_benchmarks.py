"""MileBench + Long-VQA scorer tests, golden vs reference where importable."""

import numpy as np
import pytest

from v2pe_tpu.evalkit import longvqa, milebench

from . import reference_util


def _ref_milebench():
    reference_util.install_reference()
    import importlib.machinery
    import sys
    import types

    if "rouge" not in sys.modules:
        rouge = types.ModuleType("rouge")
        rouge.__spec__ = importlib.machinery.ModuleSpec("rouge", None)

        class Rouge:
            def get_scores(self, pred, gt):
                return [{"rouge-l": {
                    "f": milebench.rouge_l_f(pred, gt)}}]

        rouge.Rouge = Rouge
        sys.modules["rouge"] = rouge
    from eval.milebench.evaluate import Eval

    return Eval()


MC_CASES = [
    ("B. a dog", ["a cat", "a dog", "a fish"], "a dog"),
    ("The answer is a cat", ["a cat", "a dog"], "a cat"),
    ("C", ["one", "two", "three"], "three"),
    ("nonsense", ["one", "two"], "one"),
    ("a fish", ["a cat", "a dog", "a fish"], "a fish"),
]


@pytest.mark.parametrize("pred,choices,gt", MC_CASES)
def test_multichoice_matches_reference(pred, choices, gt):
    ref = _ref_milebench()
    sample_ref = {"sample_id": 0, "gt_response": gt, "pred_response": pred,
                  "choice_list": list(choices)}
    ref.process_sample(sample_ref)
    score_ref, sel_ref = ref.judge_multi_choice(sample_ref)

    score, sel = milebench.judge_multi_choice(gt, pred, choices)
    assert (score, sel) == (score_ref, sel_ref)


def test_process_matches_reference():
    ref = _ref_milebench()
    for s in ["A. cat!", "it's 1,000 (approx)", "  Hello\nWorld  "]:
        assert milebench.process(s) == ref.process(s)


def test_needle_and_buckets():
    preds = [
        {"sample_id": 0, "gt_response": "needle", "image": ["a"] * 2,
         "pred_response": "the needle is here"},
        {"sample_id": 1, "gt_response": "pin", "image": ["a"] * 40,
         "pred_response": "no idea"},
    ]
    out = milebench.evaluate_needle(preds)
    assert out["Accuracy"] == 0.5
    assert out["image_quantity_level-Result"]["Few"] == [1, 1]
    assert out["image_quantity_level-Result"]["Many"] == [0, 1]


def test_rouge_l():
    assert milebench.rouge_l_f("a b c", "a b c") == pytest.approx(1.0)
    assert milebench.rouge_l_f("x y z", "a b c") == 0.0
    mid = milebench.rouge_l_f("a b d", "a b c")
    assert 0 < mid < 1


def _install_longvqa_shims():
    """The longvqa scripts use flat sibling imports (run from their dir)."""
    import sys

    import importlib.machinery
    import types

    reference_util.install_reference()
    if "editdistance" not in sys.modules:
        ed = types.ModuleType("editdistance")
        ed.__spec__ = importlib.machinery.ModuleSpec("editdistance", None)
        from v2pe_tpu.evalkit.metrics import levenshtein

        ed.eval = levenshtein
        sys.modules["editdistance"] = ed
    if "textdistance" not in sys.modules:
        from v2pe_tpu.evalkit.metrics import levenshtein as _lev

        td = types.ModuleType("textdistance")
        td.__spec__ = importlib.machinery.ModuleSpec("textdistance", None)

        class _Lev:
            @staticmethod
            def normalized_similarity(a, b):
                m = max(len(a), len(b))
                return 1.0 if m == 0 else 1.0 - _lev(a, b) / m

        td.levenshtein = _Lev()
        sys.modules["textdistance"] = td
    # pycocoevalcap: only referenced at call time by owl caption metrics
    for name in ["pycocoevalcap", "pycocoevalcap.tokenizer",
                 "pycocoevalcap.tokenizer.ptbtokenizer",
                 "pycocoevalcap.cider", "pycocoevalcap.cider.cider",
                 "pycocoevalcap.bleu", "pycocoevalcap.bleu.bleu",
                 "pycocoevalcap.rouge", "pycocoevalcap.rouge.rouge",
                 "pycocoevalcap.meteor", "pycocoevalcap.meteor.meteor",
                 "pycocoevalcap.spice", "pycocoevalcap.spice.spice"]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            for cls in ["PTBTokenizer", "Cider", "Bleu", "Rouge", "Meteor",
                        "Spice"]:
                setattr(m, cls, type(cls, (), {}))
            sys.modules[name] = m
    d = reference_util.REFERENCE_PATH + "/eval/longvqa"
    if d not in sys.path:
        sys.path.insert(0, d)


def test_longvqa_anls_matches_reference_due_scorer():
    """Golden vs due_scorer.AnlsScorer (textdistance shimmed with our
    levenshtein; the scorer's math is pure)."""
    _install_longvqa_shims()  # installs shims + sys.path
    from due_scorer.anls_scorer import AnlsScorer

    from v2pe_tpu.evalkit.metrics import anls

    cases = [
        ("hello world", ["hello world"]),
        ("helo world", ["hello world"]),
        ("zzz", ["hello world"]),
        ("answer 42", ["answer 42", "42"]),
        ("abcd", ["abzz"]),  # exactly at the 0.5 boundary -> zeroed
    ]
    for pred, anns in cases:
        scorer = AnlsScorer()
        scorer.add([{"pr": [pred], "an": list(anns)}])
        ref = scorer.scores[0]
        assert anls(pred, anns) == pytest.approx(ref), (pred, anns)


def test_longvqa_metric_dispatch():
    """decide_metric semantics (calculate_scores.py:28-46, read-verified)."""
    assert longvqa.decide_metric("chartqa") == "RACC"
    assert longvqa.decide_metric("svqa") == "EACC"
    assert longvqa.decide_metric("deepform") == "F1"
    assert longvqa.decide_metric("docvqa") == "ANLS"
    assert longvqa.decide_metric("textvqa") == "TEXTVQA"
    assert longvqa.decide_metric("textcaps") == "BLEU4"
    assert longvqa.decide_metric("wikitablequestions") == "WTQ"
    assert longvqa.decide_metric("unknown_task") == "RACC"


def test_longvqa_relaxed():
    """evaluate_relaxed_accuracy semantics (calculate_scores.py:48-76)."""
    entries = [
        {"answer": "102", "annotation": ["100"]},
        {"answer": "0.5", "annotation": "50%"},
        {"answer": "cat", "annotation": ["dog", "cat"]},
        {"answer": "nope", "annotation": ["yes"]},
    ]
    got = longvqa.score_task("chartqa", entries)["score"]
    assert got == pytest.approx(3 / 4)


def test_longvqa_scores():
    assert longvqa.score_entry("ANLS", "hello", ["hello"]) == 1.0
    assert longvqa.score_entry("TEXTVQA", "cat",
                               ["cat", "cat", "cat", "dog"]) == 1.0
    assert longvqa.score_entry("TEXTVQA", "cat",
                               ["cat", "dog", "bird"]) == pytest.approx(1 / 3)
    assert longvqa.score_entry("F1", "a b", "a c") == pytest.approx(0.5)
    assert longvqa.score_entry("BLEU4", "a b c d e", "a b c d e") == \
        pytest.approx(1.0)
