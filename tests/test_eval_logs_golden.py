"""REAL-output golden parity: re-score the reference's committed evaluation
logs (`/root/reference/eval_logs` — actual InternVL2.5-8B predictions) with
this repo's scorers.

Two layers of checking:
* EXACT per-sample parity against the reference's CURRENT evaluator
  (`eval/milebench/evaluate.py::Eval`) executed in-process on the same real
  predictions — thousands of messy model responses, not synthetic strings;
* aggregate-accuracy continuity with the COMMITTED eval.json (loose bound:
  the logs were produced by an older revision of the reference's
  match_choice that lacked the leading-letter rule, so a handful of
  per-sample extractions legitimately differ — e.g. MultiModalQA sample 1
  'aaasan francisco' → old fallback 'AAAAACC' vs current rule 'A').

MM-NIAH bucket scoring is compared exactly against the committed
scores_test.json (same scorer version there)."""

import json
import os

import numpy as np
import pytest

LOGS = "/root/reference/eval_logs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(LOGS), reason="reference eval_logs not present")


def _load_task(name):
    d = f"{LOGS}/milebench/internvl2_5_8b/{name}"
    preds = json.load(open(f"{d}/pred_with_extracted.json"))
    expected = json.load(open(f"{d}/eval.json"))
    return preds, expected


def _ref_eval():
    from .test_evalkit_benchmarks import _ref_milebench

    return _ref_milebench()


# our aggregate accuracy on each committed prediction set — identical to
# the CURRENT reference evaluator (checked per-sample below). For tasks
# whose committed eval.json differs, the delta is fully explained by the
# leading-letter rule added to match_choice after the logs were produced
# (prose answers starting with "a ..." now extract 'A').
EXPECTED_OURS = {
    "OCR-VQA": 0.605,          # committed 0.605  (equal)
    "ActionPrediction": 0.805,  # committed 0.665
    "SceneTransition": 0.935,   # committed 0.700
    "DocVQA": 0.820,            # committed 0.820  (equal)
    "SlideVQA": 0.755,          # committed 0.755  (equal)
    "GPR1200": 0.415,           # committed 0.415  (equal)
    "MultiModalQA": 0.795,      # committed 0.605
}


@pytest.mark.parametrize("task", sorted(EXPECTED_OURS))
def test_milebench_multichoice_real_outputs(task):
    from v2pe_tpu.evalkit import milebench

    preds, expected = _load_task(task)
    ref = _ref_eval()

    ours_correct = 0
    for p in preds:
        score, sel = milebench.judge_multi_choice(
            p["gt_response"], p["pred_response"], p["choice_list"])
        ref_sample = {"sample_id": p["sample_id"],
                      "gt_response": p["gt_response"],
                      "pred_response": p["pred_response"],
                      "choice_list": list(p["choice_list"])}
        ref.process_sample(ref_sample)
        ref_score, ref_sel = ref.judge_multi_choice(ref_sample)
        assert (score, sel) == (ref_score, ref_sel), p["sample_id"]
        ours_correct += score

    acc = ours_correct / len(preds)
    assert acc == pytest.approx(EXPECTED_OURS[task])


MMNIAH_TASKS = ["counting-image-test", "counting-text-test",
                "reasoning-image-test", "reasoning-text-test",
                "retrieval-image-test", "retrieval-text-test"]


def _mmniah_jsonl(task):
    d = f"{LOGS}/mmniah/internvl2_5_8b/{task}"
    jsonls = [f for f in os.listdir(d) if f.endswith(".jsonl")]
    assert len(jsonls) == 1
    return d, os.path.join(d, jsonls[0])


@pytest.mark.parametrize("task", MMNIAH_TASKS)
def test_mmniah_buckets_real_outputs(task):
    """Length-bucket scoring over the committed MM-NIAH runs must match the
    committed scores_test.json exactly (scores, weighted_acc, counts) —
    all six tasks."""
    from v2pe_tpu.evalkit import mm_niah

    d, jsonl = _mmniah_jsonl(task)
    got = mm_niah.score_jsonl(jsonl, task_name=task)
    model_dir = os.path.join(d, "results")
    model = os.listdir(model_dir)[0]
    expected = json.load(open(
        os.path.join(model_dir, model, "scores_test.json")))
    np.testing.assert_allclose(got["scores_by_length"], expected[task],
                               atol=1e-6)
    np.testing.assert_allclose(got["weighted_acc"], expected["weighted_acc"],
                               atol=1e-9)
    np.testing.assert_allclose(got["sample_number_array"],
                               expected["sample_number_array"])
    np.testing.assert_allclose(float(np.mean(got["scores_by_length"])),
                               expected["average"], atol=1e-6)


def _ref_mmniah_grid(jsonl_path, task):
    """The reference's length x depth heatmap cells, computed with ITS OWN
    code (eval/mm_niah/calculate_scores.py:134-175 inner loop + is_correct)
    executed in-process on the committed jsonl."""
    import importlib.util
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_calc", f"{LOGS}/../eval/mm_niah/calculate_scores.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    total = np.zeros((len(ref.x_bins) + 1, int(1 / ref.y_interval)))
    correct = np.zeros_like(total)
    for line in open(jsonl_path):
        entry = json.loads(line)
        x = float(entry["context_length"])
        y = entry["placed_depth"]
        if isinstance(y, str):
            y = json.loads(y)
        if isinstance(y, list):
            y = sum(y) / len(y)
        if y == 1.0:
            y = 0.99
        answer = entry["answer"]
        if "counting" in task and not isinstance(answer, list):
            answer = json.loads(answer)
        xi = np.digitize(x, ref.x_bins)
        yi = int(y / ref.y_interval)
        total[xi][yi] += 1
        correct[xi][yi] += ref.is_correct(answer, entry["response"])
    grid = np.divide(correct, total, out=np.zeros_like(correct),
                     where=total != 0)
    return grid[1:].T  # (depth_bins, len_bins) as rendered by the heatmap


@pytest.mark.parametrize("task", MMNIAH_TASKS)
def test_mmniah_depth_grid_matches_reference(task, tmp_path):
    """Every heatmap CELL (length bin x depth bin), not just the
    per-length means, must match the reference scorer bit-for-bit on the
    committed real outputs; the rendered heatmap artifact must also land."""
    from v2pe_tpu.evalkit import mm_niah

    _, jsonl = _mmniah_jsonl(task)
    ours = np.asarray(mm_niah.score_jsonl(jsonl, task_name=task)["grid"])
    ref_grid = _ref_mmniah_grid(jsonl, task)
    assert ours.shape == ref_grid.shape == (5, len(mm_niah.X_BINS))
    np.testing.assert_array_equal(ours, ref_grid)

    out = tmp_path / "hm.png"
    mm_niah._render_heatmap(ours, str(out))
    assert out.exists() and out.stat().st_size > 0


def test_scienceqa_real_outputs_accuracy():
    """ScienceQA committed run: aggregate accuracy of the committed answers
    lands in the README-reported range (94.9 for the 8B model family)."""
    path = f"{LOGS}/scienceqa/InternVL2_5-8B/sqa_test_250206021352.jsonl"
    rows = [json.loads(l) for l in open(path)]
    acc = float(np.mean([r["answer"] == r["gt_answers"] for r in rows]))
    assert acc > 0.9
    assert len(rows) > 1000
