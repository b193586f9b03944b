"""General-VQA + Long-VQA driver tests: reference-parity goldens for the
TextVQA consensus scorer and the DocVQA/InfoVQA ANLS (imported straight from
the reference's scorer files), rectify normalization, output-record schemas,
and end-to-end toy-model runs through runner + CLI."""

import importlib.util
import json
import sys

import numpy as np
import pytest

from v2pe_tpu.evalkit import longvqa_driver, vqa_driver


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# Scorer goldens vs the reference files
# ---------------------------------------------------------------------------


def test_textvqa_accuracy_matches_reference():
    ref = _load_ref_module("ref_textvqa_eval",
                           "/root/reference/eval/vqa/textvqa_eval.py")
    evaluator = ref.TextVQAAccuracyEvaluator()
    cases = [
        ("two", ["two", "2", "two", "TWO.", "a two", "three", "2", "two",
                 "too", "two"]),
        ("a dog running", ["dog", "the dog", "dog running", "a dog", "puppy",
                           "dog", "dog", "cat", "dog", "dogs"]),
        ("yes", ["yes"] * 10),
        ("couldnt", ["couldn't", "could not", "couldnt", "no", "yes",
                     "couldn't", "nope", "couldn't", "can't", "couldn't"]),
        ("", ["one", "1", "one", "one", "won", "one", "1", "one", "one",
              "one"]),
        ("$5.00", ["5", "$5", "5.00", "five", "$5.00", "5 dollars", "5", "5",
                   "$5", "5"]),
    ]
    for pred, gts in cases:
        ref_score = evaluator.eval_pred_list(
            [{"pred_answer": pred, "gt_answers": gts}])
        ours = vqa_driver.textvqa_accuracy(pred, gts)
        assert abs(ref_score - ours) < 1e-9, (pred, gts, ref_score, ours)


def test_evalai_process_matches_reference():
    ref = _load_ref_module("ref_textvqa_eval2",
                           "/root/reference/eval/vqa/textvqa_eval.py")
    proc = ref.EvalAIAnswerProcessor()
    for s in ["The Dog.", "it's a cat, really!", "none", "ten;items",
              "1,234", "What's   up\nthere", "a an the answer",
              "(hello) [world]", "5.5", "isnt"]:
        assert proc(s) == vqa_driver.evalai_process(s), s


def test_anls_matches_reference_evaluate_method(tmp_path):
    ref = _load_ref_module("ref_info_eval",
                           "/root/reference/eval/vqa/infographicsvqa_eval.py")
    gt = {"dsVersion": "1.0",
          "data": [{"questionId": 1, "question": "q1",
                    "answers": ["forty two", "42"]},
                   {"questionId": 2, "question": "q2",
                    "answers": ["blue whale"]},
                   {"questionId": 3, "question": "q3",
                    "answers": ["half"]}]}
    subm = [{"questionId": 1, "answer": "42"},
            {"questionId": 2, "answer": "a blue whale"},
            {"questionId": 3, "answer": "hal"}]
    gtf, sf = tmp_path / "gt.json", tmp_path / "subm.json"
    json.dump(gt, open(gtf, "w"))
    json.dump(subm, open(sf, "w"))

    class P:
        gt_filename = str(gtf)
        submission_filename = str(sf)
        anls_threshold = 0.5
        answer_types = False
        output = None

    res = ref.evaluate_method(str(gtf), str(sf), P)
    ref_score = res["result"]["score"]

    outputs = [{"questionId": r["questionId"], "answer": r["answer"],
                "question": "", "annotation": None, "id": r["questionId"]}
               for r in subm]
    ours = vqa_driver.score_outputs("docvqa_val", outputs,
                                    annotation_file=str(gtf))
    assert abs(ours["accuracy"] - ref_score) < 1e-9


def test_relaxed_and_exact_metrics():
    outs = [{"answer": "42%", "annotation": ["0.42"], "id": 1},
            {"answer": "41", "annotation": ["42"], "id": 2},
            {"answer": "cat", "annotation": "CAT", "id": 3}]
    r = vqa_driver.score_outputs("chartqa_test_human", outs)
    # 0.42 vs 42% -> equal after % conversion; 41 vs 42 -> within 5%
    assert r["accuracy"] == pytest.approx(1.0)
    r = vqa_driver.score_outputs("gqa_testdev", [
        {"answer": " Cat ", "annotation": "cat", "questionId": 1, "id": 1},
        {"answer": "dog", "annotation": "cats", "questionId": 2, "id": 2}])
    assert r["accuracy"] == pytest.approx(0.5)


def test_submission_only_datasets_score_to_note():
    r = vqa_driver.score_outputs("vizwiz_test",
                                 [{"image": "x.jpg", "answer": "a", "id": 0}])
    assert r["metric"] is None and "note" in r


# ---------------------------------------------------------------------------
# Output-record schemas (evaluate_vqa.py:383-419)
# ---------------------------------------------------------------------------


def test_output_record_schemas():
    rec = vqa_driver.output_record("vqav2_val", "q?", 7, "ans", None)
    assert set(rec) == {"question", "question_id", "answer", "id"}
    rec = vqa_driver.output_record("docvqa_val", "q?", 7, "ans", ["gt"])
    assert set(rec) == {"question", "questionId", "answer", "annotation",
                        "id"}
    rec = vqa_driver.output_record("ai2diagram_test", "q?", "img.png", "a",
                                   "B")
    assert set(rec) == {"question", "image", "answer", "annotation", "id"}
    rec = vqa_driver.output_record("chartqa_test_human", "q?", 3, "a", ["42"])
    assert set(rec) == {"question", "answer", "annotation", "id"}
    rec = vqa_driver.output_record("docvqa_test", "q?", 3, "a", None)
    assert set(rec) == {"questionId", "answer", "id"}
    rec = vqa_driver.output_record("vizwiz_test", "q?",
                                   "data/vizwiz/test/i.jpg", "a", None)
    assert rec["image"] == "i.jpg"


def test_dataset_prompts_and_budgets():
    assert vqa_driver.dataset_prompt("ai2diagram_test") == ""
    assert vqa_driver.dataset_prompt("vizwiz_val").startswith(
        "When the provided information is insufficient")
    assert vqa_driver.dataset_prompt("chartqa_test_human") == \
        "Answer the question using a single word or phrase."
    assert vqa_driver.tile_budget("infographicsvqa_val") == 24
    assert vqa_driver.tile_budget("docvqa_test") == 18
    assert vqa_driver.tile_budget("vqav2_val") == 6


# ---------------------------------------------------------------------------
# rectify (eval/longvqa/rectify.py semantics, corpus-free subset)
# ---------------------------------------------------------------------------


def test_rectify_chains():
    r = longvqa_driver.rectify
    assert r("svqa", "B. something") == "B"
    assert r("tabfact", "yes, it is true.") == "Yes"
    assert r("chartqa", "1,234") == "1234"
    assert r("chartqa", "42%") == "42"
    assert r("chartqa", "seven") == "7"
    assert r("chartqa", "[42]") == "42"
    assert r("chartqa", "3/4") == "0.75"
    assert r("chartqa", "12 dollars") == "12"
    assert r("docvqa", "Anything Goes.") == "Anything Goes"  # ANLS: no chain
    # plural2singular lowercases every word (reference semantics too)
    assert r("gqa", "Yes it is") == "yes"


def test_rectify_plural_fallback():
    # rule-based singularization (nltk-less environments)
    assert longvqa_driver.plural2singular("cats") == "cat"
    assert longvqa_driver.plural2singular("berries") == "berry"
    assert longvqa_driver.plural2singular("boxes") == "box"
    assert longvqa_driver.plural2singular("glass") == "glass"


# ---------------------------------------------------------------------------
# End-to-end toy-model runs
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def toy_model():
    import jax

    from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
    from v2pe_tpu.infer.chat import ChatModel
    from v2pe_tpu.models.params import init_vlm_params

    from .test_data_pipeline import _toy_tokenizer

    tokenizer = _toy_tokenizer()
    cfg = VLMConfig(
        vision=VisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=56, patch_size=14),
        llm=LLMConfig(vocab_size=len(tokenizer), hidden_size=32,
                      intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2),
        rope_pos_id_stride=2,
    )
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return ChatModel(params, cfg, tokenizer, attn_impl="jnp")


@pytest.fixture(scope="module")
def img_path(tmp_path_factory):
    from PIL import Image

    p = tmp_path_factory.mktemp("vqa_imgs") / "x.png"
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (64, 80, 3), dtype=np.uint8)).save(p)
    return str(p)


def test_vqa_driver_end_to_end(toy_model, img_path, tmp_path):
    from v2pe_tpu.evalkit import runner
    from v2pe_tpu.infer.generate import GenerationConfig

    items = [{"image": img_path, "question": "What color?",
              "question_id": 10, "answer": "blue", "id": 10},
             {"image": img_path, "question": "How many?",
              "question_id": 11, "answer": ["2", "two"], "id": 11}]
    infer = vqa_driver.build_infer_fn(
        "chartqa_test_human", toy_model, max_tiles=2,
        generation_config=GenerationConfig(max_new_tokens=4))
    out = str(tmp_path / "chartqa.rank0.jsonl")
    n = runner.run_shard(items, infer, out)
    assert n == 2
    outputs = [json.loads(l) for l in open(out)]
    assert set(outputs[0]) == {"question", "answer", "annotation", "id"}
    res = vqa_driver.score_outputs("chartqa_test_human", outputs)
    assert res["n"] == 2 and 0.0 <= res["accuracy"] <= 1.0


def test_longvqa_driver_end_to_end(toy_model, img_path, tmp_path):
    from v2pe_tpu.evalkit import runner
    from v2pe_tpu.infer.generate import GenerationConfig

    items = [{"id": "lv1",
              "conversations": [{"value": "<image>\nWhat is shown?"},
                                {"value": "a chart"}],
              "image": [img_path],
              "metadata": {"context_length": 32000}},
             {"id": "lv2",
              "conversations": [{"value": "Text only question?"},
                                {"value": "42"}],
              "image": [],
              "metadata": {"context_length": 64000}}]
    infer = longvqa_driver.build_infer_fn(
        "chartqa", toy_model, max_tiles=2,
        generation_config=GenerationConfig(max_new_tokens=4))
    out = str(tmp_path / "result_chartqa.rank0.jsonl")
    n = runner.run_shard(items, infer, out)
    assert n == 2
    results = [json.loads(l) for l in open(out)]
    assert set(results[0]) == {"id", "an", "pr", "le"}
    score = longvqa_driver.score_results("chartqa", results)
    assert score["metric"] == "RACC" and score["n"] == 2
    assert "31k" in score["by_context"] and "62k" in score["by_context"]


def test_cli_vqa_and_longvqa_score_only(tmp_path, capsys):
    from v2pe_tpu.evalkit.cli import main

    merged = tmp_path / "chartqa_test_human.jsonl"
    with open(merged, "w") as f:
        f.write(json.dumps({"question": "q", "answer": "42",
                            "annotation": ["42"], "id": 1}) + "\n")
    main(["--benchmark", "vqa", "--task", "chartqa_test_human",
          "--checkpoint", "unused", "--tokenizer", "unused",
          "--data", "unused", "--outputs-dir", str(tmp_path),
          "--score-only"])
    out = json.loads(capsys.readouterr().out)
    assert out["accuracy"] == 1.0

    merged = tmp_path / "result_chartqa.jsonl"
    with open(merged, "w") as f:
        f.write(json.dumps({"id": "a", "an": "1234", "pr": "1,234",
                            "le": 32000}) + "\n")
    main(["--benchmark", "longvqa", "--task", "chartqa",
          "--checkpoint", "unused", "--tokenizer", "unused",
          "--data", "unused", "--outputs-dir", str(tmp_path),
          "--score-only"])
    out = json.loads(capsys.readouterr().out)
    assert out["score"] == 1.0  # rectify strips the comma-in-number
