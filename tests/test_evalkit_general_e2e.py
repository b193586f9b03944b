"""End-to-end general-suite eval runs: toy random-weight ChatModel ->
general.build_infer_fn -> runner.run_shard -> merged jsonl -> scorer, plus
the CLI --score-only route. Mirrors the reference flow of
eval/{mmmu,pope,scienceqa,seed}/evaluate_*.py at miniature scale."""

import json
import os

import jax
import numpy as np
import pytest

from v2pe_tpu.core.config import LLMConfig, VLMConfig, VisionConfig
from v2pe_tpu.evalkit import general, runner
from v2pe_tpu.infer.chat import ChatModel
from v2pe_tpu.infer.generate import GenerationConfig
from v2pe_tpu.models.params import init_vlm_params

from .test_data_pipeline import _toy_tokenizer


@pytest.fixture(scope="module")
def toy_model():
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

    p = tmp_path_factory.mktemp("imgs") / "x.png"
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (64, 80, 3), dtype=np.uint8)).save(p)
    return str(p)


GC = GenerationConfig(max_new_tokens=4)


def _run(benchmark, items, model, tmp_path, **kw):
    infer = general.build_infer_fn(benchmark, model, max_tiles=2,
                                   generation_config=GC, **kw)
    out = str(tmp_path / f"{benchmark}.rank0.jsonl")
    id_key = general.ID_KEYS[benchmark]
    n = runner.run_shard(items, infer, out, id_key=id_key)
    assert n == len(items)
    merged = str(tmp_path / f"{benchmark}.jsonl")
    runner.merge_shards([out], merged, id_key=id_key)
    return merged


def test_mmmu_end_to_end(toy_model, img_path, tmp_path):
    items = [
        {"id": "a1", "category": "Art", "question_type": "multiple-choice",
         "question": "What is shown?", "options": ["cat", "dog"],
         "answer": "A", "image": img_path},
        {"id": "a2", "category": "Art", "question_type": "open",
         "question": "How many?", "options": [], "answer": "2",
         "image": img_path},
    ]
    merged = _run("mmmu", items, toy_model, tmp_path)
    res = general.score_file("mmmu", merged)
    assert res["overall"]["num_example"] == 2
    assert 0.0 <= res["overall"]["acc"] <= 1.0


def test_scienceqa_and_seed_end_to_end(toy_model, img_path, tmp_path):
    sq_items = [{"id": "q1", "question": "Which?", "choices": ["x", "y"],
                 "hint": "think", "answer": 0, "image": img_path}]
    merged = _run("scienceqa", sq_items, toy_model, tmp_path)
    res = general.score_file("scienceqa", merged)
    assert res["num"] == 1

    seed_items = [{"question_id": "s1", "text": "Pick A or B.",
                   "image": img_path, "answer": "A", "question_type_id": 1}]
    merged = _run("seed", seed_items, toy_model, tmp_path)
    res = general.score_file("seed", merged)
    assert "total" in res and "image" in res


def test_pope_end_to_end(toy_model, img_path, tmp_path):
    items = [
        {"question_id": 1, "category": "random", "order": 0,
         "image": img_path, "text": "Is there a dog?"},
        {"question_id": 2, "category": "random", "order": 1,
         "image": img_path, "text": "Is there a cat?"},
    ]
    with open(tmp_path / "coco_pope_random.json", "w") as f:
        f.write(json.dumps({"label": "yes"}) + "\n")
        f.write(json.dumps({"label": "no"}) + "\n")
    merged = _run("pope", items, toy_model, tmp_path)
    res = general.score_file(
        "pope", merged,
        pope_label_files={"random": str(tmp_path / "coco_pope_random.json")})
    assert set(res["random"]) >= {"TP", "FP", "TN", "FN", "f1", "accuracy",
                                  "precision", "recall", "yes_ratio"}


def test_mmbench_end_to_end_tsv(toy_model, tmp_path):
    """TSV with base64 image, through the mmbench route incl. submission."""
    import base64
    import io

    from PIL import Image

    from v2pe_tpu.evalkit import mmbench

    buf = io.BytesIO()
    Image.fromarray(np.random.RandomState(1).randint(
        0, 255, (64, 64, 3), dtype=np.uint8)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    tsv = tmp_path / "bench.tsv"
    with open(tsv, "w") as f:
        f.write("index\tquestion\tA\tB\thint\tanswer\timage\n")
        f.write(f"1\tWhat animal?\tcat\tdog\t\tA\t{b64}\n")
    rows = mmbench.read_tsv(str(tsv))
    merged = _run("mmbench", rows, toy_model, tmp_path)
    res = general.score_file("mmbench", merged)
    assert res["num"] == 1

    outputs = [json.loads(l) for l in open(merged)]
    sub = tmp_path / "sub.jsonl"
    mmbench.write_submission(rows, outputs, str(sub))
    rec = json.loads(open(sub).read())
    assert rec["index"] == "1" and "image" not in rec


def test_cli_score_only_route(tmp_path, capsys):
    """CLI --score-only scores an existing merged file without a model."""
    from v2pe_tpu.evalkit.cli import main

    merged = tmp_path / "mmmu.jsonl"
    with open(merged, "w") as f:
        f.write(json.dumps({
            "id": "x", "category": "Art",
            "question_type": "multiple-choice", "options": ["a", "b"],
            "answer": "A", "prediction": "(A)"}) + "\n")
    main(["--benchmark", "mmmu", "--checkpoint", "unused",
          "--tokenizer", "unused", "--data", "unused",
          "--outputs-dir", str(tmp_path), "--score-only"])
    out = json.loads(capsys.readouterr().out)
    assert out["overall"]["acc"] == 1.0


def test_pope_engine_batched_matches_sequential(toy_model, img_path,
                                                tmp_path):
    """--engine-rows path: the same benchmark run through EngineChat +
    threaded run_shard produces records identical to the sequential
    ChatModel run (greedy engine/chat parity extends to the eval stack)."""
    from v2pe_tpu.serve.engine import EngineChat

    items = [
        {"question_id": i, "category": "random", "order": i,
         "image": img_path, "text": q}
        for i, q in enumerate(["Is there a dog?", "Is there a cat?",
                               "Is there a tree?", "Is there a car?"])
    ]
    merged_seq = _run("pope", items, toy_model, tmp_path)

    ec = EngineChat(toy_model, max_rows=2, max_len=1024, page_size=8,
                    chunk_size=64, decode_block=4)
    try:
        infer = general.build_infer_fn("pope", ec, max_tiles=2,
                                       generation_config=GC)
        out = str(tmp_path / "pope_eng.rank0.jsonl")
        id_key = general.ID_KEYS["pope"]
        n = runner.run_shard(items, infer, out, id_key=id_key, workers=2)
        assert n == len(items)
        merged_eng = str(tmp_path / "pope_eng.jsonl")
        runner.merge_shards([out], merged_eng, id_key=id_key)
    finally:
        ec.stop()

    seq = {r[id_key]: r for r in map(json.loads, open(merged_seq))}
    eng = {r[id_key]: r for r in map(json.loads, open(merged_eng))}
    assert seq == eng
