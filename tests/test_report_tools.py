"""Report tooling: milebench category table + MM-NIAH markdown rendering
(parity with eval/milebench/print_table_result.py and
eval/mm_niah/visualization.py)."""

import json
import os

import numpy as np
import pytest

from v2pe_tpu.evalkit.report import (main, milebench_category_averages,
                                     milebench_table, mm_niah_item_markdown)


def _result():
    return {
        "Temporal": {
            "ActionLocalization": {"Accuracy": 0.5},
            "ActionPrediction": {"Accuracy": 0.7},
            "ActionSequence": {"Accuracy": 0.6},
        },
        "Semantic": {
            "WebQA": {"Rouge-L f": 0.25},
            "TQA": {"Accuracy": 0.75},
        },
        "Needle": {"TextNeedleInAHaystack": {"Accuracy": 1.0}},
    }


def test_category_averages():
    av = milebench_category_averages(_result())
    assert av["T-1"] == pytest.approx(60.0)          # mean(.5,.7,.6)*100
    assert av["S-1"] == pytest.approx(50.0)          # rouge fallback for WebQA
    assert av["N-1"] == pytest.approx(100.0)
    assert av["I-1"] == 0.0                          # absent -> 0


def test_table_format_and_sorting():
    table = milebench_table({"modelB": _result(), "ModelA": _result()})
    lines = table.splitlines()
    assert lines[0].split() == ["Category", "ModelA", "modelB"]  # ci-sorted
    assert len(lines) == 13                          # header + 12 categories
    t1 = [ln for ln in lines if ln.startswith("T-1")][0]
    assert t1.split() == ["T-1", "60.0", "60.0"]


def test_mm_niah_markdown(tmp_path):
    from PIL import Image

    img = Image.fromarray(np.random.RandomState(0)
                          .randint(0, 255, (16, 16, 3), np.uint8))
    img.save(tmp_path / "a.jpg")
    item = {
        "context": "Before <image> the secret word is rainbow. After.",
        "question": "What was the secret word?",
        "answer": 1,
        "images_list": ["a.jpg"],
        "meta": {
            "needles": ["the secret word is rainbow"],
            "placed_depth": [0.5],
            "context_length": 100,
            "num_images": 1,
            "choices": ["sun", "rainbow"],
            "choices_image_path": None,
        },
    }
    md = mm_niah_item_markdown(item, str(tmp_path))
    assert "data:image/jpeg;base64," in md
    assert " `the secret word is rainbow` " in md.replace("\\", "")
    assert "B. rainbow" in md                        # lettered choices
    assert "## Answer\n\nB" in md                    # int answer -> letter
    assert "<image>" not in md                       # placeholder consumed
    # angle brackets escaped (visualization.py:115)
    assert "\\<" not in md or "<" not in md.replace("\\<", "")


def test_combine_images_dataset(tmp_path):
    """MileBench image pre-combining: grid merge + json rewrite
    (eval/milebench/combine_images.py parity)."""
    from PIL import Image

    from v2pe_tpu.evalkit.report import combine_milebench_dataset

    ds = tmp_path / "ALFRED"
    (ds / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rng.randint(0, 255, (40, 60, 3), np.uint8)).save(
            ds / "images" / f"im{i}.jpg")
    data = {"data": [{
        "sample_id": "s0",
        "task_instance": {"images_path": [f"im{i}.jpg" for i in range(5)]},
    }]}
    with open(ds / "ALFRED.json", "w") as f:
        json.dump(data, f)

    out_json = combine_milebench_dataset(str(tmp_path), "ALFRED", 2)
    with open(out_json) as f:
        new = json.load(f)
    combined = new["data"][0]["task_instance"]["combined_2_images"]
    # 5 images, budget 2 -> combine_num = 3 -> 2 grids (3 + 2)
    assert combined == ["s0-0.jpg", "s0-1.jpg"]
    g0 = Image.open(ds / "combined_2_images" / "s0-0.jpg")
    assert g0.size == (1600, 1600)  # 2x2 grid of 800px cells (3 images)


def test_cli_roundtrip(tmp_path, capsys):
    d = tmp_path / "my_model"
    d.mkdir()
    with open(d / "milebench_result.json", "w") as f:
        json.dump(_result(), f)
    main(["milebench", str(d / "milebench_result.json")])
    out = capsys.readouterr().out
    assert "my_model" in out and "T-1" in out

    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / "x.jpg")
    ann = tmp_path / "ann.jsonl"
    with open(ann, "w") as f:
        f.write(json.dumps({
            "context": "c <image>", "question": "q?", "answer": "yes",
            "images_list": ["x.jpg"], "meta": {"needles": []}}) + "\n")
    outmd = tmp_path / "out.md"
    main(["mm-niah-item", str(ann), "0", "--image-dir", str(tmp_path),
          "-o", str(outmd)])
    assert os.path.exists(outmd)
    assert "## Question" in outmd.read_text()
