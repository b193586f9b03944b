"""Metrics sinks: jsonl records, tensorboard event files, fan-out hook."""

import json
import os


def test_jsonl_and_tensorboard_sinks(tmp_path):
    from v2pe_tpu.train.metrics import build_metrics_hook

    out = str(tmp_path)
    hook = build_metrics_hook(out, ["jsonl", "tensorboard"])
    hook(1, {"loss": 2.5, "grad_norm": 1.25})
    hook(2, {"loss": 2.0, "grad_norm": 1.0})

    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert [r["step"] for r in rows] == [1, 2]
    assert rows[1]["loss"] == 2.0

    tb_files = os.listdir(os.path.join(out, "tb"))
    assert any("tfevents" in f for f in tb_files)


def test_unknown_sink_raises(tmp_path):
    import pytest

    from v2pe_tpu.train.metrics import build_metrics_hook

    with pytest.raises(ValueError, match="unknown metrics sink"):
        build_metrics_hook(str(tmp_path), ["wandb"])


def test_extra_hook_fanout(tmp_path):
    from v2pe_tpu.train.metrics import build_metrics_hook

    got = []
    hook = build_metrics_hook(str(tmp_path), ["jsonl"],
                              extra_hook=lambda s, m: got.append((s, m)))
    hook(7, {"loss": 1.0})
    assert got == [(7, {"loss": 1.0})]
