"""Data validator + eval CLI parser tests."""

import numpy as np

from v2pe_tpu.data.datasets import build_datasets
from v2pe_tpu.data.validate import validate_datasets, validate_sample
from v2pe_tpu.evalkit.cli import build_argparser

from .test_datasets_packing import tokenizer, toy_dataset  # fixtures


def test_validate_toy_dataset(toy_dataset, tokenizer, tmp_path):
    dsets = build_datasets(
        toy_dataset, tokenizer, image_size=56, num_image_token=4,
        max_dynamic_patch=6, rope_pos_id_stride=2)
    ids = {
        "img_start_id": tokenizer.convert_tokens_to_ids("<img>"),
        "img_end_id": tokenizer.convert_tokens_to_ids("</img>"),
        "img_context_id": tokenizer.convert_tokens_to_ids("<IMG_CONTEXT>"),
    }
    report = validate_datasets(dsets, num_image_token=4, **ids,
                               error_log_path=str(tmp_path / "errs.json"))
    assert report["num_errors"] == 0
    assert report["counts"]["toy"]["ok"] == 12


def test_validate_catches_broken_sample():
    sample = {
        "input_ids": np.array([1, 900, 902, 902, 901, 5]),  # 2 ctx tokens
        "num_tiles": [1],
        "image_flags": np.array([1]),
        "labels": np.array([-100] * 6),
        "pos_ids": np.arange(6, dtype=np.float32),
    }
    errs = validate_sample(sample, num_image_token=4, img_start_id=900,
                           img_end_id=901, img_context_id=902)
    assert any("IMG_CONTEXT count" in e for e in errs)
    assert any("fully masked" in e for e in errs)


def test_eval_cli_parser():
    a = build_argparser().parse_args([
        "--benchmark", "mm_niah", "--checkpoint", "c", "--tokenizer", "t",
        "--data", "d.jsonl", "--outputs-dir", "o", "--world", "4",
        "--rank", "2", "--rope_pos_id_stride", "64"])
    assert a.world == 4 and a.rope_pos_id_stride == 64
