"""Golden parity tests for the V2PE position-id builder against the reference
implementation (`internvl/model/internvl_chat/modeling_internvl_chat.py:637-709`),
executed on CPU torch."""

import random

import numpy as np
import pytest

from v2pe_tpu.positional import build_v2pe_pos_ids

from . import reference_util

IMG_START_ID = 900
IMG_END_ID = 901
IMG_CONTEXT_ID = 902
NUM_IMAGE_TOKEN = 256


class _FakeTok:
    def convert_tokens_to_ids(self, tok):
        return {"<img>": IMG_START_ID, "</img>": IMG_END_ID}[tok]


def _make_sequence(num_tiles, text_lens, pad=0, rng=None):
    """Build input_ids: text0 <img> ctx*256*t0 </img> text1 <img> ... textN [pad]."""
    rng = rng or random.Random(0)
    ids = []
    for i, nt in enumerate(num_tiles):
        ids += [rng.randrange(10, 800) for _ in range(text_lens[i])]
        ids += [IMG_START_ID] + [IMG_CONTEXT_ID] * (NUM_IMAGE_TOKEN * nt) + [IMG_END_ID]
    ids += [rng.randrange(10, 800) for _ in range(text_lens[len(num_tiles)])]
    mask = [1] * len(ids) + [0] * pad
    ids += [0] * pad
    return np.array(ids, dtype=np.int64), np.array(mask, dtype=np.int64)


def _reference_pos_ids(ids, mask, num_tiles, version, stride, seed=None):
    reference_util.install_reference()
    import torch
    from internvl.model.internvl_chat.modeling_internvl_chat import get_rope_pos_id

    if seed is not None:
        random.seed(seed)
    ret = {
        "input_ids": torch.from_numpy(ids)[None],
        "attention_mask": torch.from_numpy(mask)[None],
    }
    position_id = torch.cumsum(ret["attention_mask"][0], dim=0) - 1
    out = get_rope_pos_id(
        ret,
        num_tiles=list(num_tiles),
        dtype=torch.float32,
        rope_pos_id_version=version,
        position_id=position_id,
        rope_pos_id_stride=stride,
        tokenizer=_FakeTok(),
    )
    return np.array(out, dtype=np.float32)


CASES = [
    # (num_tiles, text_lens, stride)
    ([1], [5, 3], 1),
    ([1], [5, 3], 64),
    ([13], [7, 11], 64),  # 12 tiles + thumbnail
    ([2, 7], [4, 9, 2], 16),
    ([5, 1, 12], [1, 1, 1, 6], 256),
    ([3], [0, 4], 1),  # image at position 0
]


@pytest.mark.parametrize("num_tiles,text_lens,stride", CASES)
def test_v2pe_fix_matches_reference(num_tiles, text_lens, stride):
    ids, mask = _make_sequence(num_tiles, text_lens)
    ref = _reference_pos_ids(ids, mask, num_tiles, "v2pe_fix", stride)
    got = build_v2pe_pos_ids(
        ids, mask, num_tiles,
        img_start_id=IMG_START_ID, img_end_id=IMG_END_ID,
        version="v2pe_fix", stride=stride,
    )
    np.testing.assert_array_equal(got, ref)


def test_v2pe_fix_large_offset_bitmatch():
    """Positions beyond 2^17 exercise float32 rounding in the fractional span.

    stride=64 keeps torch.arange's float32 length computation exact, so the
    reference still works there and we can bit-match it.
    """
    ids, mask = _make_sequence([9, 9, 9], [150_000, 20, 10, 5])
    ref = _reference_pos_ids(ids, mask, [9, 9, 9], "v2pe_fix", 64)
    got = build_v2pe_pos_ids(
        ids, mask, [9, 9, 9],
        img_start_id=IMG_START_ID, img_end_id=IMG_END_ID,
        version="v2pe_fix", stride=64,
    )
    np.testing.assert_array_equal(got, ref)


def test_v2pe_fix_large_offset_stride1_correct_count():
    """Where the reference CRASHES: torch.arange computes the element count in
    float32, so at offsets >= 2^17 with stride 1 the reference produces one
    fewer visual position and trips its own shape assert
    (modeling_internvl_chat.py:707). Our builder always emits exactly
    num_image_token * num_tile visual positions."""
    ids, mask = _make_sequence([9], [150_000, 5])
    got = build_v2pe_pos_ids(
        ids, mask, [9],
        img_start_id=IMG_START_ID, img_end_id=IMG_END_ID,
        version="v2pe_fix", stride=1,
    )
    assert got.shape == ids.shape
    img_start = 150_000  # index of <img>, whose position is also 150000
    # final visual token sits at pos(<img>) + stride*num_tile = 150000 + 9
    np.testing.assert_allclose(got[img_start + 256 * 9], 150_009.0)


def test_v2pe_rnd_matches_reference_seeded():
    ids, mask = _make_sequence([2, 3, 1], [4, 5, 6, 7])
    ref = _reference_pos_ids(ids, mask, [2, 3, 1], "v2pe_rnd", None, seed=1234)
    random.seed(1234)
    got = build_v2pe_pos_ids(
        ids, mask, [2, 3, 1],
        img_start_id=IMG_START_ID, img_end_id=IMG_END_ID,
        version="v2pe_rnd",
    )
    np.testing.assert_array_equal(got, ref)


def test_default_matches_reference():
    ids, mask = _make_sequence([2], [4, 5])
    ref = _reference_pos_ids(ids, mask, [2], "default", None)
    got = build_v2pe_pos_ids(
        ids, mask, [2],
        img_start_id=IMG_START_ID, img_end_id=IMG_END_ID,
        version="default",
    )
    np.testing.assert_array_equal(got.astype(np.float32), ref)
    # default == plain cumsum positions
    np.testing.assert_array_equal(got, np.arange(len(ids)))


def test_padding_positions_forced_to_one():
    ids, mask = _make_sequence([1], [5, 3], pad=7)
    got = build_v2pe_pos_ids(
        ids, mask, [1],
        img_start_id=IMG_START_ID, img_end_id=IMG_END_ID,
        version="v2pe_fix", stride=32,
    )
    ref = _reference_pos_ids(ids, mask, [1], "v2pe_fix", 32)
    np.testing.assert_array_equal(got, ref)
    assert (got[-7:] == 1).all()


def test_no_image_sequence():
    ids = np.arange(10, 30, dtype=np.int64)
    mask = np.ones_like(ids)
    got = build_v2pe_pos_ids(
        ids, mask, [],
        img_start_id=IMG_START_ID, img_end_id=IMG_END_ID,
        version="v2pe_fix", stride=64,
    )
    np.testing.assert_array_equal(got, np.arange(20, dtype=np.float32))


def test_fractional_stride_values():
    """stride=64 → visual tokens advance by 0.25 each; a 1-tile image spans
    exactly `stride` integer positions."""
    ids, mask = _make_sequence([1], [4, 2])
    got = build_v2pe_pos_ids(
        ids, mask, [1],
        img_start_id=IMG_START_ID, img_end_id=IMG_END_ID,
        version="v2pe_fix", stride=64,
    )
    # text: 0..4 (incl <img> at idx 4); visual: 4+0.25, ..., 4+64
    assert got[4] == 4.0
    np.testing.assert_allclose(got[5], 4.25)
    np.testing.assert_allclose(got[4 + 256], 68.0)
    # </img> continues at ceil(68)+1 == 69
    assert got[4 + 256 + 1] == 69.0
