"""Data pipeline golden tests: dynamic tiling vs the reference
dynamic_preprocess, preprocess_internlm tokenize+mask parity, transforms."""

import numpy as np
import pytest

from v2pe_tpu.data.conversation import get_conv_template
from v2pe_tpu.data.preprocess import build_prompt, expand_image_tokens, \
    preprocess_internlm
from v2pe_tpu.data.tiling import dynamic_preprocess, plan_tiles
from v2pe_tpu.data.transforms import build_transform

from . import reference_util


def _ref_dataset_module():
    reference_util.install_reference()
    import internvl.train.dataset as ds

    return ds


SIZES = [(448, 448), (1024, 512), (512, 1024), (1920, 1080), (333, 777),
         (5000, 400), (448, 449), (100, 100)]


@pytest.mark.parametrize("w,h", SIZES)
@pytest.mark.parametrize("max_num", [6, 12])
def test_tiling_matches_reference(w, h, max_num):
    ds = _ref_dataset_module()
    from PIL import Image

    rng = np.random.RandomState(w % 100 + h % 100)
    img = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))

    ref_tiles, ref_boxes = ds.dynamic_preprocess(
        img, min_num=1, max_num=max_num, image_size=448, use_thumbnail=True,
        return_box=True)
    got_tiles, got_boxes = dynamic_preprocess(
        img, min_num=1, max_num=max_num, image_size=448, use_thumbnail=True,
        return_box=True)

    assert len(got_tiles) == len(ref_tiles)
    assert got_boxes == ref_boxes
    for a, b in zip(got_tiles, ref_tiles):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_plan_tiles_counts():
    # square -> 1 tile (no thumbnail when single)
    assert plan_tiles(448, 448, max_num=12, use_thumbnail=True)[2] == 1
    # 2:1 landscape -> grid (several tiles) + thumbnail
    gw, gh, n, _ = plan_tiles(1024, 512, max_num=12, use_thumbnail=True)
    assert gw / gh == 2 and n == gw * gh + 1


def _toy_tokenizer():
    """Character-level tokenizer with the InternVL special tokens.
    Character-level tokenization is concatenation-stable at any boundary,
    matching the property the reference's label-masking relies on from
    SentencePiece at turn boundaries."""
    from tokenizers import Regex, Tokenizer, models, pre_tokenizers
    from tokenizers.processors import TemplateProcessing
    from transformers import PreTrainedTokenizerFast

    corpus = (
        "<|im_start|>system\nuser assistant<|im_end|>"
        "你是由上海人工智能实验室联合商汤科技开发的书生多模态大模型，英文名叫InternVL, "
        "是一个有用无害的人工智能助手。"
        "What is in the image? A cat sitting on a mat. Describe more."
        "The cat is orange."
    )
    chars = sorted(set(corpus))
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for c in chars:
        vocab.setdefault(c, len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split(Regex("[\\s\\S]"), "isolated")
    tok.post_processor = TemplateProcessing(
        single="<s> $A", special_tokens=[("<s>", 1)])
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>")
    fast.add_tokens(["<|im_start|>", "<|im_end|>"], special_tokens=True)
    fast.add_tokens(["<img>", "</img>", "<IMG_CONTEXT>"], special_tokens=True)
    return fast


SOURCE = [
    {"from": "human", "value": "<image>\nWhat is in the image?"},
    {"from": "gpt", "value": "A cat sitting on a mat."},
    {"from": "human", "value": "Describe more."},
    {"from": "gpt", "value": "The cat is orange."},
]


def test_prompt_matches_reference_template():
    reference_util.install_reference()
    from internvl.conversation import get_conv_template as ref_get

    conv = ref_get("internlm2-chat")
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    for j, s in enumerate(SOURCE):
        conv.append_message(roles[s["from"]], s["value"].strip())
    ref_prompt = conv.get_prompt()

    got = build_prompt("internlm2-chat", SOURCE)
    assert got == ref_prompt


def test_preprocess_internlm_matches_reference():
    ds = _ref_dataset_module()
    tokenizer = _toy_tokenizer()
    tokenizer.model_max_length = 4096

    ref = ds.preprocess_internlm(
        "internlm2-chat", [list(map(dict, SOURCE))], tokenizer,
        num_image_token_list=[8], group_by_length=True, ds_name="toy")
    got = preprocess_internlm(
        "internlm2-chat", [SOURCE], tokenizer, num_image_token_list=[8],
        ds_name="toy")

    np.testing.assert_array_equal(np.asarray(got["input_ids"][0]),
                                  ref["input_ids"][0].numpy())
    np.testing.assert_array_equal(np.asarray(got["labels"][0]),
                                  ref["labels"][0].numpy())
    np.testing.assert_array_equal(np.asarray(got["attention_mask"][0]),
                                  ref["attention_mask"][0].numpy().astype(np.int64))
    # masking sanity: some tokens must be supervised and some ignored
    labels = np.asarray(got["labels"][0])
    assert (labels != -100).sum() > 0 and (labels == -100).sum() > 0


def test_expand_image_tokens():
    out = expand_image_tokens("a <image> b <image> c", [2, 3])
    assert out == ("a <img><IMG_CONTEXT><IMG_CONTEXT></img> b "
                   "<img><IMG_CONTEXT><IMG_CONTEXT><IMG_CONTEXT></img> c")


def test_transform_eval_shapes_and_norm():
    from PIL import Image

    img = Image.fromarray(np.full((30, 60, 3), 128, dtype=np.uint8))
    t = build_transform(is_train=False, input_size=448)
    out = t(img)
    assert out.shape == (3, 448, 448)
    expected = (128 / 255.0 - 0.485) / 0.229
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)
