"""Data pipeline golden tests: dynamic tiling vs the reference
dynamic_preprocess, preprocess_internlm tokenize+mask parity, transforms."""

import numpy as np
import pytest

from v2pe_tpu.data.conversation import get_conv_template
from v2pe_tpu.data.preprocess import (build_prompt, expand_image_tokens,
                                      get_preprocess_function, preprocess,
                                      preprocess_internlm, preprocess_mpt,
                                      preprocess_phi3)
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


def _toy_tokenizer(add_bos=True):
    """Character-level tokenizer with the InternVL special tokens.
    Character-level tokenization is concatenation-stable at any boundary,
    matching the property the reference's label-masking relies on from
    SentencePiece at turn boundaries. add_bos=False models Qwen2-style
    tokenizers (no BOS), which the MPT masking arithmetic assumes."""
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
    if add_bos:
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


# ---------------------------------------------------------------------------
# llama / mpt / phi3 label-masking variants (dataset.py:335-637)

def _toy_tokenizer_multi(add_bos=True):
    """Character-level tokenizer with the special tokens of all four
    template families (Hermes-2 im_start/im_end, phi3 user/assistant/end/
    endoftext, vicuna plain text)."""
    tok = _toy_tokenizer(add_bos=add_bos)
    tok.add_tokens(["<|user|>", "<|assistant|>", "<|system|>", "<|end|>",
                    "<|endoftext|>"], special_tokens=True)
    return tok


MULTI_TURN_SOURCE = [
    {"from": "human", "value": "<image>\nWhat is in the image?"},
    {"from": "gpt", "value": "A cat sitting on a mat."},
    {"from": "human", "value": "Describe more."},
    {"from": "gpt", "value": "The cat is orange."},
    {"from": "human", "value": "What is in the image?"},
    {"from": "gpt", "value": "A cat sitting on a mat."},
]


@pytest.mark.parametrize("template", ["Hermes-2", "phi3-chat", "vicuna_v1.1"])
@pytest.mark.parametrize("source", [SOURCE, MULTI_TURN_SOURCE],
                         ids=["2turn", "3turn"])
def test_prompt_matches_reference_other_templates(template, source):
    reference_util.install_reference()
    from internvl.conversation import get_conv_template as ref_get

    conv = ref_get(template)
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    for s in source:
        conv.append_message(roles[s["from"]], s["value"])
    assert build_prompt(template, source, strip=False) == conv.get_prompt()


@pytest.mark.parametrize("source", [SOURCE, MULTI_TURN_SOURCE],
                         ids=["2turn", "3turn"])
@pytest.mark.parametrize("legacy", [True, False])
def test_preprocess_llama_matches_reference(source, legacy):
    ds = _ref_dataset_module()
    tokenizer = _toy_tokenizer_multi()
    tokenizer.model_max_length = 4096
    tokenizer.legacy = legacy

    ref = ds.preprocess(
        "vicuna_v1.1", [list(map(dict, source))], tokenizer,
        num_image_token_list=[8], ds_name="toy")
    got = preprocess(
        "vicuna_v1.1", [source], tokenizer, num_image_token_list=[8],
        ds_name="toy")
    np.testing.assert_array_equal(np.asarray(got["input_ids"][0]),
                                  ref["input_ids"][0].numpy())
    np.testing.assert_array_equal(np.asarray(got["labels"][0]),
                                  ref["labels"][0].numpy())
    np.testing.assert_array_equal(
        np.asarray(got["attention_mask"][0]),
        ref["attention_mask"][0].numpy().astype(np.int64))


@pytest.mark.parametrize("source", [SOURCE, MULTI_TURN_SOURCE],
                         ids=["2turn", "3turn"])
def test_preprocess_mpt_matches_reference(source):
    ds = _ref_dataset_module()
    # Hermes-2/mpt turn arithmetic assumes a no-BOS (Qwen2-style) tokenizer
    tokenizer = _toy_tokenizer_multi(add_bos=False)
    tokenizer.model_max_length = 4096

    ref = ds.preprocess_mpt(
        "Hermes-2", [list(map(dict, source))], tokenizer,
        num_image_token_list=[8], ds_name="toy")
    got = preprocess_mpt(
        "Hermes-2", [source], tokenizer, num_image_token_list=[8],
        ds_name="toy")
    np.testing.assert_array_equal(np.asarray(got["input_ids"][0]),
                                  ref["input_ids"][0].numpy())
    np.testing.assert_array_equal(np.asarray(got["labels"][0]),
                                  ref["labels"][0].numpy())
    labels = np.asarray(got["labels"][0])
    assert (labels != -100).sum() > 0 and (labels == -100).sum() > 0


@pytest.mark.parametrize("source", [SOURCE, MULTI_TURN_SOURCE],
                         ids=["2turn", "3turn"])
def test_preprocess_phi3_matches_reference(source):
    ds = _ref_dataset_module()
    tokenizer = _toy_tokenizer_multi()
    tokenizer.model_max_length = 4096

    ref = ds.preprocess_phi3(
        "phi3-chat", [list(map(dict, source))], tokenizer,
        num_image_token_list=[8], ds_name="toy")
    got = preprocess_phi3(
        "phi3-chat", [source], tokenizer, num_image_token_list=[8],
        ds_name="toy")
    np.testing.assert_array_equal(np.asarray(got["input_ids"][0]),
                                  ref["input_ids"][0].numpy())
    np.testing.assert_array_equal(np.asarray(got["labels"][0]),
                                  ref["labels"][0].numpy())

    # The phi3 turn arithmetic bakes in real Phi-3 tokenizer quirks the toy
    # char tokenizer can't replicate, so with a huge model_max_length both
    # implementations identically nuke the sample (dataset.py:624-631).
    # Re-run in the truncation regime (cur_len >= model_max_length skips the
    # guard) and check the partially-supervised path is also bit-identical.
    tokenizer2 = _toy_tokenizer_multi()
    tokenizer2.model_max_length = 150
    ref2 = ds.preprocess_phi3(
        "phi3-chat", [list(map(dict, source))], tokenizer2,
        num_image_token_list=[8], ds_name="toy")
    got2 = preprocess_phi3(
        "phi3-chat", [source], tokenizer2, num_image_token_list=[8],
        ds_name="toy", max_length=150)
    np.testing.assert_array_equal(np.asarray(got2["labels"][0]),
                                  ref2["labels"][0].numpy())
    labels2 = np.asarray(got2["labels"][0])
    assert (labels2 != -100).sum() > 0 and (labels2 == -100).sum() > 0


def test_get_preprocess_function_dispatch():
    assert get_preprocess_function("Hermes-2") is preprocess_mpt
    assert get_preprocess_function("internlm2-chat") is preprocess_internlm
    assert get_preprocess_function("internvl2_5") is preprocess_internlm
    assert get_preprocess_function("phi3-chat") is preprocess_phi3
    assert get_preprocess_function("vicuna_v1.1") is preprocess
