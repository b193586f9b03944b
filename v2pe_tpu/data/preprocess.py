"""Tokenization + assistant-only label masking.

Behavior parity with ``preprocess_internlm``
(``internvl/train/dataset.py:640-727``): apply the chat template, replace
each ``<image>`` with ``<img> + <IMG_CONTEXT>*n + </img>``, tokenize, and
mask everything except assistant answers to IGNORE (-100) by re-tokenizing
turn fragments; on a length mismatch the whole sample is masked with a
warning."""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import numpy as np

from v2pe_tpu.data.constants import (IGNORE_TOKEN_ID, IMG_CONTEXT_TOKEN,
                                     IMG_END_TOKEN, IMG_START_TOKEN)
from v2pe_tpu.data.conversation import get_conv_template

logger = logging.getLogger(__name__)


def build_prompt(template_name: str, source: Sequence[dict]) -> str:
    """source: [{'from': 'human'|'gpt', 'value': str}, ...]."""
    conv = get_conv_template(template_name)
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    if roles[source[0]["from"]] != conv.roles[0]:
        source = source[1:]
    for j, sentence in enumerate(source):
        role = roles[sentence["from"]]
        assert role == conv.roles[j % 2], "conversation roles must alternate"
        conv.append_message(role, sentence["value"].strip())
    return conv.get_prompt()


def expand_image_tokens(conversation: str,
                        num_image_token_list: Sequence[int]) -> str:
    """Replace each '<image>' in order with its <img>...</img> span."""
    for n in num_image_token_list:
        image_tokens = f"{IMG_START_TOKEN}{IMG_CONTEXT_TOKEN * n}{IMG_END_TOKEN}"
        conversation = conversation.replace("<image>", image_tokens, 1)
    return conversation


def preprocess_internlm(
    template_name: str,
    sources: Sequence[Sequence[dict]],
    tokenizer,
    num_image_token_list: Sequence[int],
    *,
    text_only: bool = False,
    ds_name: Optional[str] = None,
    num_image: int = 1,
    max_length: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Returns dict(input_ids (B,S), labels (B,S), attention_mask (B,S))
    as numpy (no padding — packing handles static shapes downstream)."""
    conv = get_conv_template(template_name)
    conversations = [build_prompt(template_name, s) for s in sources]
    if not text_only:
        conversations = [
            expand_image_tokens(c, num_image_token_list[:num_image])
            for c in conversations
        ]

    enc = tokenizer(conversations, truncation=max_length is not None,
                    max_length=max_length)
    all_ids, all_labels, all_masks = [], [], []
    for conversation, ids in zip(conversations, enc["input_ids"]):
        ids = np.asarray(ids, dtype=np.int64)
        target = ids.copy()
        total_len = int((ids != tokenizer.pad_token_id).sum())

        cur_len = 1
        target[:cur_len] = IGNORE_TOKEN_ID  # <s>
        parts = conversation.split(conv.roles[1])
        info = parts[0] + conv.roles[1]
        temp_len = len(tokenizer(info)["input_ids"]) - 1
        target[cur_len:cur_len + temp_len] = IGNORE_TOKEN_ID
        cur_len += temp_len

        for index in range(1, len(parts) - 1):
            info = parts[index]
            part1, part2 = info.split(conv.roles[0])
            temp_len = len(tokenizer(part1)["input_ids"]) - 1
            cur_len += temp_len
            part = conv.roles[0] + part2 + conv.roles[1]
            temp_len = len(tokenizer(part)["input_ids"]) - 1
            target[cur_len:cur_len + temp_len] = IGNORE_TOKEN_ID
            cur_len += temp_len
        last_info = parts[-1]
        temp_len = len(tokenizer(last_info)["input_ids"]) - 1
        cur_len += temp_len

        target[cur_len:] = IGNORE_TOKEN_ID
        if cur_len != total_len:
            target[:] = IGNORE_TOKEN_ID
            logger.warning(
                "tokenization mismatch: %d vs. %d (dataset %s)",
                cur_len, total_len, ds_name)

        all_ids.append(ids)
        all_labels.append(target)
        all_masks.append((ids != tokenizer.pad_token_id).astype(np.int64))

    return {
        "input_ids": all_ids,
        "labels": all_labels,
        "attention_mask": all_masks,
    }
