"""HF-compatible chat API surface.

Mirrors ``InternVLChatModel.chat`` / ``batch_chat``
(modeling_internvl_chat.py:386-563): conversation templating with history,
'<image>' -> '<img>' + <IMG_CONTEXT>*num_image_token*tiles + '</img>'
expansion (:472-474), V2PE position ids via the shared builder (:483-531),
dynamic tiling, and decode through infer/generate.py."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from v2pe_tpu.core.config import VLMConfig
from v2pe_tpu.data.constants import (IMG_CONTEXT_TOKEN, IMG_END_TOKEN,
                                     IMG_START_TOKEN)
from v2pe_tpu.data.conversation import get_conv_template
from v2pe_tpu.data.tiling import dynamic_preprocess
from v2pe_tpu.data.transforms import build_transform
from v2pe_tpu.infer.generate import GenerationConfig, generate
from v2pe_tpu.positional import build_v2pe_pos_ids


class ChatModel:
    """Stateless-weights chat wrapper: holds params/config/tokenizer and
    exposes chat()/batch_chat() with reference-compatible semantics."""

    def __init__(self, params, cfg: VLMConfig, tokenizer,
                 attn_impl: str = "auto", cache_mode: str = "dense",
                 page_size: int = 128, kv_dtype=None, weights_dtype=None,
                 lora=None):
        if lora is not None:
            # a trained adapter tree (train --use_llm_lora/--use_backbone_
            # lora checkpoint): merge exactly into the base weights once at
            # load — inference then costs the same as the full model
            import jax

            from v2pe_tpu.models.lora import merge_lora

            params = jax.jit(merge_lora)(params, lora)
        if weights_dtype in ("int8", "int4"):
            # int8/int4 weight-only serving (ops/quantized_matmul.py):
            # every consumer of self.params — chat/generate/ChatSession/
            # InferenceEngine/ModelWorker — decodes against the quantized
            # LLM weights (near-2x / near-4x the weight-bandwidth decode
            # ceiling; int4 is group-128 symmetric)
            from v2pe_tpu.ops.quantized_matmul import quantize_llm_params

            bits = 8 if weights_dtype == "int8" else 4
            params = {**params,
                      "llm": quantize_llm_params(params["llm"], bits=bits)}
        elif weights_dtype is not None:
            raise NotImplementedError(f"weights_dtype={weights_dtype!r}")
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.attn_impl = attn_impl
        # 'paged' routes decode through the Pallas paged-attention kernels
        # (ops/paged_attention.py) — ~roofline decode at long context and a
        # shared page pool across ragged batch rows
        self.cache_mode = cache_mode
        self.page_size = page_size
        self.kv_dtype = kv_dtype  # 'int8'/'int4': quantized paged pool
        self.weights_dtype = weights_dtype
        self.img_context_token_id = tokenizer.convert_tokens_to_ids(
            IMG_CONTEXT_TOKEN)
        self.img_start_id = tokenizer.convert_tokens_to_ids(IMG_START_TOKEN)
        self.img_end_id = tokenizer.convert_tokens_to_ids(IMG_END_TOKEN)
        self.conv_template = get_conv_template(cfg.template)
        self.system_message = self.conv_template.system_message

    # ------------------------------------------------------------- images
    def load_pixels(self, image, max_num: Optional[int] = None):
        """PIL image -> (tiles (n,3,sz,sz) float32, num_tiles)."""
        sz = self.cfg.force_image_size or self.cfg.vision.image_size
        tiles = dynamic_preprocess(
            image, min_num=self.cfg.min_dynamic_patch,
            max_num=max_num or self.cfg.max_dynamic_patch,
            image_size=sz, use_thumbnail=self.cfg.use_thumbnail,
        ) if self.cfg.dynamic_image_size else [image]
        transform = build_transform(is_train=False, input_size=sz)
        return np.stack([transform(t) for t in tiles]), len(tiles)

    # -------------------------------------------------------------- prompt
    def build_query(self, question: str, num_patches_list: Sequence[int],
                    history=None) -> str:
        conv = self.conv_template.copy()
        conv.system_message = self.system_message
        for old_q, old_a in (history or []):
            conv.append_message(conv.roles[0], old_q)
            conv.append_message(conv.roles[1], old_a)
        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], None)
        query = conv.get_prompt()
        for num_patches in num_patches_list:
            tokens = (IMG_START_TOKEN
                      + IMG_CONTEXT_TOKEN * self.cfg.num_image_token
                      * num_patches + IMG_END_TOKEN)
            query = query.replace("<image>", tokens, 1)
        return query

    def encode_chat(self, question: str, num_patches_list, history=None,
                    rope_pos_id_version: Optional[str] = None,
                    rope_pos_id_stride: Optional[int] = None):
        """Template + tokenize + V2PE positions for one chat turn: returns
        (ids int64, pos float32, query str). Shared by :meth:`chat`, the
        serving worker, and the continuous-batching engine."""
        query = self.build_query(question, num_patches_list, history)
        ids = np.asarray(self.tokenizer(query)["input_ids"], np.int64)
        version = rope_pos_id_version or self.cfg.rope_pos_id_version
        stride = rope_pos_id_stride or self.cfg.rope_pos_id_stride
        if num_patches_list and version != "default":
            pos = build_v2pe_pos_ids(
                ids, np.ones_like(ids), num_patches_list,
                img_start_id=self.img_start_id, img_end_id=self.img_end_id,
                num_image_token=self.cfg.num_image_token,
                version=version, stride=stride)
        else:
            pos = np.arange(len(ids), dtype=np.float32)
        return ids, pos.astype(np.float32), query

    # ---------------------------------------------------------------- chat
    def chat(
        self,
        pixel_values: Optional[np.ndarray],  # (T,3,sz,sz) or None
        question: str,
        generation_config: Optional[GenerationConfig] = None,
        history: Optional[List[Tuple[str, str]]] = None,
        return_history: bool = False,
        num_patches_list: Optional[Sequence[int]] = None,
        rope_pos_id_version: Optional[str] = None,
        rope_pos_id_stride: Optional[int] = None,
        verbose: bool = False,
    ):
        import jax.numpy as jnp

        if num_patches_list is None:
            num_patches_list = [pixel_values.shape[0]] \
                if pixel_values is not None else []
        # the '<image>' marker lives in the question so history keeps it
        # across turns (modeling_internvl_chat.py:446-448)
        if history is None and pixel_values is not None \
                and "<image>" not in question:
            question = "<image>\n" + question
        ids, pos, query = self.encode_chat(
            question, num_patches_list, history,
            rope_pos_id_version=rope_pos_id_version,
            rope_pos_id_stride=rope_pos_id_stride)

        gc = generation_config or GenerationConfig()
        stop_ids = tuple(self.conv_template.stop_token_ids) or \
            (self.cfg.llm.eos_token_id,)
        gc = dataclasses.replace(gc, eos_token_ids=stop_ids)

        if pixel_values is None:
            sz = self.cfg.force_image_size or self.cfg.vision.image_size
            pixel_values = np.zeros((1, 3, sz, sz), np.float32)
            flags = np.zeros((1,), np.int32)
        else:
            flags = np.ones((pixel_values.shape[0],), np.int32)

        if gc.num_beams > 1:
            from v2pe_tpu.infer.beam import beam_generate

            if self.cache_mode != "dense" or self.kv_dtype is not None:
                import logging

                logging.getLogger(__name__).warning(
                    "beam search decodes with a dense B*num_beams KV cache;"
                    " cache_mode=%r/kv_dtype=%r are ignored for this call",
                    self.cache_mode, self.kv_dtype)

            tokens, gen_lens = beam_generate(
                self.params, self.cfg, gc,
                jnp.asarray(ids[None], jnp.int32),
                jnp.asarray([len(ids)], jnp.int32),
                jnp.asarray(pos[None].astype(np.float32)),
                jnp.asarray(pixel_values,
                            self.params["llm"]["tok_embeddings"].dtype),
                jnp.asarray(flags),
                self.img_context_token_id,
                attn_impl=self.attn_impl,
            )
        else:
            tokens, _, gen_lens = generate(
                self.params, self.cfg, gc,
                jnp.asarray(ids[None], jnp.int32),
                jnp.asarray([len(ids)], jnp.int32),
                jnp.asarray(pos[None].astype(np.float32)),
                jnp.asarray(pixel_values,
                            self.params["llm"]["tok_embeddings"].dtype),
                jnp.asarray(flags),
                self.img_context_token_id,
                attn_impl=self.attn_impl,
                cache_mode=self.cache_mode,
                page_size=self.page_size,
                kv_dtype=self.kv_dtype,
            )
        response = self._decode(np.asarray(tokens[0]),
                                int(np.asarray(gen_lens)[0]))
        history = list(history or []) + [(question, response)]
        if verbose:
            print(f"{query!r} -> {response!r}")
        if return_history:
            return response, history
        return response

    def batch_chat(self, pixel_values_list, questions,
                   generation_config=None, num_patches_lists=None, **kw):
        """No-history batched chat (modeling_internvl_chat.py:386-432) —
        loops chat() per item (jit caches by shape bucket)."""
        out = []
        for i, q in enumerate(questions):
            pv = pixel_values_list[i] if pixel_values_list else None
            npl = num_patches_lists[i] if num_patches_lists else None
            out.append(self.chat(pv, q, generation_config,
                                 num_patches_list=npl, **kw))
        return out

    def _decode(self, token_ids: np.ndarray, gen_len: int) -> str:
        """Slice by the per-row generated length from generate() (token id 0
        may be a legitimate vocab item, so no sentinel scanning), then drop a
        trailing stop token."""
        stop = set(self.conv_template.stop_token_ids)
        keep = [int(t) for t in token_ids[:gen_len]]
        while keep and keep[-1] in stop:
            keep.pop()
        text = self.tokenizer.decode(keep, skip_special_tokens=True)
        sep = self.conv_template.sep
        return text.split(sep)[0].strip()
