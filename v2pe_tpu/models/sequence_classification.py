"""InternLM2 sequence-classification head (classifier / reward-model API).

TPU-native counterpart of the reference's
``InternLM2ForSequenceClassification``
(/root/reference/internvl/model/internlm2/modeling_internlm2.py:2174-2278):
a bias-free ``score`` projection applied to the hidden state of the LAST
non-pad token of each row, with the three HF problem types (regression
MSE, single-label cross-entropy, multi-label BCE-with-logits). No V2PE
training or eval flow exercises it (SURVEY.md §2.3), but it is part of the
reference's public model surface, so the API is completed here.

Pooling semantics match the reference exactly, including the quirks:

* ``pad_token_id is None`` -> pool position -1 (the final token);
* otherwise the pooled index is ``argmax(ids == pad) - 1`` — the token
  right before the FIRST pad. When a row contains no pad at all (or pads
  from position 0), argmax over the all-equal mask returns 0, so the index
  is -1 and Python negative indexing wraps to the LAST token; we reproduce
  that wrap with a modulo.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import LLMConfig
from v2pe_tpu.models.internlm2 import llm_forward
from v2pe_tpu.models.params import _dense, _np, _stack, init_llm_params


def init_seq_cls_params(key, cfg: LLMConfig, num_labels: int,
                        dtype=jnp.float32) -> dict:
    kb, ks = jax.random.split(key)
    p = init_llm_params(kb, cfg, dtype)
    p.pop("output_kernel", None)  # no LM head; `score` replaces it
    p["score_kernel"] = _dense(ks, (cfg.hidden_size, num_labels), dtype)
    return p


def pool_last_token(x: jnp.ndarray, input_ids: jnp.ndarray,
                    pad_token_id: Optional[int]) -> jnp.ndarray:
    """Select one position per row: the token before the first pad
    (reference :2231-2242), wrapping to the last token when there is no
    pad — torch's negative-index behavior reproduced via modulo."""
    B, S = input_ids.shape
    if pad_token_id is None:
        idx = jnp.full((B,), S - 1, jnp.int32)
    else:
        first_pad = jnp.argmax(
            (input_ids == pad_token_id).astype(jnp.int32), axis=-1)
        idx = jnp.mod(first_pad - 1, S).astype(jnp.int32)
    return jax.vmap(lambda row, i: row[i])(x, idx)


def _bce_with_logits(logits, targets):
    # numerically-stable BCEWithLogitsLoss (mean reduction)
    z = jnp.maximum(logits, 0.0) - logits * targets \
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(z)


def resolve_problem_type(num_labels: int, labels: jnp.ndarray) -> str:
    """HF auto-detection (reference :2250-2257)."""
    if num_labels == 1:
        return "regression"
    if jnp.issubdtype(labels.dtype, jnp.integer):
        return "single_label_classification"
    return "multi_label_classification"


def seq_cls_forward(
    params: dict,
    cfg: LLMConfig,
    *,
    input_ids: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    pad_token_id: Optional[int] = None,
    problem_type: Optional[str] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    rope_pos_ids: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
):
    """Returns ``(pooled_logits (B, num_labels) fp32, loss or None)``."""
    hidden, _ = llm_forward(
        params, cfg, input_ids=input_ids, rope_pos_ids=rope_pos_ids,
        segment_ids=segment_ids, attn_impl=attn_impl, return_hidden=True)
    logits = hidden.astype(jnp.float32) @ \
        params["score_kernel"].astype(jnp.float32)       # (B, S, num_labels)
    pooled = pool_last_token(logits, input_ids, pad_token_id)
    num_labels = int(params["score_kernel"].shape[-1])

    if labels is None:
        return pooled, None
    pt = problem_type or resolve_problem_type(num_labels, labels)
    if pt == "regression":
        pred = pooled.squeeze() if num_labels == 1 else pooled
        tgt = labels.squeeze() if num_labels == 1 else labels
        loss = jnp.mean((pred - tgt.astype(jnp.float32)) ** 2)
    elif pt == "single_label_classification":
        logp = jax.nn.log_softmax(pooled.reshape(-1, num_labels), axis=-1)
        loss = -jnp.mean(
            jnp.take_along_axis(logp, labels.reshape(-1, 1), axis=-1))
    elif pt == "multi_label_classification":
        loss = _bce_with_logits(pooled, labels.astype(jnp.float32))
    else:
        raise ValueError(f"unknown problem_type {pt!r}")
    return pooled, loss


def convert_seq_cls_state_dict(sd: dict, lc: LLMConfig,
                               dtype=jnp.float32) -> dict:
    """Convert an ``InternLM2ForSequenceClassification`` torch state dict
    (keys ``model.layers.{i}...`` + ``score.weight``) into our pytree."""
    import numpy as np

    T = np.transpose
    L = lc.num_hidden_layers
    layers = {
        "attention_norm": _stack(
            sd, "model.layers.{i}.attention_norm.weight", L),
        "ffn_norm": _stack(sd, "model.layers.{i}.ffn_norm.weight", L),
        "wqkv_kernel": _stack(
            sd, "model.layers.{i}.attention.wqkv.weight", L, T),
        "wo_kernel": _stack(sd, "model.layers.{i}.attention.wo.weight", L, T),
        "w1_kernel": _stack(
            sd, "model.layers.{i}.feed_forward.w1.weight", L, T),
        "w3_kernel": _stack(
            sd, "model.layers.{i}.feed_forward.w3.weight", L, T),
        "w2_kernel": _stack(
            sd, "model.layers.{i}.feed_forward.w2.weight", L, T),
    }
    if lc.bias:
        layers["wqkv_bias"] = _stack(
            sd, "model.layers.{i}.attention.wqkv.bias", L)
        layers["wo_bias"] = _stack(sd, "model.layers.{i}.attention.wo.bias", L)
    tree = {
        "tok_embeddings": _np(sd["model.tok_embeddings.weight"]),
        "layers": layers,
        "norm": _np(sd["model.norm.weight"]),
        "score_kernel": _np(sd["score.weight"]).T,
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)
