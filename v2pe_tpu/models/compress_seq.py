"""Compress-seq: hierarchical sequence-compression forward (experimental
long-context trainer of the reference, off by default).

Behavior parity with the reference's per-layer machinery
(modeling_internlm2.py): each sequence chunk is avg-pooled to
FINAL_SIZE=100 summary tokens (``compress``, :1305-1325), summaries from all
chunks are gathered and run through an ``interaction`` self-attention whose
weights are initialized as a copy of the layer's attention (:1269-1271),
and each chunk fuses the summed summaries of *earlier* chunks through a
LayerScale gate initialized at 1e-3 (``fuse`` 'add', :1274-1277) before its
own within-chunk attention. The chunkTrainer loop
(compress_seq_trainer.py:228-775) distributed chunks over ranks; here the
chunk axis is just an array dimension — pjit shards it over 'seq'.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import LLMConfig
from v2pe_tpu.models.internlm2 import attention_forward, mlp_forward
from v2pe_tpu.ops.norms import rms_norm
from v2pe_tpu.ops.rope import compute_rope_cos_sin

FINAL_SIZE = 100


def init_compress_params(llm_params: dict, init_value: float = 1e-3) -> dict:
    """Per-layer LayerScale gammas + interaction attention weights (copies
    of the layer attention, like init_interactions :1269-1271)."""
    layers = llm_params["layers"]
    L, D = layers["attention_norm"].shape
    inter = {k: layers[k] for k in layers
             if k.startswith("wqkv") or k.startswith("wo")}
    return {
        "layer_scale": jnp.full((L, D), init_value,
                                layers["attention_norm"].dtype),
        "interaction": jax.tree.map(jnp.array, inter),
    }


def compress_avg(h: jnp.ndarray, final_size: int = FINAL_SIZE) -> jnp.ndarray:
    """(B, N, C) -> (B, final_size, C): mean over N//final_size buckets
    (compress 'avg', :1305-1325)."""
    B, N, C = h.shape
    step = N // final_size
    used = step * final_size
    return h[:, :used].reshape(B, final_size, step, C).mean(axis=2)


def attention_pooling(h: jnp.ndarray, query_kernel: jnp.ndarray,
                      query_bias: jnp.ndarray) -> jnp.ndarray:
    """Learned pooling: softmax(x W) over the sequence selects n' weighted
    mixtures (AttentionPooling, modeling_internlm2.py:64-78).
    query_kernel: (C, final_size)."""
    scores = h.astype(jnp.float32) @ query_kernel + query_bias  # (B,N,n')
    weights = jax.nn.softmax(scores, axis=1)
    return jnp.einsum("bni,bnd->bid", weights,
                      h.astype(jnp.float32)).astype(h.dtype)


def topk_pooling(h: jnp.ndarray, query_kernel: jnp.ndarray,
                 query_bias: jnp.ndarray, final_size: int) -> jnp.ndarray:
    """Score tokens with a scalar head, keep the top n' weighted by their
    softmaxed scores (TopKPooling, modeling_internlm2.py:79-98).
    query_kernel: (C, 1)."""
    scores = (h.astype(jnp.float32) @ query_kernel + query_bias)[..., 0]
    topk_scores, topk_idx = jax.lax.top_k(scores, final_size)  # (B, n')
    selected = jnp.take_along_axis(h, topk_idx[..., None], axis=1)
    weights = jax.nn.softmax(topk_scores, axis=1)[..., None]
    return (selected.astype(jnp.float32) * weights).astype(h.dtype)


def sigmoid_gate(x1: jnp.ndarray, x2: jnp.ndarray,
                 gate: jnp.ndarray) -> jnp.ndarray:
    """x1*sigmoid(g) + x2*(1-sigmoid(g)) (Sigmoid module, :112-123)."""
    g = jax.nn.sigmoid(gate)
    return x1 * g + x2 * (1 - g)


def compress_llm_forward(
    llm_params: dict,
    compress_params: dict,
    cfg: LLMConfig,
    inputs_embeds: jnp.ndarray,   # (B, S, D)
    rope_pos_ids: jnp.ndarray,    # (B, S) float32
    n_chunks: int,
    *,
    final_size: int = FINAL_SIZE,
    attn_impl: str = "auto",
):
    """Hierarchical forward: within-chunk attention + earlier-chunk summary
    fusion per layer. Returns fp32 logits (B, S, V)."""
    B, S, D = inputs_embeds.shape
    assert S % n_chunks == 0
    c = S // n_chunks
    x = inputs_embeds
    cos, sin = compute_rope_cos_sin(rope_pos_ids.astype(jnp.float32),
                                    cfg.head_dim, cfg.rope_theta)
    # within-chunk attention = segment ids by chunk
    seg = jnp.broadcast_to(
        (jnp.arange(S) // c + 1).astype(jnp.int32)[None], (B, S))
    sum_pos = jnp.broadcast_to(
        jnp.arange(n_chunks * final_size, dtype=jnp.float32)[None],
        (B, n_chunks * final_size))
    cos_i, sin_i = compute_rope_cos_sin(sum_pos, cfg.head_dim, cfg.rope_theta)

    layers = llm_params["layers"]
    L = layers["attention_norm"].shape[0]
    for li in range(L):
        p = jax.tree.map(lambda a: a[li], layers)
        pi = jax.tree.map(lambda a: a[li], compress_params["interaction"])
        gamma = compress_params["layer_scale"][li]

        h = rms_norm(x, p["attention_norm"], cfg.rms_norm_eps)

        # 1. per-chunk summaries of the normed hidden states
        hc = h.reshape(B * n_chunks, c, D)
        summaries = compress_avg(hc, final_size)        # (B*n, 100, D)
        summaries = summaries.reshape(B, n_chunks * final_size, D)

        # 2. interaction self-attention over the gathered summaries
        pi_full = dict(p)
        pi_full.update(pi)
        summaries, _ = attention_forward(
            pi_full, cfg, summaries, cos_i, sin_i,
            segment_ids=jnp.ones((B, n_chunks * final_size), jnp.int32),
            positions=None, attn_impl=attn_impl)

        # 3. fuse 'add': chunk i receives LayerScale(sum of summaries of
        #    chunks j < i) (:1274-1277)
        sums = summaries.reshape(B, n_chunks, final_size, D).sum(axis=2)
        prev = jnp.cumsum(sums, axis=1) - sums          # exclusive prefix
        h = h + (gamma * prev)[:, :, None, :].reshape(
            B, n_chunks, 1, D).repeat(c, axis=2).reshape(B, S, D)

        # 4. standard within-chunk attention + SwiGLU
        attn_out, _ = attention_forward(
            p, cfg, h, cos, sin, segment_ids=seg, positions=None,
            attn_impl=attn_impl)
        x = x + attn_out
        h = rms_norm(x, p["ffn_norm"], cfg.rms_norm_eps)
        x = x + mlp_forward(p, h)

    x = rms_norm(x, llm_params["norm"], cfg.rms_norm_eps)
    return jnp.dot(x, llm_params["output_kernel"],
                   preferred_element_type=jnp.float32)
