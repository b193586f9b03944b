"""Reference (O(S^2) memory) attention in pure jnp — ground truth for kernel
tests and the small-shape fallback. Semantics follow the reference eager path
(``InternLM2Attention.forward``, modeling_internlm2.py:475-642): fp32 softmax,
GQA via kv-head repetition, additive masking.

Layout convention across the framework: q (B, Sq, Hq, D), k/v (B, Sk, Hkv, D)
("BSHD"); segment ids (B, S) int32 with 0 = padding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def make_attention_mask(
    q_segment_ids: jnp.ndarray,
    kv_segment_ids: jnp.ndarray,
    *,
    causal: bool,
    q_offset: int | jnp.ndarray = 0,
    kv_offset: int | jnp.ndarray = 0,
) -> jnp.ndarray:
    """Boolean (B, Sq, Sk) mask: True = attend.

    Packing semantics (replaces cu_seqlens varlen flash attention,
    patch/internlm2_packed_training_patch.py:19-75): tokens attend only
    within their own segment; segment id 0 is padding and attends nowhere.
    Causality compares global token indices (offsets support ring shards).
    """
    seg_q = q_segment_ids[:, :, None]
    seg_k = kv_segment_ids[:, None, :]
    mask = (seg_q == seg_k) & (seg_q != 0)
    if causal:
        q_idx = jnp.arange(q_segment_ids.shape[-1])[:, None] + q_offset
        k_idx = jnp.arange(kv_segment_ids.shape[-1])[None, :] + kv_offset
        mask = mask & (q_idx >= k_idx)
    return mask


def attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    q_offset: int | jnp.ndarray = 0,
    kv_offset: int | jnp.ndarray = 0,
) -> jnp.ndarray:
    """Full-materialization attention. q (B,Sq,Hq,D); k/v (B,Sk,Hkv,D)."""
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    assert Hq % Hkv == 0
    groups = Hq // Hkv
    if scale is None:
        scale = D ** -0.5

    if groups > 1:  # repeat_kv (modeling_internlm2.py:462-471)
        k = jnp.repeat(k, groups, axis=2)
        v = jnp.repeat(v, groups, axis=2)

    qf = q.astype(jnp.float32) * scale
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32))

    if q_segment_ids is not None:
        mask = make_attention_mask(
            q_segment_ids, kv_segment_ids,
            causal=causal, q_offset=q_offset, kv_offset=kv_offset,
        )
        scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    elif causal:
        q_idx = jnp.arange(Sq)[:, None] + q_offset
        k_idx = jnp.arange(Sk)[None, :] + kv_offset
        scores = jnp.where(q_idx >= k_idx, scores, NEG_INF)

    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v.astype(jnp.float32))
    return out.astype(q.dtype)
