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
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Boolean (B, Sq, Sk) mask: True = attend.

    Packing semantics (replaces cu_seqlens varlen flash attention,
    patch/internlm2_packed_training_patch.py:19-75): tokens attend only
    within their own segment; segment id 0 is padding and attends nowhere.
    Causality compares global token indices (offsets support ring shards;
    explicit (B, S) position arrays override the arange+offset default).
    """
    seg_q = q_segment_ids[:, :, None]
    seg_k = kv_segment_ids[:, None, :]
    mask = (seg_q == seg_k) & (seg_q != 0)
    if causal:
        if q_positions is not None:
            q_idx = q_positions[:, :, None]
        else:
            q_idx = (jnp.arange(q_segment_ids.shape[-1])[None, :, None]
                     + q_offset)
        if kv_positions is not None:
            k_idx = kv_positions[:, None, :]
        else:
            k_idx = (jnp.arange(kv_segment_ids.shape[-1])[None, None, :]
                     + kv_offset)
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
    q_positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full-materialization attention. q (B,Sq,Hq,D); k/v (B,Sk,Hkv,D)."""
    B, Sq, Hq, D = q.shape
    _, Sk, Hkv, _ = k.shape
    assert Hq % Hkv == 0
    groups = Hq // Hkv
    if scale is None:
        scale = D ** -0.5

    # GQA via a grouped einsum — never materializes repeated K/V (the
    # reference's repeat_kv doubles KV bandwidth; on TPU decode that is the
    # bottleneck). q head h*G+g belongs to kv head h (wqkv layout). K/V stay
    # in their storage dtype (an .astype(f32) here would write a 2x-sized
    # copy of the whole cache per layer); fp32 happens in the MXU accumulator
    # via preferred_element_type.
    qf = (q.astype(jnp.float32) * scale).reshape(B, Sq, Hkv, groups, D)
    qf = qf.astype(k.dtype) if k.dtype == jnp.bfloat16 else qf
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qf, k,
                        preferred_element_type=jnp.float32)
    scores = scores.reshape(B, Hq, Sq, Sk)

    if q_segment_ids is not None:
        mask = make_attention_mask(
            q_segment_ids, kv_segment_ids,
            causal=causal, q_offset=q_offset, kv_offset=kv_offset,
            q_positions=q_positions, kv_positions=kv_positions,
        )
        scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)
    elif causal:
        if q_positions is not None:
            q_idx = q_positions[0][:, None]
        else:
            q_idx = jnp.arange(Sq)[:, None] + q_offset
        if kv_positions is not None:
            k_idx = kv_positions[0][None, :]
        else:
            k_idx = jnp.arange(Sk)[None, :] + kv_offset
        scores = jnp.where(q_idx >= k_idx, scores, NEG_INF)

    weights = jax.nn.softmax(scores, axis=-1)
    weights = weights.reshape(B, Hkv, groups, Sq, Sk)
    out = jnp.einsum("bhgqk,bkhd->bqhgd",
                     weights.astype(v.dtype) if v.dtype == jnp.bfloat16
                     else weights,
                     v, preferred_element_type=jnp.float32)
    out = out.reshape(B, Sq, Hq, D)
    return out.astype(q.dtype)
