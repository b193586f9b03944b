"""Ulysses sequence parallelism (head-scatter all-to-all).

The reference ships only the contiguous sequence split for this mode
(``extract_local2``, modeling_internvl_chat.py:42-50) — the all-to-all head
exchange is absent in-repo, so its ulysses path is vestigial (SURVEY §2.6).
This is the complete TPU-native version: inside shard_map over the seq axis,
``jax.lax.all_to_all`` trades the sequence shard for a head shard, the
regular flash kernel runs on full-length sequences with H/n heads, and a
second all-to-all restores the layout. Requires Hq and Hkv divisible by the
axis size."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from v2pe_tpu.ops.attention import AttnStatics, _flash


def _all_to_all_seq_to_heads(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, S/n, H, D) per-device -> (B, S, H/n, D) per-device."""
    # all_to_all(split heads, concat seq)
    return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                              tiled=True)


def _all_to_all_heads_to_seq(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """(B, S, H/n, D) per-device -> (B, S/n, H, D) per-device."""
    return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def ulysses_flash_attention(
    axis_name: str,
    statics: AttnStatics,
    q, k, v, seg_q, seg_k, pos_q, pos_k,
):
    """Per-device entry (call inside shard_map over ``axis_name``).

    Inputs are sequence shards (B, S/n, H*, D); seg/pos are the local
    shards and get all-gathered for the full-length attention."""
    n = jax.lax.psum(1, axis_name)
    Hq, Hkv = q.shape[2], k.shape[2]
    assert Hq % n == 0 and Hkv % n == 0, (
        f"ulysses needs heads divisible by axis size ({Hq}/{Hkv} vs {n})")

    qg = _all_to_all_seq_to_heads(q, axis_name)
    kg = _all_to_all_seq_to_heads(k, axis_name)
    vg = _all_to_all_seq_to_heads(v, axis_name)
    # full-length token metadata on every device
    seg_qg = jax.lax.all_gather(seg_q, axis_name, axis=1, tiled=True)
    seg_kg = jax.lax.all_gather(seg_k, axis_name, axis=1, tiled=True)
    pos_qg = jax.lax.all_gather(pos_q, axis_name, axis=1, tiled=True)
    pos_kg = jax.lax.all_gather(pos_k, axis_name, axis=1, tiled=True)

    out = _flash(statics, qg, kg, vg, seg_qg, seg_kg, pos_qg, pos_kg)
    return _all_to_all_heads_to_seq(out, axis_name)


def ulysses_attention(
    q, k, v, *,
    axis_name: str,
    q_segment_ids, kv_segment_ids, q_positions, kv_positions,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = 512,   # tuned on v5e: (512,1024) reaches ~100 TFLOPs at 8k
    block_k: int = 1024,
    impl: str = "auto",
):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    statics = AttnStatics(
        causal=causal, scale=float(scale), block_q=block_q, block_k=block_k,
        impl=impl, ordered=False,
        interpret=impl == "pallas" and jax.default_backend() != "tpu")
    return ulysses_flash_attention(
        axis_name, statics, q, k, v,
        q_segment_ids.astype(jnp.int32), kv_segment_ids.astype(jnp.int32),
        q_positions.astype(jnp.int32), kv_positions.astype(jnp.int32))
