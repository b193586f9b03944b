"""Rotary position embedding consuming V2PE's per-token float32 position ids.

Unlike standard RoPE (cached integer-position cos/sin table), V2PE computes
``freqs = outer(pos_ids_float32, inv_freq)`` per forward call from an
arbitrary float32 position vector. Reference:
``internvl/model/internlm2/modeling_internlm2.py:269-309`` (class ``V2PE``)
and the rotary application with fp32 upcast at ``:416-441``.

All math here is elementwise — XLA fuses it into the surrounding matmuls, so
no Pallas kernel is needed for the rotary stage itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_inv_freq(head_dim: int, base: float) -> jnp.ndarray:
    """inv_freq = base^(-2i/dim), float32 — modeling_internlm2.py:290-292."""
    i = jnp.arange(0, head_dim, 2, dtype=jnp.float32)
    return 1.0 / (base ** (i / head_dim))


def compute_rope_cos_sin(
    pos_ids: jnp.ndarray, head_dim: int, base: float
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables from a float32 position vector.

    Args:
      pos_ids: (..., S) float32 — fractional for V2PE visual tokens.
    Returns:
      (cos, sin), each (..., S, head_dim) float32 with the
      ``cat(freqs, freqs)`` half-duplicated layout of the reference
      (modeling_internlm2.py:296-300).
    """
    inv_freq = rope_inv_freq(head_dim, base)
    freqs = pos_ids.astype(jnp.float32)[..., None] * inv_freq  # (..., S, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """modeling_internlm2.py:416-421."""
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Apply rotary embedding with fp32 compute, returning the input dtype.

    Args:
      x: (..., S, H, D) or (..., S, D) query/key states.
      cos/sin: (..., S, D) float32; broadcast over the head axis when x has
        one.

    Matches ``apply_rotary_pos_emb`` (modeling_internlm2.py:425-433): q/k are
    upcast to float32, rotated, and downcast.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if x.ndim == cos.ndim + 1:  # (..., S, H, D) with cos (..., S, D)
        cos = cos[..., :, None, :]
        sin = sin[..., :, None, :]
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(orig_dtype)


def apply_rotary_from_pos_ids(
    q: jnp.ndarray,
    k: jnp.ndarray,
    pos_ids: jnp.ndarray,
    base: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper: V2PE rotary for q, k in (B, S, H, D) layout."""
    cos, sin = compute_rope_cos_sin(pos_ids, q.shape[-1], base)
    return apply_rotary(q, cos, sin), apply_rotary(k, cos, sin)


def rope_2d_cos_sin(h: int, w: int, head_dim: int, base: float = 100.0
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2-D image RoPE: interleaved x/y frequencies over an h x w grid.

    Parity with ``InternLM2RotaryEmbedding2D`` (modeling_internlm2.py:
    375-412; defined for image-token rotary ablations, base=100): even
    channels carry x-axis frequencies theta[0::2], odd channels y-axis
    theta[1::2], each duplicated in the cat(freqs,freqs) layout.
    Returns cos/sin of shape (h, w, head_dim) float32.
    """
    theta = rope_inv_freq(head_dim, base)
    x = jnp.arange(h, dtype=jnp.float32)
    y = jnp.arange(w, dtype=jnp.float32)
    freqs_x = x[:, None] * theta[0::2]  # (h, hd/4)
    freqs_y = y[:, None] * theta[1::2]  # (w, hd/4)
    freqs_x = jnp.concatenate([freqs_x, freqs_x], axis=-1)  # (h, hd/2)
    freqs_y = jnp.concatenate([freqs_y, freqs_y], axis=-1)  # (w, hd/2)
    freqs = jnp.zeros((h, w, head_dim), jnp.float32)
    freqs = freqs.at[..., 0::2].set(
        jnp.broadcast_to(freqs_x[:, None, :], (h, w, head_dim // 2)))
    freqs = freqs.at[..., 1::2].set(
        jnp.broadcast_to(freqs_y[None, :, :], (h, w, head_dim // 2)))
    return jnp.cos(freqs), jnp.sin(freqs)


def scale_positions(
    pos_ids: jnp.ndarray,
    head_dim: int,
    base: float,
    *,
    mode: str = "v2pe",
    scaling_factor: float = 1.0,
    max_position_embeddings: int = 32768,
    seq_len: int | None = None,
) -> tuple[jnp.ndarray, float]:
    """RoPE-scaling ablation modes kept for parity with the reference's
    interpolation baselines (swapped into the long eval at
    eval_mm_niah_long.py:144-162):

    * 'v2pe'/'default': positions unchanged;
    * 'linear' (InternLM2LinearScalingRotaryEmbedding, :312-336):
      t / scaling_factor;
    * 'dynamic' NTK (InternLM2DynamicNTKScalingRotaryEmbedding, :340-372):
      base rescaled by ((f*len/max) - (f-1)) ** (dim/(dim-2)) when the
      sequence exceeds max_position_embeddings.

    Returns (scaled positions, effective base).
    """
    if mode in ("v2pe", "default"):
        return pos_ids, base
    if mode == "linear":
        return pos_ids / scaling_factor, base
    if mode == "dynamic":
        # seq_len must be the TOTAL context (cache length + new tokens) so
        # cached decode rescales the base exactly like the reference, which
        # keys off kv_seq_len (modeling_internlm2.py:355-372). Traced-safe:
        # jnp.where instead of python control flow (cache length is traced).
        s = seq_len if seq_len is not None else pos_ids.shape[-1]
        s = jnp.asarray(s, jnp.float32)
        scaled = base * (
            (scaling_factor * s / max_position_embeddings)
            - (scaling_factor - 1)
        ) ** (head_dim / (head_dim - 2))
        base = jnp.where(s > max_position_embeddings, scaled,
                         jnp.asarray(base, jnp.float32))
        return pos_ids, base
    raise NotImplementedError(mode)
