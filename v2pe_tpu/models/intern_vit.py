"""InternViT vision encoder, functional JAX.

Behavior parity with ``internvl/model/internvl_chat/modeling_intern_vit.py``:

* patch embed = Conv2d(k=stride=patch), prepended CLS token, learned absolute
  position embedding bicubic-interpolated to any grid (``:66-107``);
* pre-norm encoder layers (LayerNorm or RMSNorm per ``norm_type``) with
  LayerScale (ls1/ls2) and optional QK-RMSNorm over the *flattened* head dim
  (``:148-170``), DropPath stochastic depth (``:199-228``);
* bidirectional flash attention (reference uses the qkv-packed varlen CUDA
  kernel, ``flash_attention.py:15-76``; we call the segment-aware Pallas
  kernel with causal=False).

TPU-first notes: the patch conv is expressed as an unfold+matmul so it lands
on the MXU; layers are stacked and scanned (single compiled layer body).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import VisionConfig
from v2pe_tpu.ops.attention import flash_attention
from v2pe_tpu.ops.norms import layer_norm, rms_norm


def _norm(cfg: VisionConfig, x, w, b):
    if cfg.norm_type == "rms_norm":
        return rms_norm(x, w, cfg.layer_norm_eps)
    return layer_norm(x, w, b, cfg.layer_norm_eps)


def _cubic_kernel(t: jnp.ndarray, a: float = -0.75) -> jnp.ndarray:
    """Cubic convolution kernel with A=-0.75 (torch's bicubic)."""
    at = jnp.abs(t)
    return jnp.where(
        at <= 1.0,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        jnp.where(at < 2.0, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )


def _bicubic_resize_1d_weights(in_size: int, out_size: int) -> jnp.ndarray:
    """(out_size, in_size) interpolation matrix matching torch
    F.interpolate(mode='bicubic', align_corners=False) with border clamping."""
    scale = in_size / out_size
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    src = (out_idx + 0.5) * scale - 0.5
    src_floor = jnp.floor(src)
    offsets = jnp.arange(-1, 3, dtype=jnp.float32)  # 4 taps
    taps = src_floor[:, None] + offsets[None, :]  # (out, 4)
    weights = _cubic_kernel(src[:, None] - taps)  # (out, 4)
    taps_clamped = jnp.clip(taps, 0, in_size - 1).astype(jnp.int32)
    mat = jnp.zeros((out_size, in_size), jnp.float32)
    for t in range(4):  # static 4-tap scatter
        mat = mat.at[jnp.arange(out_size), taps_clamped[:, t]].add(weights[:, t])
    return mat


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, src: int, dst_h: int, dst_w: int
) -> jnp.ndarray:
    """Bicubic-resize a (1, src*src, D) grid pos-embed to (1, dst_h*dst_w, D).

    Parity: ``_get_pos_embed`` (modeling_intern_vit.py:87-93) and
    ``resize_pos_embeddings`` (:309-319); fp32 compute.
    """
    D = pos_embed.shape[-1]
    grid = pos_embed.astype(jnp.float32).reshape(src, src, D)
    wh = _bicubic_resize_1d_weights(src, dst_h)
    ww = _bicubic_resize_1d_weights(src, dst_w)
    out = jnp.einsum("hs,swd->hwd", wh, grid)
    out = jnp.einsum("wt,htd->hwd", ww, out)
    return out.reshape(1, dst_h * dst_w, D)


def embeddings_forward(params: dict, cfg: VisionConfig, pixel_values):
    """pixel_values (B, 3, H, W) -> (B, 1+N, D). Parity: :95-107."""
    B, C, H, W = pixel_values.shape
    P = cfg.patch_size
    h, w = H // P, W // P
    dtype = params["patch_kernel"].dtype

    # unfold to (B, h*w, C*P*P) with (c, kh, kw) flatten order, then matmul
    x = pixel_values.astype(dtype).reshape(B, C, h, P, w, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, h * w, C * P * P)
    patch = jnp.dot(x, params["patch_kernel"],
                    preferred_element_type=jnp.float32).astype(dtype)
    patch = patch + params["patch_bias"]

    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype),
                           (B, 1, cfg.hidden_size))
    emb = jnp.concatenate([cls, patch], axis=1)

    pos = params["position_embedding"]  # (1, 1+src*src, D)
    src = int(round((pos.shape[1] - 1) ** 0.5))
    if (h, w) == (src, src):
        pos_grid = pos[:, 1:]
    else:
        pos_grid = interpolate_pos_embed(pos[:, 1:], src, h, w)
    pos_full = jnp.concatenate([pos[:, :1].astype(jnp.float32),
                                pos_grid.astype(jnp.float32)], axis=1)
    return emb + pos_full.astype(dtype)


def _attention(p: dict, cfg: VisionConfig, x, attn_impl: str):
    """Fused-qkv bidirectional attention with optional QK-RMSNorm
    (modeling_intern_vit.py:110-181)."""
    B, N, D = x.shape
    H = cfg.num_attention_heads
    hd = cfg.head_dim
    qkv = jnp.dot(x, p["qkv_kernel"], preferred_element_type=jnp.float32
                  ).astype(x.dtype)
    if cfg.qkv_bias:
        qkv = qkv + p["qkv_bias"]
    qkv = qkv.reshape(B, N, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

    if cfg.qk_normalization:
        # RMSNorm over the flattened (H*hd) dim, NOT per-head (:166-170)
        q = rms_norm(q.reshape(B, N, D), p["q_norm"], cfg.layer_norm_eps
                     ).reshape(B, N, H, hd)
        k = rms_norm(k.reshape(B, N, D), p["k_norm"], cfg.layer_norm_eps
                     ).reshape(B, N, H, hd)

    # single-block attention for tile-sized sequences: the 1025-token tile
    # in (bq=384, bk=576)-style blocks costs ~3x more than one (1152, 1152)
    # block — the grid collapses from 9 to 1 step per (tile, head), and at
    # hd=64 the per-step overhead dominates (measured 2.12 -> 0.74 ms per
    # call for 8 tiles on v5e)
    if N <= 2048:
        blk = -(-N // 128) * 128
        out = flash_attention(q, k, v, causal=False, impl=attn_impl,
                              block_q=blk, block_k=blk)
    else:
        out = flash_attention(q, k, v, causal=False, impl=attn_impl)
    out = out.reshape(B, N, D)
    out = jnp.dot(out, p["proj_kernel"], preferred_element_type=jnp.float32
                  ).astype(x.dtype) + p["proj_bias"]
    return out


def _mlp(p: dict, cfg: VisionConfig, x):
    h = jnp.dot(x, p["fc1_kernel"], preferred_element_type=jnp.float32
                ).astype(x.dtype) + p["fc1_bias"]
    h = jax.nn.gelu(h, approximate=False)
    return jnp.dot(h, p["fc2_kernel"], preferred_element_type=jnp.float32
                   ).astype(x.dtype) + p["fc2_bias"]


def drop_path(x: jnp.ndarray, rate, rng) -> jnp.ndarray:
    """Stochastic depth on a residual branch: per-SAMPLE Bernoulli keep mask
    scaled by 1/keep_prob (timm DropPath semantics, the dependency the
    reference wraps at modeling_intern_vit.py:213-214). `rate` may be a
    traced scalar (per-layer schedule rides the layer scan)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x.astype(jnp.float32) / keep, 0.0).astype(x.dtype)


def layer_forward(p: dict, cfg: VisionConfig, x, attn_impl: str,
                  dp_rate=None, dp_rngs=None):
    """Pre-norm + LayerScale residual block (modeling_intern_vit.py:219-228).
    With dp_rate + dp_rngs (2 keys), each residual branch goes through
    DropPath — training-time stochastic depth (:224-226); the published
    V2PE recipes train with --drop_path_rate 0.1
    (shell/internlm2_2b/*_v2pe_32k.sh)."""
    h = _norm(cfg, x, p["norm1"], p.get("norm1_bias"))
    branch = _attention(p, cfg, h, attn_impl) * p["ls1"]
    if dp_rate is not None:
        branch = drop_path(branch, dp_rate, dp_rngs[0])
    x = x + branch
    h = _norm(cfg, x, p["norm2"], p.get("norm2_bias"))
    branch = _mlp(p, cfg, h) * p["ls2"]
    if dp_rate is not None:
        branch = drop_path(branch, dp_rate, dp_rngs[1])
    x = x + branch
    return x


def vision_forward(
    params: dict,
    cfg: VisionConfig,
    pixel_values: jnp.ndarray,
    *,
    select_layer: int = -1,
    attn_impl: str = "auto",
    remat: bool = False,
    drop_path_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Full encoder. Returns (B, 1+N, D) hidden states of the selected layer
    (select_layer=-1 -> last; -4 -> 3 layers early, like config.select_layer).

    drop_path_rng: pass a PRNG key during TRAINING to enable stochastic
    depth with the linear per-layer rate schedule linspace(0,
    cfg.drop_path_rate, L) (modeling_intern_vit.py:245); None (inference)
    keeps layers deterministic.
    """
    x = embeddings_forward(params["embeddings"], cfg, pixel_values)

    num_layers = cfg.num_hidden_layers
    if select_layer != -1:
        num_layers = num_layers + 1 + select_layer
        assert 0 < num_layers <= cfg.num_hidden_layers

    use_dp = drop_path_rng is not None and cfg.drop_path_rate > 0.0

    body = layer_forward
    if remat:
        body = jax.checkpoint(body, static_argnums=(1, 3))

    layers = jax.tree.map(lambda a: a[:num_layers], params["layers"])
    if use_dp:
        dpr = jnp.linspace(0.0, cfg.drop_path_rate, cfg.num_hidden_layers
                           )[:num_layers]
        keys = jax.random.split(drop_path_rng, num_layers * 2
                                ).reshape(num_layers, 2, -1)

        def scan_body(x, inp):
            layer_params, rate, ks = inp
            return body(layer_params, cfg, x, attn_impl, rate,
                        (ks[0], ks[1])), None

        x, _ = jax.lax.scan(scan_body, x, (layers, dpr, keys))
    else:
        def scan_body(x, layer_params):
            return body(layer_params, cfg, x, attn_impl), None

        x, _ = jax.lax.scan(scan_body, x, layers)
    return x
