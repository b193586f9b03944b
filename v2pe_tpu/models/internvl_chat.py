"""InternVLChat composite VLM, functional JAX.

Behavior parity with
``internvl/model/internvl_chat/modeling_internvl_chat.py``:

* ``extract_feature`` (``:359-384``): ViT forward (optional intermediate
  layer via select_layer), drop CLS, reshape to h x w grid, pixel_shuffle,
  mlp1 projector;
* ``pixel_shuffle`` v2 (``:343-357``): space-to-depth by 0.5 — 1024 ViT patch
  tokens become 256 tokens with 4x channels;
* ``mlp1``: LayerNorm -> Linear -> GELU -> Linear (``:122-127``);
* forward (``:165-341``): scatter ViT embeds into ``<IMG_CONTEXT>`` slots and
  run the LLM; weighted shifted-CE loss with optional global weight-sum
  reduction (``:290-316``).

TPU-first: the scatter is a static-shape masked gather (cumsum indexing into
flag-sorted tile rows) instead of the reference's boolean fancy-indexing;
padded tiles (image_flags==0) are encoded anyway (one blank tile per
text-only sample) and sorted to the end, so shapes never depend on data.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from v2pe_tpu.core.config import VLMConfig
from v2pe_tpu.models import intern_vit, internlm2
from v2pe_tpu.ops.norms import layer_norm


def pixel_shuffle(x: jnp.ndarray, scale_factor: float, ps_version: str = "v2"):
    """(N, W, H, C) -> (N, W*s, H*s, C/s^2). Parity with :343-357 including
    the v1 (transposed) variant."""
    n, w, h, c = x.shape
    x = x.reshape(n, w, int(h * scale_factor), int(c / scale_factor))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, int(h * scale_factor), int(w * scale_factor),
                  int(c / (scale_factor * scale_factor)))
    if ps_version == "v2":
        x = x.transpose(0, 2, 1, 3)
    return x


def extract_feature(params: dict, cfg: VLMConfig, pixel_values: jnp.ndarray,
                    *, attn_impl: str = "auto", remat: bool = False,
                    drop_path_rng=None):
    """(N_tiles, 3, S, S) -> (N_tiles, num_image_token, llm_hidden)."""
    vit_out = intern_vit.vision_forward(
        params["vision"], cfg.vision, pixel_values,
        select_layer=cfg.select_layer, attn_impl=attn_impl, remat=remat,
        drop_path_rng=drop_path_rng)
    vit_embeds = vit_out[:, 1:, :]  # drop CLS
    n, num_patches, c = vit_embeds.shape
    hw = int(round(num_patches ** 0.5))
    vit_embeds = vit_embeds.reshape(n, hw, hw, c)
    vit_embeds = pixel_shuffle(vit_embeds, cfg.downsample_ratio,
                               cfg.ps_version)
    vit_embeds = vit_embeds.reshape(n, -1, vit_embeds.shape[-1])

    p = params["mlp1"]
    h = layer_norm(vit_embeds, p["ln_weight"], p["ln_bias"], 1e-5)
    h = jnp.dot(h, p["fc1_kernel"], preferred_element_type=jnp.float32
                ).astype(vit_embeds.dtype) + p["fc1_bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.dot(h, p["fc2_kernel"], preferred_element_type=jnp.float32
                ).astype(vit_embeds.dtype) + p["fc2_bias"]

    if cfg.img_emb_down_sample_ratio is not None:
        # adaptive 1D avg-pool along tokens (F.adaptive_avg_pool1d, :379-383)
        tgt = cfg.num_image_token
        n_tok = h.shape[1]
        # torch adaptive pooling bucket boundaries: [floor(i*N/t), ceil((i+1)*N/t))
        starts = (jnp.arange(tgt) * n_tok) // tgt
        ends = -(-(jnp.arange(1, tgt + 1) * n_tok) // tgt)
        idx = jnp.arange(n_tok)
        win = (idx[None, :] >= starts[:, None]) & (idx[None, :] < ends[:, None])
        win = win.astype(jnp.float32)
        win = win / win.sum(axis=1, keepdims=True)
        h = jnp.einsum("tn,bnc->btc", win, h.astype(jnp.float32)
                       ).astype(h.dtype)
    return h


def scatter_image_embeds_by_index(
    input_embeds: jnp.ndarray,   # (B, S, C)
    vit_embeds: jnp.ndarray,     # (N_tiles, tokens_per_tile, C)
    vit_gather_idx: jnp.ndarray,  # (B, S) int32; -1 = text token, else row
):
    """Shard-layout-independent scatter: the host precomputes, for every
    <IMG_CONTEXT> slot, which flat ViT row feeds it (global order), so the
    device side is a pure gather + select — correct under any sequence
    sharding (zigzag ring shards included)."""
    C = input_embeds.shape[-1]
    flat = vit_embeds.reshape(-1, C)
    idx = jnp.clip(vit_gather_idx, 0, flat.shape[0] - 1)
    gathered = flat[idx]
    return jnp.where((vit_gather_idx >= 0)[..., None], gathered, input_embeds)


def scatter_image_embeds(
    input_embeds: jnp.ndarray,   # (B, S, C)
    input_ids: jnp.ndarray,      # (B, S)
    vit_embeds: jnp.ndarray,     # (N_tiles, tokens_per_tile, C)
    image_flags: jnp.ndarray,    # (N_tiles,) 1 = real tile
    img_context_token_id: int,
):
    """Replace <IMG_CONTEXT> slots with flag-filtered ViT rows, statically.

    Equivalent of ``input_embeds[selected] = vit_embeds[image_flags==1]``
    (:241-254) without dynamic shapes: real tiles are stable-sorted to the
    front, and the j-th IMG_CONTEXT token (in flat batchxseq order) reads row
    j of the sorted tile-token matrix.
    """
    B, S, C = input_embeds.shape
    flat = vit_embeds.reshape(-1, C)
    tokens_per_tile = vit_embeds.shape[1]
    flag_rows = jnp.repeat(image_flags.astype(jnp.int32), tokens_per_tile)
    order = jnp.argsort(1 - flag_rows, stable=True)
    flat_sorted = flat[order]

    selected = (input_ids == img_context_token_id).reshape(-1)
    idx = jnp.cumsum(selected) - 1
    idx = jnp.clip(idx, 0, flat_sorted.shape[0] - 1)
    gathered = flat_sorted[idx].reshape(B, S, C)
    return jnp.where(selected.reshape(B, S)[..., None], gathered,
                     input_embeds)


class VLMOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    logits: jnp.ndarray


def forward(
    params: dict,
    cfg: VLMConfig,
    *,
    input_ids: jnp.ndarray,            # (B, S)
    pixel_values: jnp.ndarray,         # (N_tiles, 3, sz, sz)
    image_flags: jnp.ndarray,          # (N_tiles,)
    rope_pos_ids: jnp.ndarray,         # (B, S) float32 V2PE ids
    img_context_token_id: int,
    segment_ids: Optional[jnp.ndarray] = None,
    token_positions: Optional[jnp.ndarray] = None,  # (B,S) global indices
    vit_gather_idx: Optional[jnp.ndarray] = None,   # (B,S), -1 = text
    labels: Optional[jnp.ndarray] = None,      # (B, S), -100 = ignore
    targets: Optional[jnp.ndarray] = None,     # (B, S) PRE-shifted labels
    loss_weight: Optional[jnp.ndarray] = None,  # (B, S) float32
    loss_weight_sum: Optional[jnp.ndarray] = None,  # global pmean'd sum
    attn_impl: str = "auto",
    remat: bool = False,
    drop_path_rng=None,
) -> VLMOutput:
    llm = params["llm"]
    input_embeds = internlm2.embed_tokens(llm["tok_embeddings"], input_ids)

    vit_embeds = extract_feature(params, cfg, pixel_values,
                                 attn_impl=attn_impl, remat=remat,
                                 drop_path_rng=drop_path_rng)
    if vit_gather_idx is not None:
        input_embeds = scatter_image_embeds_by_index(
            input_embeds, vit_embeds, vit_gather_idx)
    else:
        input_embeds = scatter_image_embeds(
            input_embeds, input_ids, vit_embeds, image_flags,
            img_context_token_id)

    if targets is not None:
        # training path: never materialize (S, V) fp32 logits — at 32k x
        # 92553 that is ~12 GB; compute the CE from hidden states in
        # sequence chunks with rematerialized per-chunk projections
        if cfg.compress_seq and "compress" in params:
            # compress-seq trainer mode: hierarchical chunked forward;
            # batch packing segment_ids combine with the chunk segmentation
            # inside (the reference's chunkTrainer keeps cu_seqlens varlen
            # attention within chunks, compress_seq_trainer.py:228-775)
            from v2pe_tpu.models.compress_seq import compress_llm_forward

            hidden = compress_llm_forward(
                params["llm"], params["compress"], cfg.llm,
                input_embeds, rope_pos_ids, cfg.chunk_num,
                segment_ids=segment_ids,
                attn_impl=attn_impl, fuse_method=cfg.fuse_method,
                return_hidden=True)
        else:
            hidden, _ = internlm2.llm_forward(
                params["llm"], cfg.llm,
                inputs_embeds=input_embeds,
                rope_pos_ids=rope_pos_ids,
                segment_ids=segment_ids,
                positions=token_positions,
                attn_impl=attn_impl,
                remat=remat,
                return_hidden=True,
            )
        loss = chunked_cross_entropy(
            hidden, params["llm"]["output_kernel"], targets, loss_weight,
            loss_weight_sum)
        return VLMOutput(loss=loss, logits=None)

    logits, _ = internlm2.llm_forward(
        params["llm"], cfg.llm,
        inputs_embeds=input_embeds,
        rope_pos_ids=rope_pos_ids,
        segment_ids=segment_ids,
        positions=token_positions,
        attn_impl=attn_impl,
        remat=remat,
    )

    loss = None
    if labels is not None:
        loss = cross_entropy_loss(logits, labels, loss_weight,
                                  loss_weight_sum, cfg.llm.vocab_size)
    return VLMOutput(loss=loss, logits=logits)


def _ce_block(h, output_kernel, t, w):
    """(sum weighted token loss, sum weights) for one block."""
    logits = jnp.dot(h, output_kernel, preferred_element_type=jnp.float32)
    valid = t != -100
    safe = jnp.where(valid, t, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tl = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    tl = jnp.where(valid, tl, 0.0)
    wv = w.astype(jnp.float32) * valid
    return jnp.sum(tl * wv), jnp.sum(wv)


def chunked_cross_entropy(hidden, output_kernel, targets, loss_weight=None,
                          loss_weight_sum=None, chunk: int = 2048):
    """Weighted pre-shifted CE computed per sequence chunk so the fp32
    logits buffer is bounded at (chunk, V); the backward recomputes each
    chunk's projection (jax.checkpoint)."""
    B, S, D = hidden.shape
    c = min(chunk, S)
    while S % c != 0:  # static; S is a padded power-of-two-ish length
        c //= 2
    n = S // c

    from v2pe_tpu.parallel import context as pctx

    ctx = pctx.current()
    seq_sharded = ctx is not None and ctx.seq_shards > 1
    if n == 1 or seq_sharded:
        # single chunk, or the sequence axis itself is sharded: reshaping a
        # seq-sharded dim for the scan trips an XLA-CPU CHECK, and with seq
        # shards the per-device logits are already bounded at (S/shards, V).
        # On a data/fsdp-only mesh we DO chunk — each device would otherwise
        # materialize its rows' full (S, V) fp32 logits (~12 GB at 32k).
        w = loss_weight if loss_weight is not None \
            else jnp.ones((B, S), jnp.float32)
        num, den = _ce_block(hidden, output_kernel, targets, w)
        wsum = loss_weight_sum if loss_weight_sum is not None else den
        return num / jnp.maximum(wsum, 1e-8)
    h = hidden.reshape(B, n, c, D)
    t = targets.reshape(B, n, c)
    w = (loss_weight if loss_weight is not None
         else jnp.ones((B, S), jnp.float32)).reshape(B, n, c)

    chunk_loss = jax.checkpoint(
        lambda h_c, t_c, w_c: _ce_block(h_c, output_kernel, t_c, w_c))

    def body(carry, inp):
        num, den = carry
        l, wsum = chunk_loss(*inp)
        return (num + l, den + wsum), None

    (num, den), _ = jax.lax.scan(
        body, (jnp.float32(0), jnp.float32(0)),
        (jnp.swapaxes(h, 0, 1), jnp.swapaxes(t, 0, 1),
         jnp.swapaxes(w, 0, 1)))
    wsum = loss_weight_sum if loss_weight_sum is not None else den
    return num / jnp.maximum(wsum, 1e-8)


def cross_entropy_loss_preshifted(logits, targets, loss_weight=None,
                                  loss_weight_sum=None):
    """Elementwise CE against host-pre-shifted targets (targets[t] is the
    label for position t, i.e. original labels[t+1]) — required under
    sequence sharding where logits[:, :-1] would cross shard boundaries and
    zigzag layouts where memory order != global order."""
    valid = targets != -100
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    token_loss = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, token_loss, 0.0)
    if loss_weight is not None:
        w = loss_weight.astype(jnp.float32) * valid
        wsum = loss_weight_sum if loss_weight_sum is not None else jnp.sum(w)
        return jnp.sum(token_loss * w) / jnp.maximum(wsum, 1e-8)
    return jnp.sum(token_loss) / jnp.maximum(jnp.sum(valid), 1)


def cross_entropy_loss(logits, labels, loss_weight=None, loss_weight_sum=None,
                       vocab_size: Optional[int] = None):
    """Shifted CE with optional per-token weights (:290-316).

    loss_weight_sum: pass the (optionally all-reduce-averaged) global weight
    sum for ``loss_reduction_all_gather`` parity; defaults to the local sum.
    """
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    token_loss = -jnp.take_along_axis(logp, safe_labels[..., None],
                                      axis=-1)[..., 0]
    token_loss = jnp.where(valid, token_loss, 0.0)

    if loss_weight is not None:
        w = loss_weight[:, 1:].astype(jnp.float32) * valid
        wsum = loss_weight_sum if loss_weight_sum is not None else jnp.sum(w)
        return jnp.sum(token_loss * w) / jnp.maximum(wsum, 1e-8)
    return jnp.sum(token_loss) / jnp.maximum(jnp.sum(valid), 1)
