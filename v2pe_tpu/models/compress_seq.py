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


def split_wqkv_for_cross(wqkv_kernel: jnp.ndarray, cfg: LLMConfig):
    """(D, Hkv*(G+2)*hd) fused interleaved kernel -> separate
    wq (D, Hq*hd) and wkv (D, 2*Hkv*hd).

    Bit-parity with ``reuse_self_attention_params``
    (modeling_internlm2.py:852-878): torch chunks the OUT rows per kv group
    and takes the first G*hd as q, last 2*hd as kv — identical to the
    interleaved (h, gs, d) reshape used by split_wqkv."""
    D = wqkv_kernel.shape[0]
    G = cfg.num_key_value_groups
    w = wqkv_kernel.reshape(D, cfg.num_key_value_heads, G + 2, cfg.head_dim)
    wq = w[:, :, :G].reshape(D, cfg.num_attention_heads * cfg.head_dim)
    wkv = w[:, :, G:].reshape(
        D, cfg.num_key_value_heads * 2 * cfg.head_dim)
    return wq, wkv


def init_compress_params(llm_params: dict, init_value: float = 1e-3,
                         cfg: Optional[LLMConfig] = None,
                         fuse_method: str = "add") -> dict:
    """Per-layer LayerScale gammas + interaction attention weights (copies
    of the layer attention, like init_interactions :1269-1271). With
    ``fuse_method='cross-attn'`` also clones per-layer cross-attention fuse
    weights (wq/wkv split from the fused wqkv, wo copied — :1249-1254)."""
    layers = llm_params["layers"]
    L, D = layers["attention_norm"].shape
    inter = {k: layers[k] for k in layers
             if k.startswith("wqkv") or k.startswith("wo")}
    out = {
        "layer_scale": jnp.full((L, D), init_value,
                                layers["attention_norm"].dtype),
        "interaction": jax.tree.map(jnp.array, inter),
    }
    if fuse_method == "cross-attn":
        assert cfg is not None, "cfg required for cross-attn fuse split"
        wq, wkv = jax.vmap(lambda w: split_wqkv_for_cross(w, cfg)
                           )(layers["wqkv_kernel"])
        out["fuse"] = {"wq_kernel": wq, "wkv_kernel": wkv,
                       "wo_kernel": jnp.array(layers["wo_kernel"])}
    return out


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


def compress2_avg(h: jnp.ndarray, pos: jnp.ndarray,
                  final_size: int = FINAL_SIZE):
    """(B, N, C), (B, N) -> bucket-mean states + bucket-MEDIAN positions
    (compress2 'avg', modeling_internlm2.py:1286-1305). torch.median on an
    even count returns the LOWER middle value — matched via sort."""
    B, N, C = h.shape
    final_size = min(final_size, N)
    step = N // final_size
    used = step * final_size
    hc = h[:, :used].reshape(B, final_size, step, C).mean(axis=2)
    ps = jnp.sort(pos[:, :used].reshape(B, final_size, step), axis=2)
    med = ps[:, :, (step - 1) // 2]
    return hc, med


def cross_attention_fuse(fuse_p: dict, cfg: LLMConfig, x_q: jnp.ndarray,
                         x_kv: jnp.ndarray, pos_q: jnp.ndarray,
                         pos_k: jnp.ndarray) -> jnp.ndarray:
    """Cross attention: chunk hidden states (queries) over summary tokens
    (keys/values). Parity with InternLM2CrossAttention.forward
    (modeling_internlm2.py:909-1000): separate rotary per side, GQA via
    repeat, fp32 softmax, NO mask (all summaries visible), wo projection.

    x_q (B, Sq, D), x_kv (B, Sk, D); pos_* (B, S*) float32 rope ids.
    """
    B, Sq, D = x_q.shape
    Sk = x_kv.shape[1]
    Hq, Hkv, hd = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    G = Hq // Hkv
    q = jnp.dot(x_q, fuse_p["wq_kernel"],
                preferred_element_type=jnp.float32
                ).astype(x_q.dtype).reshape(B, Sq, Hq, hd)
    kv = jnp.dot(x_kv, fuse_p["wkv_kernel"],
                 preferred_element_type=jnp.float32
                 ).astype(x_kv.dtype).reshape(B, Sk, Hkv, 2, hd)
    k, v = kv[..., 0, :], kv[..., 1, :]

    from v2pe_tpu.ops.rope import apply_rotary

    cos_q, sin_q = compute_rope_cos_sin(pos_q.astype(jnp.float32),
                                        cfg.head_dim, cfg.rope_theta)
    cos_k, sin_k = compute_rope_cos_sin(pos_k.astype(jnp.float32),
                                        cfg.head_dim, cfg.rope_theta)
    q = apply_rotary(q, cos_q, sin_q)
    k = apply_rotary(k, cos_k, sin_k)

    qg = q.reshape(B, Sq, Hkv, G, hd)
    s = jnp.einsum("bqhgd,bkhd->bhgqk", qg.astype(jnp.float32),
                   k.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgqk,bkhd->bqhgd", w, v.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    o = o.reshape(B, Sq, Hq * hd).astype(x_q.dtype)
    return jnp.dot(o, fuse_p["wo_kernel"],
                   preferred_element_type=jnp.float32).astype(x_q.dtype)


def compress_llm_forward(
    llm_params: dict,
    compress_params: dict,
    cfg: LLMConfig,
    inputs_embeds: jnp.ndarray,   # (B, S, D)
    rope_pos_ids: jnp.ndarray,    # (B, S) float32
    n_chunks: int,
    *,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) packing segments
    final_size: int = FINAL_SIZE,
    attn_impl: str = "auto",
    fuse_method: str = "add",     # 'add' | 'cross-attn'
    return_hidden: bool = False,
):
    """Hierarchical forward: within-chunk attention + earlier-chunk summary
    fusion per layer. Returns fp32 logits (B, S, V) (or final hidden states
    with ``return_hidden`` for the chunked-CE training path).

    fuse 'add': chunk i adds LayerScale(sum of interaction-refined summaries
    of chunks j < i) (:1275-1276). fuse 'cross-attn': chunk i cross-attends
    onto chunk i-1's summaries through the cloned-from-self-attention fuse
    weights, LayerScale-gated (:1277-1282; chunk 0 contributes 0).

    ``segment_ids``: packing sample boundaries. The reference's chunkTrainer
    runs varlen (cu_seqlens) attention inside every chunk, so packed samples
    never attend across each other; here the within-chunk segments combine
    (packing segment, chunk index) so both boundaries mask. Summary
    compression/fusion intentionally crosses sample boundaries, exactly as
    the reference's chunk-level avg pooling does."""
    B, S, D = inputs_embeds.shape
    assert S % n_chunks == 0
    c = S // n_chunks
    final_size = min(final_size, c)  # chunks shorter than FINAL_SIZE would
    # produce empty avg buckets (NaN); the reference never hits this (its
    # chunks are >=8k) but small configs do
    x = inputs_embeds
    cos, sin = compute_rope_cos_sin(rope_pos_ids.astype(jnp.float32),
                                    cfg.head_dim, cfg.rope_theta)
    # within-chunk attention: segment by chunk AND by packing sample —
    # tokens attend iff same chunk and same packed sample (0 = padding)
    chunk_idx = jnp.broadcast_to(
        (jnp.arange(S) // c).astype(jnp.int32)[None], (B, S))
    if segment_ids is not None:
        seg = jnp.where(segment_ids == 0, 0,
                        segment_ids.astype(jnp.int32) * n_chunks
                        + chunk_idx + 1)
    else:
        seg = chunk_idx + 1
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

        # 3. fuse: inject earlier-chunk summaries into each chunk
        if fuse_method == "add":
            # chunk i receives LayerScale(sum of summaries of chunks j < i)
            sums = summaries.reshape(B, n_chunks, final_size, D).sum(axis=2)
            prev = jnp.cumsum(sums, axis=1) - sums      # exclusive prefix
            h = h + (gamma * prev)[:, :, None, :].reshape(
                B, n_chunks, 1, D).repeat(c, axis=2).reshape(B, S, D)
        elif fuse_method == "cross-attn":
            # chunk i cross-attends onto chunk (i-1)'s summaries (:1282);
            # chunk 0's contribution is zeroed (:1280)
            pf = compress_params["fuse"]
            pf_l = jax.tree.map(lambda a: a[li], pf)
            sum_c = summaries.reshape(B, n_chunks, final_size, D)
            prev_sum = jnp.roll(sum_c, 1, axis=1)       # chunk i-1 (0 -> own)
            kpos = sum_pos.reshape(B, n_chunks, final_size)
            prev_kpos = jnp.roll(kpos, 1, axis=1)
            fused = cross_attention_fuse(
                pf_l, cfg,
                h.reshape(B * n_chunks, c, D),
                prev_sum.reshape(B * n_chunks, final_size, D),
                rope_pos_ids.reshape(B * n_chunks, c),
                prev_kpos.reshape(B * n_chunks, final_size))
            fused = fused.reshape(B, n_chunks, c, D)
            gate = (jnp.arange(n_chunks) > 0).astype(h.dtype)
            fused = fused * gate[None, :, None, None]
            h = h + (gamma * fused).reshape(B, S, D)
        else:
            raise NotImplementedError(f"fuse_method={fuse_method!r}")

        # 4. standard within-chunk attention + SwiGLU
        attn_out, _ = attention_forward(
            p, cfg, h, cos, sin, segment_ids=seg, positions=None,
            attn_impl=attn_impl)
        x = x + attn_out
        h = rms_norm(x, p["ffn_norm"], cfg.rms_norm_eps)
        x = x + mlp_forward(p, h)

    x = rms_norm(x, llm_params["norm"], cfg.rms_norm_eps)
    if return_hidden:
        return x
    return jnp.dot(x, llm_params["output_kernel"],
                   preferred_element_type=jnp.float32)


def compress_fuse_only_forward(
    llm_params: dict,
    compress_params: dict,
    cfg: LLMConfig,
    inputs_embeds: jnp.ndarray,   # (B, S, D)
    rope_pos_ids: jnp.ndarray,    # (B, S) float32
    n_chunks: int,
    *,
    final_size: int = FINAL_SIZE,
    attn_impl: str = "auto",
    fuse_method: str = "cross-attn",
):
    """Fuse-only inference branch (modeling_internlm2.py:1366-1436,
    ``fuse_only = not interaction`` :1756): no interaction attention; per
    layer, chunk i compresses the CONCATENATION of all earlier chunks'
    normed hidden states to ``final_size`` summaries via compress2 (bucket
    means + median positions) and fuses them in, then attends within its
    chunk at its global position offsets.

    Divergence, by design: the reference computes the compressed context and
    offsets but drops them before attention (dead code after :1436 — the
    fuse modules are never invoked). Here the summaries feed the same fuse
    ('add'/'cross-attn') used in training, making the branch coherent.

    Python-loop over chunks (static per-chunk shapes grow with i) — an
    inference utility mirroring the reference's per-rank chunk execution.
    """
    B, S, D = inputs_embeds.shape
    assert S % n_chunks == 0
    c = S // n_chunks
    x = inputs_embeds
    cos, sin = compute_rope_cos_sin(rope_pos_ids.astype(jnp.float32),
                                    cfg.head_dim, cfg.rope_theta)
    seg = jnp.broadcast_to(
        (jnp.arange(S) // c + 1).astype(jnp.int32)[None], (B, S))

    layers = llm_params["layers"]
    L = layers["attention_norm"].shape[0]
    for li in range(L):
        p = jax.tree.map(lambda a: a[li], layers)
        gamma = compress_params["layer_scale"][li]
        h = rms_norm(x, p["attention_norm"], cfg.rms_norm_eps)

        fused_chunks = [h[:, :c]]  # chunk 0: no earlier context
        for i in range(1, n_chunks):
            prev_h = h[:, : i * c]
            prev_pos = rope_pos_ids[:, : i * c]
            summ, spos = compress2_avg(prev_h, prev_pos, final_size)
            hc = h[:, i * c: (i + 1) * c]
            if fuse_method == "add":
                fused_chunks.append(
                    hc + gamma * summ.sum(axis=1, keepdims=True))
            else:
                pf_l = jax.tree.map(lambda a: a[li],
                                    compress_params["fuse"])
                out = cross_attention_fuse(
                    pf_l, cfg, hc, summ,
                    rope_pos_ids[:, i * c: (i + 1) * c], spos)
                fused_chunks.append(hc + gamma * out)
        h = jnp.concatenate(fused_chunks, axis=1)

        attn_out, _ = attention_forward(
            p, cfg, h, cos, sin, segment_ids=seg, positions=None,
            attn_impl=attn_impl)
        x = x + attn_out
        h = rms_norm(x, p["ffn_norm"], cfg.rms_norm_eps)
        x = x + mlp_forward(p, h)

    x = rms_norm(x, llm_params["norm"], cfg.rms_norm_eps)
    return jnp.dot(x, llm_params["output_kernel"],
                   preferred_element_type=jnp.float32)
