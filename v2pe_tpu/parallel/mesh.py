"""Device mesh and sharding policy.

Replaces the reference's process-group plumbing (DeepSpeed ZeRO-1/3 data
parallelism + `chunk_num`-sized ring groups created via dist.new_group,
internvl_chat_finetune.py:1104-1111, dist_utils.py) with one
``jax.sharding.Mesh`` and named-axis PartitionSpecs:

* ``data``   — data parallel (DCN-friendly outermost axis)
* ``fsdp``   — ZeRO-3-style parameter/optimizer sharding (ICI)
* ``seq``    — sequence/context parallel for ring attention (ICI)
* ``tensor`` — Megatron-style tensor parallel over heads/ffn (ICI);
               the reference has none (TODO at internvl_chat_finetune.py:976)
               — it falls out of pjit sharding rules here.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2pe_tpu.core.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = cfg.num_devices
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(cfg.shape)
    return Mesh(dev, cfg.axis_names)


# Path-regex -> PartitionSpec for every parameter. Layer-stacked tensors have
# a leading L dim (never sharded; lax.scan iterates it).
_PARAM_RULES = [
    # LLM — Megatron TP on the contracted/expanded dims, fsdp on the other
    (r"llm/layers/wqkv_kernel", P(None, "fsdp", "tensor")),
    (r"llm/layers/wqkv_bias", P(None, "tensor")),
    (r"llm/layers/wo_kernel", P(None, "tensor", "fsdp")),
    (r"llm/layers/wo_bias", P(None, None)),
    (r"llm/layers/w1_kernel", P(None, "fsdp", "tensor")),
    (r"llm/layers/w3_kernel", P(None, "fsdp", "tensor")),
    (r"llm/layers/w2_kernel", P(None, "tensor", "fsdp")),
    (r"llm/layers/(attention_norm|ffn_norm)", P(None, None)),
    (r"llm/tok_embeddings", P("tensor", "fsdp")),
    (r"llm/output_kernel", P("fsdp", "tensor")),
    (r"llm/norm", P(None)),
    # Vision tower — fsdp-shard the big matmuls, TP over qkv/ffn out dims
    (r"vision/layers/qkv_kernel", P(None, "fsdp", "tensor")),
    (r"vision/layers/qkv_bias", P(None, "tensor")),
    (r"vision/layers/proj_kernel", P(None, "tensor", "fsdp")),
    (r"vision/layers/fc1_kernel", P(None, "fsdp", "tensor")),
    (r"vision/layers/fc1_bias", P(None, "tensor")),
    (r"vision/layers/fc2_kernel", P(None, "tensor", "fsdp")),
    (r"vision/layers/.*", P(None, None)),
    (r"vision/embeddings/patch_kernel", P("fsdp", None)),
    (r"vision/embeddings/.*", P(None)),
    # projector
    (r"mlp1/fc1_kernel", P("fsdp", "tensor")),
    (r"mlp1/fc2_kernel", P("tensor", "fsdp")),
    (r"mlp1/.*", P(None)),
    # compress-seq: interaction/fuse are attention-weight clones — same
    # layout as the LLM attention; layer_scale stays replicated
    (r"compress/interaction/wqkv_kernel", P(None, "fsdp", "tensor")),
    (r"compress/interaction/wo_kernel", P(None, "tensor", "fsdp")),
    (r"compress/fuse/(wq|wkv)_kernel", P(None, "fsdp", "tensor")),
    (r"compress/fuse/wo_kernel", P(None, "tensor", "fsdp")),
    (r"compress/.*", P(None)),
]


def _spec_for_path(path: str, ndim: int) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.fullmatch(pattern, path):
            tup = tuple(spec)
            if len(tup) < ndim:
                tup = tup + (None,) * (ndim - len(tup))
            return P(*tup[:ndim])
    return P(*([None] * ndim))


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop sharding on dims the mesh axis doesn't divide (e.g. the odd
    92553-entry vocab can't split over 'tensor')."""
    out = []
    for dim, axes in zip(shape, tuple(spec)):
        if axes is None:
            out.append(None)
            continue
        ax_tuple = axes if isinstance(axes, tuple) else (axes,)
        size = 1
        for a in ax_tuple:
            size *= mesh.shape[a]
        out.append(axes if dim % size == 0 else None)
    return P(*out)


def param_sharding(params, mesh: Mesh):
    """NamedSharding pytree for a param pytree (path-based rules)."""

    has_pipe = dict(mesh.shape).get("pipe", 1) > 1

    def visit(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        # Quantized weight children (QuantizedWeight.q / Int4Weight.p):
        # the payload shards like the kernel it replaces; the per-channel
        # (or per-group) scale shards on the output (last) dim only
        if path_str.endswith("/q") or path_str.endswith("/p"):
            spec = _spec_for_path(path_str[:-2], leaf.ndim)
        elif path_str.endswith("/scale"):
            kernel = _spec_for_path(path_str[:-6], leaf.ndim)
            spec = P(*([None] * (leaf.ndim - 1) + list(tuple(kernel))[-1:]))
        else:
            spec = _spec_for_path(path_str, leaf.ndim)
        if has_pipe and leaf.ndim and (
                path_str.startswith("llm/layers/")
                or path_str.startswith("layers/")):
            # pipeline parallelism: each stage owns a contiguous block of
            # decoder layers — shard the stacked leading L dim over 'pipe'
            # (parallel/pipeline.py consumes this layout via shard_map)
            spec = P("pipe", *tuple(spec)[1:])
        return NamedSharding(mesh, _fit_spec(spec, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(visit, params)


def batch_sharding(mesh: Mesh):
    """Shardings for one packed training batch (see data/packing.py):
    sequences are sharded over (data, fsdp) on the batch dim and 'seq' on the
    sequence dim; the flat tile stack over (data, fsdp)."""
    return {
        "input_ids": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "rope_pos_ids": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "segment_ids": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "labels": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "loss_weight": NamedSharding(mesh, P(("data", "fsdp"), "seq")),
        "pixel_values": NamedSharding(mesh, P(("data", "fsdp"))),
        "image_flags": NamedSharding(mesh, P(("data", "fsdp"))),
    }


def logical_batch_spec():
    return {
        "input_ids": P(("data", "fsdp"), "seq"),
        "rope_pos_ids": P(("data", "fsdp"), "seq"),
        "segment_ids": P(("data", "fsdp"), "seq"),
        "labels": P(("data", "fsdp"), "seq"),
        "loss_weight": P(("data", "fsdp"), "seq"),
        "pixel_values": P(("data", "fsdp")),
        "image_flags": P(("data", "fsdp")),
    }
