"""Multi-host distributed bootstrap: jax.distributed + DCN-aware meshes +
per-host batch assembly.

TPU-native replacement for the reference's launcher/process-group plumbing
(``internvl/dist_utils.py:32-104`` — slurm / torchrun("pytorch") / mpi
detection feeding ``deepspeed.init_distributed``; ring groups created at
``internvl/train/internvl_chat_finetune.py:1104-1111``). Here one
``jax.distributed`` runtime replaces NCCL process groups, and a single
global Mesh spans ICI (intra-slice: fsdp/seq/tensor) and DCN (across
slices/hosts: the ``data`` axis), so DCN only ever carries data-parallel
gradient reduction — the collective layout the hardware wants.

Launcher detection order (mirrors dist_utils launcher choices):

1. explicit env ``V2PE_COORDINATOR`` / ``V2PE_NUM_PROCESSES`` /
   ``V2PE_PROCESS_ID`` (the torchrun-style "pytorch" path);
2. SLURM (``SLURM_PROCID``/``SLURM_NTASKS``/``SLURM_STEP_NODELIST``);
3. OpenMPI (``OMPI_COMM_WORLD_RANK``/``_SIZE``);
4. Cloud TPU pod metadata — ``jax.distributed.initialize()`` no-arg
   autodetection;
5. none: single-process (no-op).
"""

from __future__ import annotations

import dataclasses
import logging
import os
import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2pe_tpu.core.config import MeshConfig

logger = logging.getLogger(__name__)

_INITIALIZED = False


@dataclasses.dataclass(frozen=True)
class DistEnv:
    launcher: str            # 'env' | 'slurm' | 'mpi' | 'tpu' | 'none'
    process_id: int
    num_processes: int
    coordinator: Optional[str]  # host:port, None for tpu autodetect / none


def _first_slurm_node(nodelist: str) -> str:
    """First hostname of a SLURM nodelist like 'node[3-5,9],other' —
    the analogue of `scontrol show hostname | head -n1`
    (dist_utils.py:87-89) without shelling out."""
    m = re.match(r"([^\[,]+)(\[([^\]]+)\])?", nodelist)
    prefix = m.group(1)
    if not m.group(2):
        return prefix
    first = m.group(3).split(",")[0].split("-")[0]
    return prefix + first


def detect_env(coordinator_port: int = 8476) -> DistEnv:
    """Inspect the environment for a launcher, without side effects."""
    env = os.environ
    if "V2PE_NUM_PROCESSES" in env:
        return DistEnv(
            launcher="env",
            process_id=int(env.get("V2PE_PROCESS_ID", "0")),
            num_processes=int(env["V2PE_NUM_PROCESSES"]),
            coordinator=env.get("V2PE_COORDINATOR",
                                f"127.0.0.1:{coordinator_port}"))
    if "SLURM_PROCID" in env and int(env.get("SLURM_NTASKS", "1")) > 1:
        host = _first_slurm_node(env.get("SLURM_STEP_NODELIST",
                                         env.get("SLURM_NODELIST", "")))
        return DistEnv(
            launcher="slurm",
            process_id=int(env["SLURM_PROCID"]),
            num_processes=int(env["SLURM_NTASKS"]),
            coordinator=f"{host}:{coordinator_port}")
    if "OMPI_COMM_WORLD_RANK" in env \
            and int(env.get("OMPI_COMM_WORLD_SIZE", "1")) > 1:
        return DistEnv(
            launcher="mpi",
            process_id=int(env["OMPI_COMM_WORLD_RANK"]),
            num_processes=int(env["OMPI_COMM_WORLD_SIZE"]),
            coordinator=env.get("V2PE_COORDINATOR",
                                f"127.0.0.1:{coordinator_port}"))
    tpu_workers = [h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",")
                   if h]
    if len(tpu_workers) > 1 or "MEGASCALE_COORDINATOR_ADDRESS" in env:
        # single-worker images also export TPU_WORKER_HOSTNAMES=localhost;
        # only a real multi-worker pod needs the distributed runtime
        return DistEnv(launcher="tpu", process_id=-1, num_processes=-1,
                       coordinator=None)
    return DistEnv(launcher="none", process_id=0, num_processes=1,
                   coordinator=None)


def initialize_distributed(launcher: str = "auto",
                           coordinator_port: int = 8476) -> DistEnv:
    """Initialize the jax.distributed runtime if a multi-process launcher is
    detected (or forced). Idempotent; safe to call in single-process runs."""
    global _INITIALIZED
    denv = detect_env(coordinator_port)
    if launcher != "auto":
        denv = dataclasses.replace(denv, launcher=launcher)
    if denv.launcher == "none" or denv.num_processes == 1:
        return denv
    if _INITIALIZED:
        return denv
    if denv.launcher == "tpu":
        jax.distributed.initialize()  # pod metadata autodetection
    else:
        jax.distributed.initialize(
            coordinator_address=denv.coordinator,
            num_processes=denv.num_processes,
            process_id=denv.process_id)
    _INITIALIZED = True
    logger.info("jax.distributed up: launcher=%s process %d/%d devices %d",
                denv.launcher, jax.process_index(), jax.process_count(),
                jax.device_count())
    return denv


# ---------------------------------------------------------------------------
# DCN-aware global mesh
# ---------------------------------------------------------------------------


def _num_granules(devices) -> int:
    """Number of DCN 'granules' (TPU slices, or processes as a fallback)."""
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if None not in slice_ids and len(slice_ids) > 1:
        return len(slice_ids)
    return max(1, jax.process_count())


def make_global_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    """A Mesh whose outermost axis rides DCN across slices/hosts — the
    ``pipe`` axis when one is sized (stage handoffs are the only cross-
    slice traffic), else ``data`` — with the remaining axes inside a
    slice (ICI).

    Single-process: plain reshape (identical to parallel.mesh.make_mesh).
    Multi-slice TPU: ``mesh_utils.create_hybrid_device_mesh`` so physical
    neighbours land adjacent on ICI axes. Multi-process CPU (tests) or
    anything without slice metadata: reshape of ``jax.devices()`` — JAX
    orders it by process index, so the outermost (data) axis naturally
    spans processes and collectives inside a host stay local.
    """
    devices = devices if devices is not None else jax.devices()
    n = cfg.num_devices
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if jax.process_count() > 1 and n != len(devices):
        raise ValueError(
            f"multi-process run: the mesh ({cfg.shape}, {n} devices) must "
            f"cover ALL {len(devices)} global devices, otherwise some "
            f"processes hold no addressable mesh shard — size the "
            f"data/fsdp/seq/tensor axes to the full topology")
    granules = _num_granules(devices[:n])
    if granules <= 1:
        dev = np.asarray(devices[:n]).reshape(cfg.shape)
        return Mesh(dev, cfg.axis_names)

    if cfg.pipe > 1:
        # pipeline stages ride DCN (one layer block per slice) — the
        # activations-only stage handoff is exactly what DCN tolerates
        assert cfg.pipe % granules == 0, (
            f"mesh pipe axis ({cfg.pipe}) must be divisible by the number "
            f"of slices/hosts ({granules}) — pipe is what rides DCN")
        ici_shape = (cfg.pipe // granules, cfg.data, cfg.fsdp, cfg.seq,
                     cfg.tensor)
        dcn_shape = (granules, 1, 1, 1, 1)
    else:
        assert cfg.data % granules == 0, (
            f"mesh data axis ({cfg.data}) must be divisible by the number "
            f"of slices/hosts ({granules}) — the data axis is what rides "
            f"DCN")
        ici_shape = (cfg.data // granules, cfg.fsdp, cfg.seq, cfg.tensor)
        dcn_shape = (granules, 1, 1, 1)
    try:
        from jax.experimental import mesh_utils

        dev = mesh_utils.create_hybrid_device_mesh(
            ici_shape, dcn_shape, devices=devices[:n])
    except Exception:  # no slice metadata (CPU multi-process tests)
        dev = np.asarray(devices[:n]).reshape(cfg.shape)
    return Mesh(dev, cfg.axis_names)


# ---------------------------------------------------------------------------
# Per-host batch assembly
# ---------------------------------------------------------------------------

# sharding spec per batch key (the train-step batch contract,
# train/train_step.py): (B, S) arrays shard batch over (data, fsdp) and
# sequence over seq; the flat tile stack shards over (data, fsdp) only.
_SEQ_KEYS = ("input_ids", "rope_pos_ids", "token_positions", "segment_ids",
             "targets", "labels", "loss_weight", "vit_gather_idx")
_TILE_KEYS = ("pixel_values", "image_flags")


def batch_spec(key: str) -> P:
    if key in _SEQ_KEYS:
        return P(("data", "fsdp"), "seq")
    if key in _TILE_KEYS:
        return P(("data", "fsdp"))
    return P()  # replicated (single-process convenience only; see below)


def make_global_batch(batch: dict, mesh: Mesh,
                      vit_rows_per_tile: Optional[int] = None) -> dict:
    """Assemble per-process local batches into global jax.Arrays.

    Replaces the reference's per-rank DataLoader + DeepSpeed gradient
    all-reduce data feeding: each host packs its own dataset shard
    (data/datasets.py rank sharding) and contributes the rows for its
    addressable mesh portion; ``jax.make_array_from_process_local_data``
    builds the global array without any host gathering. Single-process:
    plain device_put with the same shardings (keeps the data layout
    identical across 1..N hosts).

    ``vit_rows_per_tile`` (= num_image_token after pixel-shuffle/projection):
    the host collator computes ``vit_gather_idx`` against its LOCAL tile
    stack; globally the tile stacks concatenate process-major, so host p's
    indices shift by ``p * local_tiles * vit_rows_per_tile``.
    """
    nproc = jax.process_count()
    pid = jax.process_index()
    if nproc > 1:
        unknown = [k for k in batch
                   if k not in _SEQ_KEYS and k not in _TILE_KEYS]
        if unknown:
            # a replicated (P()) key assembled from per-process data silently
            # picks inconsistent replicas if hosts ever disagree — refuse
            # rather than guess (extend _SEQ_KEYS/_TILE_KEYS deliberately)
            raise ValueError(
                f"batch keys {unknown} have no multi-host sharding contract")
    out = {}
    local_tiles = np.asarray(batch["pixel_values"]).shape[0] \
        if "pixel_values" in batch else 0
    for k, v in batch.items():
        v = np.asarray(v)
        if (k == "vit_gather_idx" and nproc > 1
                and vit_rows_per_tile is not None):
            off = pid * local_tiles * vit_rows_per_tile
            v = np.where(v >= 0, v + off, v)
        sharding = NamedSharding(mesh, batch_spec(k))
        if nproc == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            if v.ndim == 0:
                out[k] = jax.make_array_from_process_local_data(
                    sharding, v, v.shape)
            else:
                gshape = (v.shape[0] * nproc,) + v.shape[1:] \
                    if batch_spec(k) != P() else v.shape
                out[k] = jax.make_array_from_process_local_data(
                    sharding, v, gshape)
    return out
