"""Training orchestration loop.

The analogue of the reference's HF-Trainer-based entry point
(``internvl/train/internvl_chat_finetune.py:1087-1469``) without the
monkey-patching: typed configs in, pjit step, orbax checkpoints with data
resume, host-side packing pipeline with background prefetch."""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core import checkpoint as ckpt_lib
from v2pe_tpu.core.config import MeshConfig, VLMConfig
from v2pe_tpu.data.packing import PackedSampleIterator, collate_rows
from v2pe_tpu.parallel.bootstrap import make_global_batch, make_global_mesh
from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer, lr_schedule
from v2pe_tpu.train.train_step import (init_opt_state, make_train_step,
                                       shard_params)

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class RunConfig:
    output_dir: str = "out"
    max_steps: int = 1000
    save_steps: int = 2500
    save_total_limit: int = 5
    log_steps: int = 10
    max_packed_tokens: int = 8192
    rows_per_batch: int = 1
    max_tiles: int = 32
    loss_reduction: str = "token"
    seed: int = 42


class Prefetcher:
    """Background host thread that packs + collates next batches."""

    def __init__(self, make_batch: Callable[[], dict], depth: int = 2):
        self.q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = False
        self.make_batch = make_batch
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def _run(self):
        while not self._stop:
            try:
                self.q.put(self.make_batch(), timeout=1.0)
            except queue.Full:
                continue
            except Exception as e:  # surface pipeline errors to the consumer
                self.q.put(e)
                return

    def next(self) -> dict:
        item = self.q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def stop(self):
        self._stop = True


def train(
    cfg: VLMConfig,
    params,
    packer: PackedSampleIterator,
    run: RunConfig,
    tc: TrainConfig,
    *,
    mesh_cfg: Optional[MeshConfig] = None,
    img_context_token_id: int,
    attn_impl: str = "auto",
    resume: bool = True,
    pixel_dtype=np.float32,
    metrics_hook: Optional[Callable[[int, dict], None]] = None,
    pipe_microbatches: int = 0,
    ring_mode: str = "scan",
    remat: bool = True,
    async_save: bool = True,
    use_backbone_lora: int = 0,
    use_llm_lora: int = 0,
    offload_optimizer: bool = False,
):
    """Run the training loop; returns (params, opt_state, step).

    Multi-host: call parallel.bootstrap.initialize_distributed() first (the
    CLI does); the mesh then spans all processes with the data axis on DCN,
    each host packs its own dataset shard (build_datasets data_rank /
    data_world_size), and per-host batches are assembled into global arrays
    — ``run.rows_per_batch`` is the PER-HOST row count.

    With use_backbone_lora/use_llm_lora > 0 (the rank; reference finetune
    args internvl_chat_finetune.py:98-105) the base model is frozen and
    only rank-r adapters train: checkpoints then hold the ADAPTER tree (+
    its small optimizer state), and the returned params are the merged
    weights (base + adapters), export-ready."""
    mesh = make_global_mesh(mesh_cfg) if mesh_cfg and \
        mesh_cfg.num_devices > 1 else None
    seq_shards = mesh_cfg.seq if mesh_cfg else 1

    if offload_optimizer:
        import dataclasses as _dc

        tc = _dc.replace(tc, use_8bit_optimizer=True,
                         offload_optimizer=True)
    lora_mode = bool(use_backbone_lora or use_llm_lora)
    if lora_mode:
        from v2pe_tpu.models.lora import build_lora, merge_lora

        adapters = build_lora(jax.random.PRNGKey(run.seed ^ 0x10BA), params,
                              backbone_r=use_backbone_lora,
                              llm_r=use_llm_lora)
        trainable = adapters
    else:
        trainable = params

    tx = build_optimizer(tc, trainable)
    if mesh is not None:
        params = shard_params(params, mesh)
        trainable = params if not lora_mode else shard_params(trainable,
                                                              mesh)
    opt_state = init_opt_state(tx, trainable, mesh)
    step_fn = make_train_step(cfg, tx, mesh, img_context_token_id,
                              attn_impl=attn_impl, remat=remat,
                              pipe_microbatches=pipe_microbatches,
                              ring_mode=ring_mode, lora=lora_mode,
                              offload_optimizer=offload_optimizer)

    start_step = 0
    if resume:
        last = ckpt_lib.latest_checkpoint(run.output_dir)
        if last is not None:
            trainable, opt_state, start_step, data_state = \
                ckpt_lib.restore_checkpoint(last, trainable, opt_state)
            if not lora_mode:
                params = trainable
            if data_state is not None:
                packer.load_state_dict(data_state)
            logger.info("resumed from %s at step %d", last, start_step)

    row_iter = iter(packer)

    def make_batch():
        rows = [next(row_iter) for _ in range(run.rows_per_batch)]
        # snapshot the packer state that corresponds to THIS batch being
        # consumed — saving packer.state_dict() at checkpoint time would
        # reflect samples already pulled into prefetched-but-unconsumed
        # batches (queue depth + in-flight) and silently skip data on resume
        data_state = packer.state_dict()
        batch = collate_rows(
            rows, max_tokens=run.max_packed_tokens, max_tiles=run.max_tiles,
            img_context_token_id=img_context_token_id,
            num_image_token=cfg.num_image_token,
            loss_reduction=run.loss_reduction, seq_shards=seq_shards,
            pixel_dtype=pixel_dtype)
        batch.pop("statistics")
        return batch, data_state

    saver = ckpt_lib.AsyncSaver() if async_save else None
    prefetch = Prefetcher(make_batch)
    sched = lr_schedule(tc)
    t_last = time.time()
    tokens_since = 0

    # DropPath (stochastic depth) rng: only when the config trains with it
    # (--drop_path_rate 0.1 in the published recipes); same base key on all
    # hosts — the mask is drawn inside jit over the global batch
    use_dp = cfg.vision.drop_path_rate > 0.0
    dp_base = jax.random.PRNGKey(run.seed ^ 0x5EED) if use_dp else None

    consumed_state = None
    try:
        for step in range(start_step, run.max_steps):
            batch, consumed_state = prefetch.next()
            if mesh is not None:
                batch = make_global_batch(
                    batch, mesh, vit_rows_per_tile=cfg.num_image_token)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng = jax.random.fold_in(dp_base, step) if use_dp else None
            if lora_mode:
                trainable, opt_state, metrics = step_fn(
                    trainable, opt_state, batch, params, rng)
            else:
                trainable, opt_state, metrics = step_fn(trainable, opt_state,
                                                        batch, rng)
                params = trainable
            tokens_since += run.rows_per_batch * run.max_packed_tokens

            if (step + 1) % run.log_steps == 0:
                loss = float(metrics["loss"])
                dt = time.time() - t_last
                tps = tokens_since / max(dt, 1e-9)
                logger.info(
                    "step %d loss %.4f grad_norm %.3f lr %.2e tok/s %.0f",
                    step + 1, loss, float(metrics["grad_norm"]),
                    float(sched(step + 1)), tps)
                if metrics_hook:
                    metrics_hook(step + 1, {
                        "loss": loss, "tokens_per_sec": tps,
                        "grad_norm": float(metrics["grad_norm"])})
                t_last = time.time()
                tokens_since = 0

            if (step + 1) % run.save_steps == 0 or step + 1 == run.max_steps:
                ds = (consumed_state if consumed_state is not None
                      else packer.state_dict())
                if saver is not None:
                    # returns once device arrays are snapshotted; disk write
                    # overlaps the following steps (commit at next save/exit)
                    path = saver.save(
                        run.output_dir, step + 1, trainable, opt_state,
                        data_state=ds,
                        save_total_limit=run.save_total_limit, cfg=cfg)
                else:
                    path = ckpt_lib.save_checkpoint(
                        run.output_dir, step + 1, trainable, opt_state,
                        data_state=ds,
                        save_total_limit=run.save_total_limit, cfg=cfg)
                logger.info("saved %s", path)
    finally:
        prefetch.stop()
        if saver is not None:
            saver.close()

    if lora_mode:
        params = jax.jit(merge_lora)(params, trainable)
    return params, opt_state, run.max_steps
