"""Checkpoint / resume via orbax.

Replaces HF Trainer + DeepSpeed checkpointing (internvl_chat_finetune.py:
1139-1151, 1446-1451; zero-3 gather-on-save): saves sharded params +
optimizer state + step natively (no gather needed under pjit), plus the
packed-data iterator state (the reference threads worker-state dicts through
batches, dataset_packed.py:143-153, 392-398 — ours is an explicit JSON
sidecar). Auto-resume = latest step dir, with save_total_limit pruning."""

from __future__ import annotations

import json
import os
import pickle
import re
import shutil
from typing import Any, Optional

import jax


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state,
                    data_state: Optional[dict] = None,
                    save_total_limit: Optional[int] = None,
                    cfg=None):
    """Multi-host aware: the orbax saves are collective (all processes must
    call this); the packed-data iterator state is PER-HOST (each host packs
    its own dataset shard) so it lands in ``data_state_p{i}.pkl``; meta.json
    and pruning are process-0 only."""
    ocp = _ocp()
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    if os.path.isdir(path) and \
            not os.path.exists(os.path.join(path, "meta.json")):
        # uncommitted leftover (crash before the meta.json marker) —
        # orbax refuses to overwrite an existing destination
        if jax.process_index() == 0:
            shutil.rmtree(path, ignore_errors=True)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"v2pe_ckpt_clean_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "opt_state"), opt_state)
    pid = jax.process_index()
    if data_state is not None:
        # rng state tuples aren't JSON-safe; pickle the sidecar
        with open(os.path.join(path, f"data_state_p{pid}.pkl"), "wb") as f:
            pickle.dump(data_state, f)
    if pid == 0:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"step": step,
                       "num_processes": jax.process_count()}, f)
        if cfg is not None:
            # persist the full pipeline config with the weights (the
            # reference serializes every V2PE knob into the HF config so
            # eval reads rope_pos_id_stride etc. from the checkpoint —
            # configuration_internvl_chat.py:101-131, eval_milebench.py:
            # 226-230); evalkit's load_chat_model picks this up
            with open(os.path.join(path, "config.json"), "w") as f:
                f.write(cfg.to_json())
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"v2pe_ckpt_save_{step}")

    if save_total_limit and pid == 0:
        steps = sorted(list_checkpoints(ckpt_dir))
        for s in steps[:-save_total_limit]:
            shutil.rmtree(os.path.join(ckpt_dir, f"step_{s:08d}"),
                          ignore_errors=True)
    return path


class AsyncSaver:
    """Asynchronous checkpoint writer for the training loop.

    ``save`` returns as soon as the device arrays are snapshotted to host
    (orbax ``AsyncCheckpointer`` — the device->host copy is synchronous, so
    donated params/opt buffers may be reused by the next step immediately);
    serialization to disk proceeds in background threads while training
    continues. The reference stalls the step loop for the full DeepSpeed
    gather+write (trainer.save_model); here the loop only ever waits if the
    previous save is still in flight when the next one starts.

    ``meta.json`` — the commit marker :func:`list_checkpoints` keys on — is
    written only in :meth:`finalize`, after the background write completes,
    so a crash mid-write can never leave a resumable-looking but corrupt
    step dir. Pruning (``save_total_limit``) is likewise deferred. Call
    :meth:`finalize` before reading checkpoints or exiting (the trainer does
    both); in multi-host runs every process must call save/finalize
    collectively, matching :func:`save_checkpoint`.
    """

    def __init__(self):
        self._ckptrs = None  # (params, opt_state) AsyncCheckpointers
        self._pending = None

    def _checkpointers(self):
        if self._ckptrs is None:
            ocp = _ocp()
            self._ckptrs = (ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler()),
                            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler()))
        return self._ckptrs

    def save(self, ckpt_dir: str, step: int, params, opt_state,
             data_state: Optional[dict] = None,
             save_total_limit: Optional[int] = None,
             cfg=None) -> str:
        self.finalize()
        path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
        if os.path.isdir(path) and \
                not os.path.exists(os.path.join(path, "meta.json")):
            # stale uncommitted dir from a crash between save and
            # finalize — orbax refuses to overwrite; resume skipped it
            # (no commit marker), so it is safe to clear
            if jax.process_index() == 0:
                shutil.rmtree(path, ignore_errors=True)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(
                    f"v2pe_ckpt_clean_{step}")
        cp, co = self._checkpointers()
        cp.save(os.path.join(path, "params"), params)
        co.save(os.path.join(path, "opt_state"), opt_state)
        pid = jax.process_index()
        if data_state is not None:  # host data, cheap — write inline
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, f"data_state_p{pid}.pkl"),
                      "wb") as f:
                pickle.dump(data_state, f)
        if pid == 0 and cfg is not None:
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "config.json"), "w") as f:
                f.write(cfg.to_json())
        self._pending = {"path": path, "step": step, "ckpt_dir": ckpt_dir,
                         "limit": save_total_limit}
        return path

    def finalize(self) -> Optional[str]:
        """Block until the in-flight save (if any) is durable, then write
        the commit marker and prune. Returns the committed path."""
        if self._pending is None:
            return None
        for c in self._ckptrs:
            c.wait_until_finished()
        p, self._pending = self._pending, None
        pid = jax.process_index()
        if pid == 0:
            with open(os.path.join(p["path"], "meta.json"), "w") as f:
                json.dump({"step": p["step"],
                           "num_processes": jax.process_count()}, f)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(
                f"v2pe_ckpt_commit_{p['step']}")
        if p["limit"] and pid == 0:
            for s in sorted(list_checkpoints(p["ckpt_dir"]))[:-p["limit"]]:
                shutil.rmtree(
                    os.path.join(p["ckpt_dir"], f"step_{s:08d}"),
                    ignore_errors=True)
        return p["path"]

    def close(self):
        self.finalize()
        if self._ckptrs is not None:
            for c in self._ckptrs:
                c.close()
            self._ckptrs = None


def list_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m and os.path.exists(os.path.join(ckpt_dir, name, "meta.json")):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    steps = list_checkpoints(ckpt_dir)
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{steps[-1]:08d}")


def restore_checkpoint(path: str, params_template, opt_state_template):
    """Restore with sharding/layout taken from the (possibly sharded)
    templates (abstract arrays allowed)."""
    ocp = _ocp()
    path = os.path.abspath(path)

    def _restore(sub, template):
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(os.path.join(path, sub),
                                 item=template)

    params = _restore("params", params_template)
    opt_state = _restore("opt_state", opt_state_template)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    step = meta["step"]
    saved_procs = meta.get("num_processes", 1)
    data_state = None
    if saved_procs != jax.process_count():
        # per-process data shards don't remap across process counts —
        # resuming would mix mid-epoch and fresh iterators silently
        import logging

        logging.getLogger(__name__).warning(
            "checkpoint %s was saved by %d processes but this run has %d; "
            "data-iterator state is DISCARDED (all processes restart their "
            "shard) — params/opt state restore normally",
            path, saved_procs, jax.process_count())
    else:
        ds_path = os.path.join(
            path, f"data_state_p{jax.process_index()}.pkl")
        if not os.path.exists(ds_path):  # pre-multihost layout
            ds_path = os.path.join(path, "data_state.pkl")
        if os.path.exists(ds_path):
            with open(ds_path, "rb") as f:
                data_state = pickle.load(f)
    return params, opt_state, step, data_state
