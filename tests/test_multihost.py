"""Multi-host runtime test: a real 2-process jax.distributed CPU cluster
(4 virtual devices each -> 8 global) runs one sharded train step on
per-host data; the loss must equal a single-process run on the combined
batch. Validates parallel/bootstrap.py end-to-end: launcher env detection,
jax.distributed init, global mesh with the data axis spanning processes,
make_array_from_process_local_data batch assembly, and the vit_gather_idx
global-offset contract."""

import dataclasses
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update({
            "V2PE_NUM_PROCESSES": "2",
            "V2PE_PROCESS_ID": str(pid),
            "V2PE_COORDINATOR": f"127.0.0.1:{port}",
        })
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "dist_worker.py")],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    losses, gnorms = {}, {}
    for out in outs:
        m = re.search(r"DIST_RESULT pid=(\d) loss=([\d.]+) grad_norm=([\d.]+)",
                      out)
        assert m, out[-4000:]
        losses[int(m.group(1))] = float(m.group(2))
        gnorms[int(m.group(1))] = float(m.group(3))
    assert set(losses) == {0, 1}
    assert losses[0] == losses[1]  # global loss is identical on every host

    # single-process reference on the combined batch (no mesh)
    import jax
    import jax.numpy as jnp

    from v2pe_tpu.core.config import debug_tiny
    from v2pe_tpu.models.params import init_vlm_params
    from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer
    from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch
    from v2pe_tpu.train.train_step import make_train_step

    cfg = debug_tiny()
    cfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision, image_size=112))
    b0 = make_synthetic_batch(cfg, 2, 256, tiles_per_row=1, seed=100)
    b1 = make_synthetic_batch(cfg, 2, 256, tiles_per_row=1, seed=101)
    nit = cfg.num_image_token
    local_tiles = b0["pixel_values"].shape[0]
    b1["vit_gather_idx"] = np.where(
        b1["vit_gather_idx"] >= 0,
        b1["vit_gather_idx"] + local_tiles * nit, b1["vit_gather_idx"])
    batch = {k: jnp.asarray(np.concatenate([b0[k], b1[k]], axis=0))
             for k in b0}

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(tc, params)
    opt_state = tx.init(params)
    step = make_train_step(cfg, tx, None, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=True, donate=False)
    _, _, m_ref = step(params, opt_state, batch)

    np.testing.assert_allclose(losses[0], float(m_ref["loss"]), rtol=2e-4)
    np.testing.assert_allclose(gnorms[0], float(m_ref["grad_norm"]),
                               rtol=2e-3)
