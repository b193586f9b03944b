"""Worker process for the multi-host train-step parity test (not a test
itself; spawned by test_multihost.py with V2PE_* env vars).

Each process: 4 virtual CPU devices -> global mesh {data:2, fsdp:2, seq:1,
tensor:2} across 2 processes (data axis spans processes, like DCN), packs its
own synthetic batch, assembles the global batch, runs one train step, prints
the global loss."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from v2pe_tpu.core.config import MeshConfig, debug_tiny  # noqa: E402
from v2pe_tpu.models.params import init_vlm_params  # noqa: E402
from v2pe_tpu.parallel.bootstrap import (initialize_distributed,  # noqa: E402
                                         make_global_batch,
                                         make_global_mesh)
from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer  # noqa: E402
from v2pe_tpu.train.synth import IMG_CONTEXT_ID, make_synthetic_batch  # noqa: E402
from v2pe_tpu.train.train_step import (init_opt_state,  # noqa: E402
                                       make_train_step, shard_params)


def main():
    denv = initialize_distributed("env")
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    pid = jax.process_index()

    cfg = debug_tiny()
    cfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision, image_size=112))
    B_local, S = 2, 256

    mesh = make_global_mesh(MeshConfig(data=2, fsdp=2, seq=1, tensor=2))
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    params = shard_params(params, mesh)
    tc = TrainConfig(learning_rate=1e-3, warmup_steps=1, total_steps=10)
    tx = build_optimizer(tc, params)
    opt_state = init_opt_state(tx, params, mesh)

    # per-host distinct data (seed by process id, like rank-sharded datasets)
    batch = make_synthetic_batch(cfg, B_local, S, tiles_per_row=1,
                                 seed=100 + pid)
    batch = make_global_batch(batch, mesh,
                              vit_rows_per_tile=cfg.num_image_token)

    step = make_train_step(cfg, tx, mesh, IMG_CONTEXT_ID, attn_impl="jnp",
                           remat=True, donate=False)
    params, opt_state, m = step(params, opt_state, batch)
    loss = float(m["loss"])
    gn = float(m["grad_norm"])
    print(f"DIST_RESULT pid={pid} loss={loss:.6f} grad_norm={gn:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
