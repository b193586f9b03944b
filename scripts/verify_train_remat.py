#!/usr/bin/env python
"""One-off: the training-perf measurement sweep on the real chip — the
round-5 'give training the prefill treatment' task (docs/perf_analysis.md
training section; exactly the code path bench.py's ``train_tok_s_*`` keys
run). Measures:

* the 8k/8-tile step under every remat policy (full / block2 / attn_saved)
  — the selective-remat keep/kill;
* the published recipe's unit of work: a 32k-packed train step
  (reference: shell/internlm2_2b/..._v2pe_32k.sh, --max_packed_tokens
  34000 on 32 A100s x 48 h) — tried with the policy whose residuals fit
  one 16 GB chip.

Prints a JSON line after each datapoint (bench.py's convention); consumers
keep the last, complete one. Each policy gets a fresh params tree (the
train step donates/consumes the buffers).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from v2pe_tpu.utils import compile_cache

    compile_cache.enable()
    import bench
    from v2pe_tpu.core.config import internvl2_2b
    from v2pe_tpu.models.params import init_vlm_params

    cfg = internvl2_2b()

    def fresh():
        return init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)

    out = {}

    def dp(key, fn):
        try:
            out[key] = round(fn(), 1)
        except Exception as e:  # noqa: BLE001 — record and continue
            e.__traceback__ = None
            out[key + "_error"] = repr(e)[:200]
        import gc

        gc.collect()
        jax.clear_caches()
        print(json.dumps(out), flush=True)

    dp("train_tok_s_8k_8tiles_full",
       lambda: bench._train_bench(jax, jnp, cfg, fresh(), remat="full"))
    dp("train_tok_s_8k_8tiles_block2",
       lambda: bench._train_bench(jax, jnp, cfg, fresh(), remat="block2"))
    dp("train_tok_s_8k_8tiles_attn_saved",
       lambda: bench._train_bench(jax, jnp, cfg, fresh(),
                                  remat="attn_saved"))
    # the 32k recipe's gradient computation (fwd+bwd, full remat): the
    # FULL step's params+grads+moments static set (13.4 GB) misses one
    # 16 GB chip in every measured configuration incl. host-offloaded
    # moments — see docs/perf_analysis.md (training section) for the
    # campaign table; the recipe's own regime is optimizer-sharded
    dp("train_fwdbwd_tok_s_32k_32tiles",
       lambda: bench._train_fwdbwd_bench(jax, jnp, cfg, fresh()))


if __name__ == "__main__":
    main()
