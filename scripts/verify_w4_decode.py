#!/usr/bin/env python
"""One-off: measure the two new int4 weight-only decode datapoints on the
real chip (exactly the code path bench.py's ``decode_tok_s_8k_dense_w4`` /
``decode_tok_s_32k_paged_w4kv8`` run), so the numbers land in docs and the
compile cache is warm before the driver's bench run. Prints a JSON line
after each datapoint (bench.py's convention) — consumers keep the last,
complete one.
"""

import functools
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
    from v2pe_tpu.ops.quantized_matmul import quantize_llm_params

    cfg = internvl2_2b()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    q4 = {"llm": jax.jit(
        functools.partial(quantize_llm_params, bits=4))(params["llm"])}
    del params
    out = {}
    out["decode_tok_s_8k_dense_w4"] = round(bench._decode_bench(
        jax, jnp, cfg, q4, 8192, paged=False), 1)
    print(json.dumps(out), flush=True)
    out["decode_tok_s_32k_paged_w4kv8"] = round(bench._decode_bench(
        jax, jnp, cfg, q4, 32768, paged=True, kv_dtype="int8"), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
