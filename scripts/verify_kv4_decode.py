#!/usr/bin/env python
"""One-off: measure the int4-KV decode tier on the real chip — exactly the
code path bench.py's ``decode_tok_s_256k_paged_w4kv4`` /
``decode_tok_s_512k_paged_w4kv4`` run — so the numbers land in docs and the
compile cache is warm before the driver's bench run. Also smoke-checks the
kernels at 32k first (cheap compile) before committing to the giant pools.
Prints a JSON line after each datapoint (bench.py's convention); consumers
keep the last, complete one.

The int4 pool is the native ``jnp.int4`` dtype: the TPU packs 8 nibbles per
32-bit word (layout T(64,128)(8,1)), so the page DMA — the long-context
decode bottleneck — really is half the int8 bytes, and the kernel's
``astype(f32)`` dequant is a single hardware convert (no shift/mask VPU
sequence, which would have cost more than the DMA saved).
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
    q4 = {"llm": jax.jit(functools.partial(quantize_llm_params, bits=4))(
        params["llm"])}
    del params  # w4-only residency: the 512k pool needs every byte

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

    dp("decode_tok_s_32k_paged_w4kv4",
       lambda: bench._decode_bench(jax, jnp, cfg, q4, 32768, paged=True,
                                   kv_dtype="int4"))
    dp("decode_tok_s_256k_paged_w4kv4",
       lambda: bench._decode_bench(jax, jnp, cfg, q4, 262144, paged=True,
                                   kv_dtype="int4"))
    dp("decode_tok_s_512k_paged_w4kv4",
       lambda: bench._decode_bench(jax, jnp, cfg, q4, 524288, paged=True,
                                   kv_dtype="int4"))


if __name__ == "__main__":
    main()
