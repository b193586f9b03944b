"""KV-cache decode consistency: prefill + token-by-token decode must match
the full teacher-forced forward, including the V2PE decode-time position
advance (integer stride from the fractional prompt maximum,
modeling_internlm2.py:2000-2002)."""

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import debug_tiny
from v2pe_tpu.models.internlm2 import KVCache, llm_forward
from v2pe_tpu.models.params import init_llm_params


def test_prefill_decode_matches_full_forward():
    cfg = debug_tiny(vocab_size=300).llm
    params = init_llm_params(jax.random.PRNGKey(0), cfg)
    S_prompt, S_total, max_len = 13, 19, 32
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, S_total), 0, 300)

    # V2PE-ish positions: fractional in the middle, integers after
    pos = np.concatenate([
        np.arange(5, dtype=np.float32),
        4.0 + 0.25 * np.arange(1, 5),  # 4.25 .. 5.0
        5.0 + np.arange(1, S_total - 9 + 1, dtype=np.float32),
    ])[None]
    assert pos.shape[1] == S_total
    pos = jnp.asarray(pos)

    full_logits, _ = llm_forward(params, cfg, input_ids=ids,
                                 rope_pos_ids=pos, attn_impl="jnp")

    cache = KVCache.zeros(cfg, 1, max_len, dtype=jnp.float32)
    prefill_logits, cache = llm_forward(
        params, cfg, input_ids=ids[:, :S_prompt],
        rope_pos_ids=pos[:, :S_prompt], kv_cache=cache, attn_impl="jnp")
    np.testing.assert_allclose(np.asarray(prefill_logits),
                               np.asarray(full_logits[:, :S_prompt]),
                               rtol=1e-5, atol=1e-5)

    for t in range(S_prompt, S_total):
        step_logits, cache = llm_forward(
            params, cfg, input_ids=ids[:, t:t + 1],
            rope_pos_ids=pos[:, t:t + 1], kv_cache=cache, attn_impl="jnp")
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, t]),
            rtol=1e-5, atol=1e-5,
            err_msg=f"decode step {t}")
