"""Teacher-forced long eval path: zigzag round trip + prediction extraction
consistency with a plain forward."""

import jax
import jax.numpy as jnp
import numpy as np

from v2pe_tpu.core.config import debug_tiny
from v2pe_tpu.evalkit.mm_niah_long import (build_teacher_forced_inputs,
                                           extract_answer_prediction,
                                           teacher_forced_eval)
from v2pe_tpu.models import internvl_chat
from v2pe_tpu.models.params import init_vlm_params
import pytest


@pytest.mark.slow  # heavy long-seq compile; the ring-longctx dryrun check runs the teacher-forced long path against dense every round
def test_teacher_forced_matches_plain_forward():
    cfg = debug_tiny(vocab_size=300)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    S = 300
    ids = rng.randint(5, 280, size=S).astype(np.int64)
    answer_span = (S - 10, S)
    pos = np.arange(S, dtype=np.float32)
    pixels = np.zeros((1, 3, 448, 448), np.float32)
    flags = np.zeros((1,), np.int32)

    # ground truth: plain forward argmax at the answer slots
    out = internvl_chat.forward(
        params, cfg,
        input_ids=jnp.asarray(ids[None]),
        pixel_values=jnp.asarray(pixels),
        image_flags=jnp.asarray(flags),
        rope_pos_ids=jnp.asarray(pos[None]),
        img_context_token_id=999,
        attn_impl="jnp")
    ref = np.asarray(out.logits[0, answer_span[0] - 1:answer_span[1] - 1]
                     ).argmax(-1)

    for seq_shards in (1, 4):
        inputs = build_teacher_forced_inputs(
            ids, answer_span, pos, seq_shards=seq_shards, pad_multiple=64)
        pred = teacher_forced_eval(params, cfg, inputs, pixels, flags, 999,
                                   attn_impl="jnp")
        np.testing.assert_array_equal(pred, ref), seq_shards
