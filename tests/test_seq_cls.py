"""Sequence-classification head: pooling semantics, HF loss parity,
converter layout.

Mirrors the reference's ``InternLM2ForSequenceClassification``
(modeling_internlm2.py:2174-2278): last-non-pad-token pooling (including
the negative-index wrap when a row has no pad) and the three problem-type
losses, checked against torch.nn directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from v2pe_tpu.core.config import LLMConfig
from v2pe_tpu.models.sequence_classification import (
    convert_seq_cls_state_dict, init_seq_cls_params, pool_last_token,
    seq_cls_forward)

PAD = 2


def tiny_cfg():
    return LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=48,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2)


def _ids():
    # row 0: no pad anywhere; row 1: pads from position 5; row 2: pad at 0
    ids = np.full((3, 8), 7, np.int32)
    ids[1, 5:] = PAD
    ids[2, 0] = PAD
    return ids


def test_pooling_matches_torch_negative_indexing():
    ids = _ids()
    B, S = ids.shape
    x = np.random.RandomState(0).randn(B, S, 4).astype(np.float32)

    got = np.asarray(pool_last_token(jnp.asarray(x), jnp.asarray(ids), PAD))
    # the reference formula, negative indices included (torch wraps them)
    tids = torch.tensor(ids)
    seq_lengths = torch.eq(tids, PAD).int().argmax(-1) - 1
    want = torch.tensor(x)[torch.arange(B), seq_lengths].numpy()
    np.testing.assert_array_equal(got, want)

    # pad_token_id=None -> always the final position
    got_none = np.asarray(
        pool_last_token(jnp.asarray(x), jnp.asarray(ids), None))
    np.testing.assert_array_equal(got_none, x[:, -1])


@pytest.mark.parametrize("problem", ["regression",
                                     "single_label_classification",
                                     "multi_label_classification"])
def test_loss_matches_torch(problem):
    cfg = tiny_cfg()
    num_labels = 1 if problem == "regression" else 3
    params = init_seq_cls_params(jax.random.PRNGKey(0), cfg, num_labels)
    ids = jnp.asarray(_ids())
    rng = np.random.RandomState(1)
    if problem == "regression":
        labels = jnp.asarray(rng.randn(3).astype(np.float32))
    elif problem == "single_label_classification":
        labels = jnp.asarray(rng.randint(0, num_labels, size=3))
    else:
        labels = jnp.asarray(
            rng.randint(0, 2, size=(3, num_labels)).astype(np.float32))

    pooled, loss = seq_cls_forward(params, cfg, input_ids=ids, labels=labels,
                                   pad_token_id=PAD, attn_impl="jnp")
    assert loss is not None
    # problem type auto-resolution picks the same branch HF would
    pooled_t = torch.tensor(np.asarray(pooled))
    labels_t = torch.tensor(np.asarray(labels))
    if problem == "regression":
        want = torch.nn.MSELoss()(pooled_t.squeeze(), labels_t.squeeze())
    elif problem == "single_label_classification":
        want = torch.nn.CrossEntropyLoss()(
            pooled_t.view(-1, num_labels), labels_t.view(-1).long())
    else:
        want = torch.nn.BCEWithLogitsLoss()(pooled_t, labels_t)
    assert abs(float(loss) - float(want)) < 1e-5


def test_converter_layout_and_forward():
    cfg = tiny_cfg()
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    hd = H // cfg.num_attention_heads
    G = cfg.num_attention_heads // cfg.num_key_value_heads
    wqkv_rows = (G + 2) * cfg.num_key_value_heads * hd
    num_labels = 3
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {"model.tok_embeddings.weight": t(cfg.vocab_size, H),
          "model.norm.weight": t(H),
          "score.weight": t(num_labels, H)}
    for i in range(L):
        sd[f"model.layers.{i}.attention_norm.weight"] = t(H)
        sd[f"model.layers.{i}.ffn_norm.weight"] = t(H)
        sd[f"model.layers.{i}.attention.wqkv.weight"] = t(wqkv_rows, H)
        sd[f"model.layers.{i}.attention.wo.weight"] = t(H, H)
        sd[f"model.layers.{i}.feed_forward.w1.weight"] = t(I, H)
        sd[f"model.layers.{i}.feed_forward.w3.weight"] = t(I, H)
        sd[f"model.layers.{i}.feed_forward.w2.weight"] = t(H, I)

    params = convert_seq_cls_state_dict(sd, cfg)
    ref = init_seq_cls_params(jax.random.PRNGKey(0), cfg, num_labels)
    assert jax.tree.structure(params) == jax.tree.structure(ref)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(ref)[0]):
        assert a.shape == b.shape, (kp, a.shape, b.shape)
    np.testing.assert_allclose(np.asarray(params["score_kernel"]),
                               sd["score.weight"].numpy().T, rtol=1e-6)

    pooled, loss = seq_cls_forward(
        params, cfg, input_ids=jnp.asarray(_ids()), pad_token_id=PAD,
        attn_impl="jnp")
    assert pooled.shape == (3, num_labels)
    assert loss is None
    assert bool(jnp.all(jnp.isfinite(pooled)))
