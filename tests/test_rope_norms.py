"""Golden tests: V2PE rotary (cos/sin from float32 pos ids + fp32 apply) and
RMSNorm against the reference torch modules on CPU."""

import numpy as np
import jax.numpy as jnp

from v2pe_tpu.ops.rope import compute_rope_cos_sin, apply_rotary
from v2pe_tpu.ops.norms import rms_norm

from . import reference_util


def test_v2pe_rotary_matches_reference():
    reference_util.install_reference()
    import torch
    from internvl.model.internlm2.modeling_internlm2 import (
        V2PE, apply_rotary_pos_emb)

    torch.manual_seed(0)
    B, S, H, D = 1, 37, 4, 64
    # fractional V2PE positions: text stride 1, then 0.25 increments
    pos = np.concatenate([
        np.arange(10, dtype=np.float32),
        9.0 + 0.25 * np.arange(1, 21, dtype=np.float32),
        np.arange(15, 15 + 7, dtype=np.float32),
    ])[None]  # (1, 37)
    assert pos.shape[1] == S

    q = torch.randn(B, H, S, D)
    k = torch.randn(B, H, S, D)

    rot = V2PE(D, base=1_000_000.0)
    cos_t, sin_t = rot(q, global_posid=torch.from_numpy(pos))
    # reference indexes per-token rows with arange (flash path :701-706)
    idx = torch.arange(S)[None]
    q_t, k_t = apply_rotary_pos_emb(q, k, cos_t, sin_t, idx)

    cos_j, sin_j = compute_rope_cos_sin(jnp.asarray(pos), D, 1_000_000.0)
    # our layout is (B, S, H, D)
    qj = jnp.asarray(q.numpy()).transpose(0, 2, 1, 3)
    kj = jnp.asarray(k.numpy()).transpose(0, 2, 1, 3)
    q_j = apply_rotary(qj, cos_j, sin_j).transpose(0, 2, 1, 3)
    k_j = apply_rotary(kj, cos_j, sin_j).transpose(0, 2, 1, 3)

    np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(k_j), k_t.numpy(), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cos_j)[0], cos_t.numpy(), rtol=1e-6, atol=1e-6)


def test_rms_norm_matches_reference():
    reference_util.install_reference()
    import torch
    from internvl.model.internlm2.modeling_internlm2 import InternLM2RMSNorm

    torch.manual_seed(1)
    x = torch.randn(2, 5, 64)
    mod = InternLM2RMSNorm(64, eps=1e-5)
    with torch.no_grad():
        mod.weight.uniform_(0.5, 1.5)
    ref = mod(x).detach().numpy()
    got = rms_norm(jnp.asarray(x.numpy()), jnp.asarray(mod.weight.detach().numpy()), 1e-5)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6, atol=1e-6)


def test_rms_norm_bf16_dtype_semantics():
    """fp32 variance then downcast-then-scale, like the reference."""
    reference_util.install_reference()
    import torch
    from internvl.model.internlm2.modeling_internlm2 import InternLM2RMSNorm

    torch.manual_seed(2)
    x = torch.randn(2, 3, 32).to(torch.bfloat16)
    mod = InternLM2RMSNorm(32, eps=1e-5)
    with torch.no_grad():
        mod.weight.uniform_(0.5, 1.5)
    mod = mod.to(torch.bfloat16)
    ref = mod(x).detach().float().numpy()
    got = rms_norm(
        jnp.asarray(x.float().numpy()).astype(jnp.bfloat16),
        jnp.asarray(mod.weight.detach().float().numpy()).astype(jnp.bfloat16),
        1e-5,
    )
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32), ref,
                               rtol=1e-2, atol=1e-2)
