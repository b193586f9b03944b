"""Bicubic pos-embed interpolation parity vs torch F.interpolate
(align_corners=False, A=-0.75), used by InternViT for non-448 inputs
(modeling_intern_vit.py:87-93) and resize_pos_embeddings (:309-319)."""

import numpy as np
import jax.numpy as jnp

from v2pe_tpu.models.intern_vit import interpolate_pos_embed

from . import reference_util


def test_bicubic_matches_torch():
    reference_util.install_reference()
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    src, dst, D = 16, 32, 24
    pe = torch.randn(1, src * src, D)
    ref = F.interpolate(
        pe.reshape(1, src, src, D).permute(0, 3, 1, 2).float(),
        size=(dst, dst), mode="bicubic", align_corners=False,
    ).reshape(1, D, -1).permute(0, 2, 1).numpy()

    got = interpolate_pos_embed(jnp.asarray(pe.numpy()), src, dst, dst)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_bicubic_downscale_matches_torch():
    reference_util.install_reference()
    import torch
    import torch.nn.functional as F

    torch.manual_seed(1)
    src, dst, D = 32, 16, 8
    pe = torch.randn(1, src * src, D)
    ref = F.interpolate(
        pe.reshape(1, src, src, D).permute(0, 3, 1, 2).float(),
        size=(dst, dst), mode="bicubic", align_corners=False,
    ).reshape(1, D, -1).permute(0, 2, 1).numpy()

    got = interpolate_pos_embed(jnp.asarray(pe.numpy()), src, dst, dst)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)
