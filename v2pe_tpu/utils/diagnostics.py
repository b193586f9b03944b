"""Runtime diagnostics.

The reference's NaN tripwires after attention kernels
(patch/internlm2_packed_training_patch.py:68-71, modeling_internlm2.py:
1211-1213) become jit-compatible guards here: `nan_guard` uses
jax.debug.callback to report non-finite tensors without breaking tracing;
`assert_finite` is the hard-fail host-side variant for tests/eval."""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def nan_guard(x: jnp.ndarray, name: str = "tensor") -> jnp.ndarray:
    """Pass-through that logs if x contains non-finite values (works under
    jit via debug callback; negligible cost — one reduction)."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x.astype(jnp.float32))))

    def report(bad_val):
        if bool(bad_val):
            logger.error("NaN/Inf detected in %s", name)

    jax.debug.callback(report, bad)
    return x


def assert_finite(tree, name: str = "pytree"):
    """Host-side hard check (brings data to host — test/eval use only)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        import numpy as np

        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            raise FloatingPointError(f"non-finite values in {name}:{p}")
