"""Normalization layers. XLA fuses these natively (the reference needed apex
FusedRMSNorm, modeling_internlm2.py:205-216 — no kernel required on TPU)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """InternLM2RMSNorm (modeling_internlm2.py:188-202): fp32 variance and
    normalization, downcast to input dtype, then multiply by weight."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return weight * xf.astype(dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """Standard LayerNorm in fp32 compute."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * (var + eps) ** -0.5
    return (xf.astype(dtype) * weight + bias).astype(dtype)
