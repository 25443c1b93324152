"""Normalization primitives.

RMSNorm matches reference opensora/models/mmdit/layers.py:105-123 (fp32
statistics, eps=1e-6, scale applied after the cast back). On TPU these are
bandwidth-bound elementwise ops that XLA fuses into neighbouring matmuls, so
plain-JAX implementations are the performant choice (the reference needed
liger/apex Triton+CUDA kernels because torch eager wouldn't fuse them).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x_dtype = x.dtype
    xf = x.astype(jnp.float32)
    rrms = lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return ((xf * rrms).astype(x_dtype) * scale.astype(x_dtype)).astype(x_dtype)


def layer_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm without affine params (elementwise_affine=False)."""
    x_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x_dtype)


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over channels-last input (..., C), fp32 statistics."""
    x_dtype = x.dtype
    c = x.shape[-1]
    assert c % num_groups == 0
    xf = x.astype(jnp.float32)
    shape = xf.shape
    # stats are over (all spatial dims, channels within group)
    xg = xf.reshape(-1, *shape[1:-1], num_groups, c // num_groups)
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    xf = xg.reshape(shape)
    return (xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x_dtype)
