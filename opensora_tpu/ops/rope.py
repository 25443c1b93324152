"""Multi-axis rotary position embeddings (RoPE) for MMDiT.

Behavioral reference: opensora/models/mmdit/math.py:39-65 (``rope``,
``liger_rope``, ``apply_rope``) and layers.py:31-66 (``EmbedND`` /
``LigerEmbedND``).

Two rotation conventions exist:

- **interleaved** (Flux original): channel pairs (2i, 2i+1) rotate together.
  Matches the published checkpoints' weight layout bit-for-bit.
- **split** (rotate-half, the liger/NeoX layout): pairs (i, i + D/2) rotate
  together. On TPU this is the fast layout — the two halves are contiguous
  64-lane chunks, so the rotation is two contiguous slices instead of a
  stride-2 lane shuffle.

The conventions are related by a fixed permutation of the head dimension
(reference math.py:68-117 ``rearrange_tensor``): permuting the rows of the
q/k projections (and inverse-permuting nothing on output, since attention is
invariant to a unitary basis change applied to both q and k) converts an
interleaved-trained checkpoint into the split layout. ``permute_qk_weight``
implements that load-time conversion.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def rope_frequencies(pos: jnp.ndarray, dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for one axis. pos: (..., L) float → (..., L, dim//2)."""
    assert dim % 2 == 0
    scale = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    omega = 1.0 / (theta**scale)
    out = pos.astype(jnp.float32)[..., None] * omega
    return jnp.cos(out), jnp.sin(out)


def embed_nd(
    ids: jnp.ndarray, axes_dim: Sequence[int], theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Multi-axis RoPE tables (EmbedND, reference layers.py:31-46).

    ids: (B, L, n_axes) positions (t, h, w for video tokens; zeros for text).
    Returns (cos, sin) each of shape (B, L, sum(axes_dim)//2).
    """
    n_axes = ids.shape[-1]
    assert n_axes == len(axes_dim)
    cos_list, sin_list = [], []
    for i in range(n_axes):
        c, s = rope_frequencies(ids[..., i], axes_dim[i], theta)
        cos_list.append(c)
        sin_list.append(s)
    return jnp.concatenate(cos_list, axis=-1), jnp.concatenate(sin_list, axis=-1)


def apply_rope_split(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate-half RoPE (split convention). x: (B, L, H, D); cos/sin (B, L, D/2).

    out[i]      = x[i]   * cos - x[i+D/2] * sin
    out[i+D/2]  = x[i+D/2] * cos + x[i]   * sin
    """
    half = x.shape[-1] // 2
    c = cos[..., None, :].astype(jnp.float32)
    s = sin[..., None, :].astype(jnp.float32)
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Interleaved RoPE, numerically matching reference apply_rope
    (math.py:59-65): pairs (2i, 2i+1) rotate by angle i."""
    shape = x.shape
    x_ = x.astype(jnp.float32).reshape(*shape[:-1], -1, 2)
    x0, x1 = x_[..., 0], x_[..., 1]
    # cos/sin: (B, L, D/2) → broadcast over heads at axis -2 of (B, L, H, D/2)
    c = cos[..., None, :].astype(jnp.float32)
    s = sin[..., None, :].astype(jnp.float32)
    out0 = x0 * c - x1 * s
    out1 = x0 * s + x1 * c
    out = jnp.stack([out0, out1], axis=-1).reshape(shape)
    return out.astype(x.dtype)


def interleaved_to_split_permutation(dim: int) -> np.ndarray:
    """Index map taking interleaved channel order to split order.

    perm[d] = source channel in interleaved layout for target channel d in
    split layout: d < D/2 → 2d, else 2(d - D/2) + 1. This is the reference's
    ``rearrange_tensor`` mapping (math.py:68-96).
    """
    half = dim // 2
    perm = np.empty(dim, dtype=np.int64)
    perm[:half] = np.arange(0, dim, 2)
    perm[half:] = np.arange(1, dim, 2)
    return perm


def permute_qk_weight(
    w: np.ndarray, num_heads: int, head_dim: int, out_axis: int = -1,
    inverse: bool = False,
) -> np.ndarray:
    """Permute a q/k projection weight from interleaved to split RoPE layout
    (or back, with ``inverse=True`` — used by the torch-layout exporter).

    ``w`` has the projection's output features on ``out_axis`` laid out as
    (num_heads, head_dim). Works for weights (in, H*D) and biases (H*D,).
    """
    perm = interleaved_to_split_permutation(head_dim)
    if inverse:
        perm = np.argsort(perm)
    w = np.moveaxis(np.asarray(w), out_axis, -1)
    shape = w.shape
    w = w.reshape(*shape[:-1], num_heads, head_dim)
    w = w[..., perm]
    w = w.reshape(shape)
    return np.moveaxis(w, -1, out_axis)
