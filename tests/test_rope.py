"""RoPE conventions: interleaved parity with reference fp64 table math, and
split-layout equivalence under the load-time weight permutation."""

import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.ops import rope as R
from opensora_tpu.ops.attention import xla_attention


def reference_rope_interleaved(pos, dim, theta):
    """fp64 2x2 rotation tables, mirrors reference math.py:50-57."""
    scale = np.arange(0, dim, 2, dtype=np.float64) / dim
    omega = 1.0 / (theta**scale)
    out = np.einsum("...n,d->...nd", np.asarray(pos, np.float64), omega)
    return np.cos(out), np.sin(out)  # angle per pair


def apply_reference(x, cos, sin):
    """out pair = (c*x0 - s*x1, s*x0 + c*x1), matching math.py:59-65."""
    shape = x.shape
    x_ = np.asarray(x, np.float64).reshape(*shape[:-1], -1, 2)
    x0, x1 = x_[..., 0], x_[..., 1]
    c, s = cos[..., None, :], sin[..., None, :]  # broadcast over heads
    out = np.stack([c * x0 - s * x1, s * x0 + c * x1], axis=-1).reshape(shape)
    return out


def test_interleaved_matches_fp64_reference():
    B, L, H, D = 2, 16, 3, 32
    pos = np.random.default_rng(0).uniform(0, 50, (B, L))
    x = np.random.default_rng(1).normal(size=(B, L, H, D)).astype(np.float32)

    cos_np, sin_np = reference_rope_interleaved(pos, D, 10_000)
    ref = apply_reference(x, cos_np, sin_np)

    cos, sin = R.rope_frequencies(jnp.asarray(pos, jnp.float32), D, 10_000)
    out = R.apply_rope_interleaved(jnp.asarray(x), cos, sin)
    assert np.abs(np.asarray(out, np.float64) - ref).max() < 1e-4


def test_split_equals_interleaved_after_permutation():
    """attention(q,k rotated split) == attention(q,k rotated interleaved)
    when q/k channels are permuted by the load-time mapping."""
    B, L, H, D = 1, 32, 2, 64
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, L, H, D)).astype(np.float32)
    v = rng.normal(size=(B, L, H, D)).astype(np.float32)
    pos = rng.uniform(0, 50, (B, L)).astype(np.float32)

    cos, sin = R.rope_frequencies(jnp.asarray(pos), D, 10_000)

    # interleaved on original channels
    qi = R.apply_rope_interleaved(jnp.asarray(q), cos, sin)
    ki = R.apply_rope_interleaved(jnp.asarray(k), cos, sin)
    out_i = xla_attention(
        qi.transpose(0, 2, 1, 3), ki.transpose(0, 2, 1, 3),
        jnp.asarray(v).transpose(0, 2, 1, 3),
    )

    # split on permuted channels; v unpermuted (attention weights are
    # invariant to the shared q/k basis change)
    perm = R.interleaved_to_split_permutation(D)
    qs = R.apply_rope_split(jnp.asarray(q[..., perm]), cos, sin)
    ks = R.apply_rope_split(jnp.asarray(k[..., perm]), cos, sin)
    out_s = xla_attention(
        qs.transpose(0, 2, 1, 3), ks.transpose(0, 2, 1, 3),
        jnp.asarray(v).transpose(0, 2, 1, 3),
    )
    assert jnp.abs(out_i - out_s).max() < 1e-4


def test_permute_qk_weight_roundtrip():
    H, D, IN = 3, 8, 16
    w = np.random.default_rng(0).normal(size=(IN, H * D)).astype(np.float32)
    x = np.random.default_rng(1).normal(size=(5, IN)).astype(np.float32)
    wp = R.permute_qk_weight(w, H, D, out_axis=-1)
    y = (x @ w).reshape(5, H, D)
    yp = (x @ wp).reshape(5, H, D)
    perm = R.interleaved_to_split_permutation(D)
    assert np.allclose(y[..., perm], yp, atol=1e-6)
