"""Int8 flash attention quality bounds vs the f32 reference.

Serving-promotion evidence for ops/int8_flash.py. Error decomposition at
flat-random N(0,1) inputs (the WORST case — outputs nearly cancel, so
relative error is maximal; trained-model attention is peakier and errors
shrink): QK int8 ~0.9%, V int8 ~0.7%, P int8 ~1.7% — P quantization
dominates, which is why the "qk8" mode (bf16 P.V) exists. Bounds here are
calibrated at ~1.4x the measured interpret-mode error. Interpret mode
exercises the exact kernel program.

Round-3 re-measurement after switching K to PER-TILE scales + exp2-domain
bookkeeping (see ops/int8_flash.py docstring): full 1.89%, qk8 1.12% at
the flat-random worst case (within ~0.1pp of the per-token-K numbers), so
the original bounds hold unchanged — mean-centered K rows have nearly
equal norms and the tile max barely exceeds the per-token max.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensora_tpu.ops.attention import xla_attention
from opensora_tpu.ops.int8_flash import int8_flash_attention

FULL_TOL = 0.026   # both matmuls int8, measured ~1.8% worst-case
QK8_TOL = 0.016    # int8 QK^T only, measured ~1.1% worst-case


def _rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def _errs(q, k, v, **kw):
    ref = xla_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    full = int8_flash_attention(q, k, v, interpret=True, **kw)
    qk8 = int8_flash_attention(q, k, v, interpret=True, pv_int8=False, **kw)
    assert np.isfinite(np.asarray(full)).all()
    assert np.isfinite(np.asarray(qk8)).all()
    return _rel_l2(full, ref), _rel_l2(qk8, ref)


def test_random_inputs():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    B, H, L, D = 2, 3, 256, 128
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.float32) for kk in ks)
    e_full, e_qk8 = _errs(q, k, v, block_q=128, block_k=128)
    assert e_full < FULL_TOL, e_full
    assert e_qk8 < QK8_TOL, e_qk8
    assert e_qk8 < e_full  # dropping P-quant must help


def test_tail_lengths():
    """Non-multiple-of-block lengths: tail masking + int8 garbage safety."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    B, H, L, D = 1, 2, 300, 128   # 300 = 2*128 + 44 tail
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.float32) for kk in ks)
    e_full, e_qk8 = _errs(q, k, v, block_q=128, block_k=128)
    assert e_full < FULL_TOL, e_full
    assert e_qk8 < QK8_TOL, e_qk8


def test_outlier_key_channel():
    """K smoothing must absorb a large common-mode key channel: without the
    mean subtraction a +30 offset on one channel eats the whole int8 grid."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    B, H, L, D = 1, 2, 256, 128
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.float32) for kk in ks)
    k = k.at[..., 7].add(30.0)
    e_full, e_qk8 = _errs(q, k, v, block_q=128, block_k=128)
    assert e_full < FULL_TOL, e_full
    assert e_qk8 < QK8_TOL, e_qk8


def test_peaked_softmax():
    """A dominant key (near one-hot softmax rows) — the regime where crude
    per-tile P quantization would zero every other block's contribution."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    B, H, L, D = 1, 1, 384, 128
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.float32) for kk in ks)
    k = k.at[:, :, 5, :].set(q.mean(axis=2) * 8.0)
    e_full, e_qk8 = _errs(q, k, v, block_q=128, block_k=128)
    assert e_full < FULL_TOL, e_full
    assert e_qk8 < QK8_TOL, e_qk8


def test_bf16_inputs_and_dtype():
    """bf16 in/out (the serving dtype)."""
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    B, H, L, D = 1, 2, 256, 128
    qf, kf, vf = (jax.random.normal(kk, (B, H, L, D), jnp.float32) for kk in ks)
    q, k, v = (x.astype(jnp.bfloat16) for x in (qf, kf, vf))
    out = int8_flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    ref = xla_attention(qf, kf, vf)
    assert out.dtype == jnp.bfloat16
    assert _rel_l2(out.astype(jnp.float32), ref) < FULL_TOL


def test_anchored_fallback_large_magnitude():
    """N(0,1) inputs take the fixed-anchor kernel (Cauchy-Schwarz bound
    ~16 log2 units < ANCHOR_MAX_LOG2); scaling q and k by 4 pushes the
    bound to ~260, so the lax.cond must fall back to the running-max
    kernel — both paths within their bounds, and the tail-masking logic
    of BOTH kernels is exercised at a non-multiple-of-block length."""
    from opensora_tpu.ops.flash_attention import ANCHOR_MAX_LOG2, LOG2E

    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    B, H, L, D = 1, 2, 300, 128
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.float32) for kk in ks)

    km = k - k.mean(axis=2, keepdims=True)
    bound = (
        (1.0 / np.sqrt(D)) * LOG2E
        * jnp.max(jnp.linalg.norm(q, axis=-1))
        * jnp.max(jnp.linalg.norm(km, axis=-1))
    )
    assert float(bound) < ANCHOR_MAX_LOG2          # anchored path
    assert float(bound) * 16.0 > ANCHOR_MAX_LOG2   # scaled -> fallback

    e_full, e_qk8 = _errs(q * 4.0, k * 4.0, v, block_q=128, block_k=128)
    # 16x-scaled logits are a fundamentally harder regime for ANY int8-QK
    # scheme (old and new kernel alike): softmax is exponentially
    # sensitive to ABSOLUTE logit error, which scales with the logits.
    # Measured 5.0% both modes (P-quant is negligible next to it, so
    # qk8 ~ full here); bound at the file's 1.4x calibration. Real
    # QK-RMSNormed streams never reach this regime — it exists to pin the
    # fallback dispatch, not to claim serving quality at huge logits.
    assert e_full < 0.07, e_full
    assert e_qk8 < 0.07, e_qk8


def test_attention_dispatch_int8_backends():
    """The model-facing attention() entry point routes the int8 backends
    (config surface: MMDiTConfig.attn_backend='int8_qk8',
    configs/diffusion/inference/256px_int8attn.py)."""
    from opensora_tpu.ops.attention import attention

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    B, L, H, D = 1, 256, 2, 128
    q, k, v = (jax.random.normal(kk, (B, L, H, D), jnp.float32) for kk in ks)
    ref = attention(q, k, v, backend="xla")
    for backend in ("int8", "int8_qk8"):
        out = attention(q, k, v, backend=backend)
        assert out.shape == (B, L, H * D)
        tol = FULL_TOL if backend == "int8" else QK8_TOL
        assert _rel_l2(out, ref) < tol
