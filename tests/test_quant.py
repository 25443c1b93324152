"""Int8 weight-only quantization: kernel roundtrip + full-model parity."""

import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
from opensora_tpu.ops.quant import quantize_kernel, quantize_params


def test_quantize_kernel_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(32, 16)).astype(np.float32)
    q, s = quantize_kernel(w)
    assert q.dtype == np.int8 and s.shape == (16,)
    w_hat = q.astype(np.float32) * s
    # absmax int8: error bounded by scale/2 per element
    assert np.abs(w_hat - w).max() <= (s.max() / 2) + 1e-6


def test_quantized_model_close_to_fp():
    kw = dict(
        in_channels=8, vec_in_dim=8, context_in_dim=16, hidden_size=64,
        mlp_ratio=2.0, num_heads=2, depth=2, depth_single_blocks=2,
        axes_dim=[16, 8, 8], qkv_bias=True, guidance_embed=False,
        cond_embed=False, attn_backend="xla", dtype="fp32",
    )
    fp = MMDiTModel(MMDiTConfig(**kw))
    qm = MMDiTModel(MMDiTConfig(**kw, quantized=True))
    B, L, Lt = 1, 8, 4
    args = (
        jnp.ones((B, L, 8)) * 0.3, jnp.zeros((B, L, 3)),
        jnp.ones((B, Lt, 16)) * 0.2, jnp.zeros((B, Lt, 3)),
        jnp.full((B,), 0.5), jnp.ones((B, 8)) * 0.1,
    )
    params = fp.init(jax.random.PRNGKey(0), *args)["params"]
    out_fp = fp.apply({"params": params}, *args)
    qparams = quantize_params(params)
    out_q = qm.apply({"params": qparams}, *args)
    err = float(jnp.abs(out_q - out_fp).max())
    assert err < 0.05 * max(float(jnp.abs(out_fp).max()), 1.0)
    # non-block params untouched
    assert "kernel" in qparams["img_in"]
    assert "kernel_q" in qparams["double_blocks"]["img_attn"]["qkv"]


def test_w8a8_dense_close_to_fp():
    """Dynamic per-token activation quant + int8 matmul: bounded rel error."""
    from opensora_tpu.ops.quant import QuantDense, quantize_kernel

    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 32)).astype(np.float32) * 0.2
    x = jnp.asarray(rng.normal(size=(4, 10, 64)).astype(np.float32))
    q, s = quantize_kernel(w)
    params = {"params": {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(s)}}

    ref = x @ w
    y8 = QuantDense(32, use_bias=False, dtype=jnp.float32, mode="w8a8").apply(params, x)
    rel = float(jnp.abs(y8 - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, rel
    # weight-only mode on the same params stays closer (no act error)
    yw = QuantDense(32, use_bias=False, dtype=jnp.float32, mode="w8").apply(params, x)
    relw = float(jnp.abs(yw - ref).max() / jnp.abs(ref).max())
    assert relw <= rel + 1e-6


def test_w8a8_model_mode_plumbs():
    kw = dict(
        in_channels=8, vec_in_dim=8, context_in_dim=16, hidden_size=64,
        mlp_ratio=2.0, num_heads=2, depth=2, depth_single_blocks=2,
        axes_dim=[16, 8, 8], qkv_bias=True, guidance_embed=False,
        cond_embed=False, attn_backend="xla", dtype="fp32",
    )
    fp = MMDiTModel(MMDiTConfig(**kw))
    qm = MMDiTModel(MMDiTConfig(**kw, quantized="w8a8"))
    B, L, Lt = 1, 8, 4
    args = (
        jnp.ones((B, L, 8)) * 0.3, jnp.zeros((B, L, 3)),
        jnp.ones((B, Lt, 16)) * 0.2, jnp.zeros((B, Lt, 3)),
        jnp.full((B,), 0.5), jnp.ones((B, 8)) * 0.1,
    )
    params = fp.init(jax.random.PRNGKey(0), *args)["params"]
    out_fp = fp.apply({"params": params}, *args)
    out_q = qm.apply({"params": quantize_params(params)}, *args)
    err = float(jnp.abs(out_q - out_fp).max())
    assert err < 0.08 * max(float(jnp.abs(out_fp).max()), 1.0)


def test_w8a8_pallas_kernel_matches_xla():
    """Fused int8 matmul kernel (interpret mode) == XLA int8 dot + rescale,
    including a non-block-aligned M tail."""
    from opensora_tpu.ops.int8_matmul import w8a8_matmul

    rng = np.random.default_rng(2)
    M, K, N = 300, 1024, 512
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    sa = jnp.asarray(rng.random((M, 1)) * 0.01 + 0.001, jnp.float32)
    sw = jnp.asarray(rng.random((N,)) * 0.01 + 0.001, jnp.float32)
    out = w8a8_matmul(
        x8, w8, sa, sw, block_m=256, block_n=256, block_k=512, interpret=True
    ).astype(jnp.float32)
    ref = (x8.astype(jnp.int32) @ w8.astype(jnp.int32)).astype(jnp.float32) * sa * sw
    rel = float(jnp.abs(out - ref).max() / jnp.abs(ref).max())
    assert rel < 5e-3 and not bool(jnp.isnan(out).any())


def test_w8a8_pallas_dense_mode():
    from opensora_tpu.ops.quant import QuantDense, quantize_kernel

    rng = np.random.default_rng(3)
    w = rng.normal(size=(512, 128)).astype(np.float32) * 0.2
    x = jnp.asarray(rng.normal(size=(2, 7, 512)).astype(np.float32))
    q, s = quantize_kernel(w)
    params = {"params": {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(s)}}
    ref = x @ w
    y = QuantDense(128, use_bias=False, dtype=jnp.float32, mode="w8a8_pallas").apply(params, x)
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    assert rel < 0.03, rel
