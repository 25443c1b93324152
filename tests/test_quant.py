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
