"""LoRA: factor shapes, zero-delta init, gradient flow through merge."""

import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
from opensora_tpu.training.lora import (
    count_lora_params,
    init_lora_params,
    lora_loss_wrapper,
    merge_lora,
)


def _tiny_model():
    cfg = MMDiTConfig(
        in_channels=8, vec_in_dim=8, context_in_dim=16, hidden_size=32,
        mlp_ratio=2.0, num_heads=2, depth=2, depth_single_blocks=2,
        axes_dim=[8, 4, 4], qkv_bias=True, guidance_embed=False,
        cond_embed=False, attn_backend="xla", dtype="fp32",
    )
    model = MMDiTModel(cfg)
    B, L, Lt = 1, 8, 4
    args = (
        jnp.ones((B, L, 8)), jnp.zeros((B, L, 3)),
        jnp.ones((B, Lt, 16)), jnp.zeros((B, Lt, 3)),
        jnp.full((B,), 0.5), jnp.ones((B, 8)),
    )
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    return model, params, args


def test_lora_init_and_zero_delta():
    model, params, args = _tiny_model()
    lora = init_lora_params(params, jax.random.PRNGKey(1), rank=4)
    assert count_lora_params(lora) > 0
    # scanned blocks carry per-layer factors
    a = lora["double_blocks"]["img_attn"]["qkv"]["kernel"]["lora_a"]
    assert a.shape[0] == 2 and a.shape[-1] == 4
    # B=0 init → merge is identity
    merged = merge_lora(params, lora)
    out0 = model.apply({"params": params}, *args)
    out1 = model.apply({"params": merged}, *args)
    assert np.allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


def test_lora_gradients_flow():
    model, params, args = _tiny_model()
    lora = init_lora_params(params, jax.random.PRNGKey(1), rank=4)

    def loss(p, *a):
        return (model.apply({"params": p}, *a) ** 2).mean()

    wrapped = lora_loss_wrapper(loss, params)
    grads = jax.grad(wrapped)(lora, *args)
    gb = grads["double_blocks"]["img_attn"]["qkv"]["kernel"]["lora_b"]
    assert float(jnp.abs(gb).max()) > 0  # gradient reaches the factors
