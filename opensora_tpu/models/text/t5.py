"""T5 v1.1 encoder (flax.linen) — the MMDiT context conditioner.

The reference wraps HF's torch T5-v1.1-XXL (opensora/models/text/
conditioner.py:9-74) plus a shardformer policy for JIT-fused dropout-add
(opensora/acceleration/shardformer/policy/t5_encoder.py). Here the encoder is
implemented natively in JAX — XLA fuses the residual adds without a policy —
and HF checkpoints port via opensora_tpu/utils/ckpt.py.

Architecture (T5 v1.1): pre-RMSNorm blocks, relative-position-bucket bias
shared from the first layer, unscaled attention (no 1/sqrt(d)), gated-GELU
feed-forward, biasless linears, final RMSNorm.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.ops.norms import rms_norm
from opensora_tpu.utils.misc import to_jax_dtype


@dataclass
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: str = "bf16"
    param_dtype: str = "fp32"


def t5_xxl_config() -> T5Config:
    return T5Config()


def t5_small_test_config() -> T5Config:
    return T5Config(vocab_size=128, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4)


def relative_position_bucket(
    relative_position: jnp.ndarray, num_buckets: int = 32, max_distance: int = 128
) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (self.dim,), self.param_dtype)
        # T5 layer norm = RMSNorm without mean subtraction
        return rms_norm(x, scale, self.eps)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask=None, position_bias=None):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        inner = cfg.num_heads * cfg.d_kv
        dense = dict(use_bias=False, dtype=dtype, param_dtype=pdtype)

        b, l, _ = x.shape
        q = nn.Dense(inner, **dense, name="q")(x).reshape(b, l, cfg.num_heads, cfg.d_kv)
        k = nn.Dense(inner, **dense, name="k")(x).reshape(b, l, cfg.num_heads, cfg.d_kv)
        v = nn.Dense(inner, **dense, name="v")(x).reshape(b, l, cfg.num_heads, cfg.d_kv)

        if self.has_relative_bias:
            bias_table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, cfg.num_heads),
                pdtype,
            )
            ctx = jnp.arange(l)[:, None]
            mem = jnp.arange(l)[None, :]
            buckets = relative_position_bucket(
                mem - ctx,
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )
            position_bias = bias_table[buckets].transpose(2, 0, 1)[None]  # (1,H,L,L)

        # T5: no 1/sqrt(d) scaling
        scores = jnp.einsum(
            "blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        if position_bias is not None:
            scores = scores + position_bias.astype(jnp.float32)
        if mask is not None:
            scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, inner)
        out = nn.Dense(cfg.d_model, **dense, name="o")(out)
        return out, position_bias


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False

    @nn.compact
    def __call__(self, x, mask=None, position_bias=None):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        dense = dict(use_bias=False, dtype=dtype, param_dtype=pdtype)

        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, pdtype, name="ln_attn")(x)
        attn_out, position_bias = T5Attention(
            cfg, self.has_relative_bias, name="attention"
        )(h, mask, position_bias)
        x = x + attn_out

        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, pdtype, name="ln_ff")(x)
        wi_0 = nn.Dense(cfg.d_ff, **dense, name="wi_0")(h)
        wi_1 = nn.Dense(cfg.d_ff, **dense, name="wi_1")(h)
        h = nn.gelu(wi_0, approximate=True) * wi_1
        x = x + nn.Dense(cfg.d_model, **dense, name="wo")(h)
        return x, position_bias


class T5Encoder(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)

        emb = nn.Embed(
            cfg.vocab_size, cfg.d_model, dtype=dtype, param_dtype=pdtype, name="shared"
        )
        x = emb(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(
                cfg, has_relative_bias=(i == 0), name=f"block_{i}"
            )(x, attention_mask, position_bias)
        x = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, pdtype, name="final_layer_norm")(x)
        return x
