"""CLIP-L text encoder (flax.linen) — the MMDiT pooled-vector conditioner.

The reference wraps HF's torch CLIPTextModel and takes ``pooler_output``
(opensora/models/text/conditioner.py:49-63). Architecture: learned positional
embeddings, pre-LN transformer with causal masking, quick-gelu MLP, final LN,
pooled output = hidden state at the EOT token.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from opensora_tpu.utils.misc import to_jax_dtype


@dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    dtype: str = "bf16"
    param_dtype: str = "fp32"


def clip_l_config() -> CLIPTextConfig:
    return CLIPTextConfig()


def clip_small_test_config() -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, max_position_embeddings=16, eos_token_id=127,
    )


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        dense = dict(dtype=dtype, param_dtype=pdtype)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, param_dtype=pdtype, name="layer_norm1")(x)
        b, l, c = h.shape
        hd = cfg.hidden_size // cfg.num_heads
        q = nn.Dense(cfg.hidden_size, **dense, name="q_proj")(h).reshape(b, l, cfg.num_heads, hd)
        k = nn.Dense(cfg.hidden_size, **dense, name="k_proj")(h).reshape(b, l, cfg.num_heads, hd)
        v = nn.Dense(cfg.hidden_size, **dense, name="v_proj")(h).reshape(b, l, cfg.num_heads, hd)
        scores = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32))
        scores = scores / jnp.sqrt(jnp.float32(hd))
        scores = jnp.where(causal_mask, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        attn = jnp.einsum("bhlm,bmhd->blhd", probs, v).reshape(b, l, c)
        attn = nn.Dense(cfg.hidden_size, **dense, name="out_proj")(attn)
        x = x + attn
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, param_dtype=pdtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, **dense, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, **dense, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        b, l = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dtype, param_dtype=pdtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size), pdtype,
        )
        x = x + pos[None, :l].astype(dtype)
        causal = jnp.tril(jnp.ones((l, l), bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype, param_dtype=pdtype, name="final_layer_norm")(x)
        # pooled = hidden at the EOT token (highest token id == eos)
        eot_idx = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(b), eot_idx]
        return x, pooled


# ----------------------------------------------------------------------
# CLIP ViT vision tower (for VBench-style clip_score evaluation)
# ----------------------------------------------------------------------


@dataclass
class CLIPVisionConfig:
    """CLIP ViT-L/14 defaults (openai/clip-vit-large-patch14 vision side).

    Field names intentionally match CLIPTextConfig's transformer fields so
    CLIPEncoderLayer is shared between the towers (same block structure in
    HF's modeling_clip.py)."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5
    dtype: str = "fp32"
    param_dtype: str = "fp32"


def clip_vision_l_config() -> CLIPVisionConfig:
    return CLIPVisionConfig()


def clip_vision_small_test_config() -> CLIPVisionConfig:
    return CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        image_size=28, patch_size=14, projection_dim=16,
    )


class CLIPVisionModel(nn.Module):
    """ViT image encoder: patch conv + [CLS], pre-LN transformer, pooled
    output = post-LN class token (HF CLIPVisionTransformer semantics —
    last_hidden_state is returned WITHOUT the post layer norm)."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        b = pixel_values.shape[0]
        # (B, 3, H, W) → patches (B, N, hidden); HF conv has no bias
        x = jnp.transpose(pixel_values, (0, 2, 3, 1)).astype(dtype)
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=dtype, param_dtype=pdtype, name="patch_embedding",
        )(x)
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (cfg.hidden_size,), pdtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dtype), (b, 1, cfg.hidden_size)), x],
            axis=1,
        )
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_pos, cfg.hidden_size), pdtype,
        )
        x = x + pos[None, : x.shape[1]].astype(dtype)
        # HF's attribute is literally spelled "pre_layrnorm"
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, param_dtype=pdtype,
            name="pre_layrnorm",
        )(x)
        full = jnp.ones((x.shape[1], x.shape[1]), bool)[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, name=f"layers_{i}")(x, full)
        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=dtype, param_dtype=pdtype,
            name="post_layernorm",
        )(x[:, 0])
        return x, pooled
