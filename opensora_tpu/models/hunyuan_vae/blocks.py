"""Causal 3D conv building blocks for the HunyuanVideo VAE (flax.linen).

Behavioral reference: opensora/models/hunyuan_vae/unet_causal_3d_blocks.py
(CausalConv3d:65-98, UpsampleCausal3D:100-160, DownsampleCausal3D:162-183,
ResnetBlockCausal3D:185-259, UNetMidBlockCausal3D:262-356,
DownEncoderBlockCausal3D:359-417, UpDecoderBlockCausal3D:420-476).

TPU-first design decisions:
- internal layout is channels-last (B, T, H, W, C) — the layout XLA lowers
  conv3d to efficiently on TPU; the (B, C, T, H, W) torch layout exists only
  at the public encode/decode boundary;
- temporal causality = replicate-pad (k-1) frames on the left only, spatial
  = symmetric k//2 replicate padding (reference pad tuple at :83-91);
- the mid-block causal attention mask is never materialized: the Pallas
  flash kernel computes the frame-causal mask from indices
  (``causal_block=H*W`` tokens per frame), replacing the O(L²) bias of
  reference ``prepare_causal_attention_mask`` (:52-60);
- channel-chunked conv (reference vae/utils.py:65-111, a cuDNN numel-limit
  workaround) is unnecessary — XLA tiles convs natively.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from opensora_tpu.ops.attention import scaled_dot_product_attention
from opensora_tpu.ops.norms import group_norm


class CausalConv3d(nn.Module):
    """3D conv with left-only temporal replicate padding (causal in T)."""

    features: int
    kernel_size: int | Tuple[int, int, int] = 3
    stride: int | Tuple[int, int, int] = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks, ks)
        st = self.stride
        if isinstance(st, int):
            st = (st, st, st)
        kt, kh, kw = ks
        # (B, T, H, W, C): T left-pad kt-1, H/W symmetric k//2, replicate mode
        pad = (
            (0, 0),
            (kt - 1, 0),
            (kh // 2, kh // 2),
            (kw // 2, kw // 2),
            (0, 0),
        )
        if any(p != (0, 0) for p in pad):
            x = jnp.pad(x, pad, mode="edge")
        return nn.Conv(
            self.features,
            kernel_size=ks,
            strides=st,
            padding="VALID",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return group_norm(x, self.num_groups, scale, bias, self.eps)


def upsample_nearest_causal(x: jnp.ndarray, factor: Tuple[int, int, int]) -> jnp.ndarray:
    """Nearest-neighbour upsample; the first frame only upsamples spatially
    (reference UpsampleCausal3D:136-150) so causal latents map back to the
    image-frame-first convention."""
    ft, fh, fw = factor
    b, t, h, w, c = x.shape
    first, rest = x[:, :1], x[:, 1:]
    # spatial upsample of the first frame
    first = jnp.repeat(jnp.repeat(first, fh, axis=2), fw, axis=3)
    if t > 1:
        rest = jnp.repeat(
            jnp.repeat(jnp.repeat(rest, ft, axis=1), fh, axis=2), fw, axis=3
        )
        return jnp.concatenate([first, rest], axis=1)
    return first


class UpsampleCausal3D(nn.Module):
    features: int
    upsample_factor: Tuple[int, int, int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_nearest_causal(x, self.upsample_factor)
        return CausalConv3d(
            self.features, 3, 1, self.dtype, self.param_dtype, name="conv"
        )(x)


class DownsampleCausal3D(nn.Module):
    features: int
    stride: Tuple[int, int, int] = (2, 2, 2)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return CausalConv3d(
            self.features, 3, self.stride, self.dtype, self.param_dtype, name="conv"
        )(x)


class ResnetBlockCausal3D(nn.Module):
    out_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        h = GroupNorm(self.groups, self.eps, self.param_dtype, name="norm1")(x)
        h = nn.silu(h)
        h = CausalConv3d(out_channels, 3, 1, self.dtype, self.param_dtype, name="conv1")(h)
        h = GroupNorm(self.groups, self.eps, self.param_dtype, name="norm2")(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = CausalConv3d(out_channels, 3, 1, self.dtype, self.param_dtype, name="conv2")(h)
        if in_channels != out_channels:
            x = CausalConv3d(
                out_channels, 1, 1, self.dtype, self.param_dtype, name="conv_shortcut"
            )(x)
        return x + h


class CausalAttention(nn.Module):
    """Single mid-block self-attention over flattened (T·H·W) tokens with a
    frame-causal mask (reference UNetMidBlockCausal3D + diffusers Attention:
    group-norm → qkv → 1-head attention → out-proj → residual)."""

    num_groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.num_groups, self.eps, self.param_dtype, name="group_norm")(x)
        y = y.reshape(b, t * h * w, c)
        dense = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(c, **dense, name="to_q")(y)
        k = nn.Dense(c, **dense, name="to_k")(y)
        v = nn.Dense(c, **dense, name="to_v")(y)
        # single head of dim c, (B, 1, L, D) layout for the kernel
        out = scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None], causal_block=h * w
        )[:, 0]
        out = nn.Dense(c, **dense, name="to_out")(out)
        return out.reshape(b, t, h, w, c) + residual


class UNetMidBlockCausal3D(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6
    add_attention: bool = True
    num_layers: int = 1
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        common = dict(
            groups=self.num_groups, eps=self.eps, dropout=self.dropout,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )
        x = ResnetBlockCausal3D(**common, name="resnets_0")(x, deterministic)
        for i in range(self.num_layers):
            if self.add_attention:
                x = CausalAttention(
                    self.num_groups, self.eps, self.dtype, self.param_dtype,
                    name=f"attentions_{i}",
                )(x)
            x = ResnetBlockCausal3D(**common, name=f"resnets_{i + 1}")(x, deterministic)
        return x


class DownEncoderBlockCausal3D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    downsample_stride: Tuple[int, int, int] = (2, 2, 2)
    num_groups: int = 32
    eps: float = 1e-6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = ResnetBlockCausal3D(
                out_channels=self.out_channels,
                groups=self.num_groups, eps=self.eps, dropout=self.dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x, deterministic)
        if self.add_downsample:
            x = DownsampleCausal3D(
                self.out_channels, self.downsample_stride,
                self.dtype, self.param_dtype, name="downsamplers_0",
            )(x)
        return x


class UpDecoderBlockCausal3D(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    upsample_scale_factor: Tuple[int, int, int] = (2, 2, 2)
    num_groups: int = 32
    eps: float = 1e-6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = ResnetBlockCausal3D(
                out_channels=self.out_channels,
                groups=self.num_groups, eps=self.eps, dropout=self.dropout,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x, deterministic)
        if self.add_upsample:
            x = UpsampleCausal3D(
                self.out_channels, self.upsample_scale_factor,
                self.dtype, self.param_dtype, name="upsamplers_0",
            )(x)
        return x
