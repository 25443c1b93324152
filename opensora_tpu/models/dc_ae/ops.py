"""DC-AE op library (flax.linen, channels-last).

Behavioral reference: opensora/models/dc_ae/models/nn/ops.py (ConvLayer:56,
pixel-(un)shuffle down/up layers:162-341, GLUMBConv:530, ResBlock:594,
LiteMLA:642, EfficientViTBlock:826, ResidualBlock:896, OpSequential:966),
norm.py (rms2d/rms3d) and vo_ops.py (pixel_(un)shuffle_3d).

Layout: images (B, H, W, C); videos (B, T, H, W, C). The reference's
channel-chunked conv3d (cuDNN numel-limit workaround) is unnecessary — XLA
tiles convs natively. LiteMLA's fp32 island (autocast-off) is preserved.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# ----------------------------------------------------------------------
# norms / acts
# ----------------------------------------------------------------------


class RMSNormND(nn.Module):
    """rms2d/rms3d: RMS over the channel dim, affine scale+bias."""

    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        x = (xf / jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)).astype(x.dtype)
        return x * weight.astype(x.dtype) + bias.astype(x.dtype)


class LayerNormND(nn.Module):
    """ln2d: mean/var over channels."""

    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        out = xf - mu
        out = out / jnp.sqrt(jnp.mean(out * out, axis=-1, keepdims=True) + self.eps)
        return out.astype(x.dtype) * weight.astype(x.dtype) + bias.astype(x.dtype)


def build_norm(name: Optional[str], param_dtype=jnp.float32, module_name="norm"):
    if name is None:
        return None
    if name in ("rms2d", "rms3d"):
        return RMSNormND(param_dtype=param_dtype, name=module_name)
    if name in ("ln", "ln2d"):
        return LayerNormND(param_dtype=param_dtype, name=module_name)
    raise ValueError(f"norm {name!r} not supported")


def build_act(name: Optional[str]):
    if name is None:
        return None
    return {
        "silu": nn.silu,
        "relu": nn.relu,
        "relu6": lambda x: jnp.clip(nn.relu(x), 0, 6),
        "gelu": lambda x: nn.gelu(x, approximate=True),
        "swish": nn.swish,
    }[name]


# ----------------------------------------------------------------------
# pixel shuffle helpers (channels-last)
# ----------------------------------------------------------------------


def pixel_unshuffle_2d(x, r):
    """(..., H, W, C) → (..., H/r, W/r, C·r²); channel order matches torch
    F.pixel_unshuffle (C, rh, rw)."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // r, r, w // r, r, c)
    x = jnp.moveaxis(x, (-4, -2), (-2, -1))  # (..., H/r, W/r, c, rh, rw)
    return x.reshape(*lead, h // r, w // r, c * r * r)


def pixel_shuffle_2d(x, r):
    *lead, h, w, c = x.shape
    cn = c // (r * r)
    x = x.reshape(*lead, h, w, cn, r, r)
    x = jnp.moveaxis(x, (-2, -1), (-4, -2))  # (..., h, rh, w, rw, cn)
    return x.reshape(*lead, h * r, w * r, cn)


def pixel_unshuffle_3d(x, r):
    """(B, T, H, W, C) → (B, T/r, H/r, W/r, C·r³); order (C, rt, rh, rw)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // r, r, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, t // r, h // r, w // r, c * r**3)


def pixel_shuffle_3d(x, r):
    b, t, h, w, c = x.shape
    cn = c // r**3
    x = x.reshape(b, t, h, w, cn, r, r, r)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * r, h * r, w * r, cn)


# ----------------------------------------------------------------------
# conv layers
# ----------------------------------------------------------------------


class ConvLayer(nn.Module):
    """conv → norm → act (reference ops.py:56-126). Spatial/temporal 'same'
    padding; stride int or per-dim tuple; optional grouped conv."""

    out_channels: int
    kernel_size: int = 3
    stride: int | Tuple[int, ...] = 1
    groups: int = 1
    use_bias: bool = False
    norm: Optional[str] = None
    act_func: Optional[str] = None
    is_video: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nd = 3 if self.is_video else 2
        ks = (self.kernel_size,) * nd
        st = self.stride if isinstance(self.stride, (tuple, list)) else (self.stride,) * nd
        x = nn.Conv(
            self.out_channels, kernel_size=ks, strides=tuple(st), padding="SAME",
            feature_group_count=self.groups, use_bias=self.use_bias,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
        norm = build_norm(self.norm, self.param_dtype)
        if norm is not None:
            x = norm(x)
        act = build_act(self.act_func)
        if act is not None:
            x = act(x)
        return x


class ConvPixelUnshuffleDownSampleLayer(nn.Module):
    out_channels: int
    kernel_size: int = 3
    factor: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r2 = self.factor**2
        assert self.out_channels % r2 == 0
        x = ConvLayer(
            self.out_channels // r2, self.kernel_size, 1, use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
        return pixel_unshuffle_2d(x, self.factor)


class PixelUnshuffleChannelAveragingDownSampleLayer(nn.Module):
    """Parameter-free downsample shortcut (reference ops.py:189-232)."""

    in_channels: int
    out_channels: int
    factor: int = 2
    temporal_downsample: bool = False

    def __call__(self, x):
        r = self.factor
        if x.ndim == 4:  # image
            assert self.in_channels * r**2 % self.out_channels == 0
            group = self.in_channels * r**2 // self.out_channels
            x = pixel_unshuffle_2d(x, r)
            *lead, c = x.shape
            x = x.reshape(*lead, self.out_channels, group)
            return x.mean(axis=-1)
        t = x.shape[1]
        if self.temporal_downsample and t != 1:
            x = pixel_unshuffle_3d(x, r)
            group = self.in_channels * r**3 // self.out_channels
        else:
            x = pixel_unshuffle_2d(x, r)
            group = self.in_channels * r**2 // self.out_channels
        *lead, c = x.shape
        x = x.reshape(*lead, self.out_channels, group)
        return x.mean(axis=-1)


class ConvPixelShuffleUpSampleLayer(nn.Module):
    out_channels: int
    kernel_size: int = 3
    factor: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvLayer(
            self.out_channels * self.factor**2, self.kernel_size, 1, use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)
        return pixel_shuffle_2d(x, self.factor)


class ChannelDuplicatingPixelShuffleUpSampleLayer(nn.Module):
    """Parameter-free upsample shortcut (reference ops.py:301-341)."""

    in_channels: int
    out_channels: int
    factor: int = 2
    temporal_upsample: bool = False

    def __call__(self, x):
        r = self.factor
        is_video = x.ndim == 5
        t = x.shape[1] if is_video else 1
        if self.temporal_upsample and is_video and t != 1:
            repeats = self.out_channels * r**3 // self.in_channels
        else:
            repeats = self.out_channels * r**2 // self.in_channels
        x = jnp.repeat(x, repeats, axis=-1)
        if not is_video:
            return pixel_shuffle_2d(x, r)
        if self.temporal_upsample and t != 1:
            return pixel_shuffle_3d(x, r)
        return pixel_shuffle_2d(x, r)


class InterpolateConvUpSampleLayer(nn.Module):
    out_channels: int
    kernel_size: int = 3
    factor: int = 2
    is_video: bool = False
    temporal_upsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        r = self.factor
        if x.ndim == 4:
            x = jnp.repeat(jnp.repeat(x, r, axis=1), r, axis=2)
        else:
            if self.temporal_upsample and x.shape[1] != 1:
                x = jnp.repeat(x, r, axis=1)
            x = jnp.repeat(jnp.repeat(x, r, axis=2), r, axis=3)
        return ConvLayer(
            self.out_channels, self.kernel_size, 1, use_bias=True,
            is_video=self.is_video, dtype=self.dtype, param_dtype=self.param_dtype,
            name="conv",
        )(x)


# ----------------------------------------------------------------------
# blocks
# ----------------------------------------------------------------------


class ResBlock(nn.Module):
    """conv-norm-act sandwich ResBlock main path (reference ops.py:594-640);
    the residual add lives in ResidualBlock."""

    out_channels: int
    kernel_size: int = 3
    norm: Tuple[Optional[str], Optional[str]] = (None, "rms3d")
    act_func: Tuple[Optional[str], Optional[str]] = ("silu", None)
    use_bias: Tuple[bool, bool] = (True, False)
    is_video: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        common = dict(is_video=self.is_video, dtype=self.dtype, param_dtype=self.param_dtype)
        x = ConvLayer(
            self.out_channels, self.kernel_size, 1, use_bias=self.use_bias[0],
            norm=self.norm[0], act_func=self.act_func[0], **common, name="conv1",
        )(x)
        x = ConvLayer(
            self.out_channels, self.kernel_size, 1, use_bias=self.use_bias[1],
            norm=self.norm[1], act_func=self.act_func[1], **common, name="conv2",
        )(x)
        return x


class GLUMBConv(nn.Module):
    """Gated inverted-bottleneck depthwise conv (reference ops.py:530-592)."""

    out_channels: int
    expand_ratio: float = 6
    kernel_size: int = 3
    norm: Tuple = (None, None, "ln2d")
    act_func: Tuple = ("silu", "silu", None)
    is_video: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = round(in_ch * self.expand_ratio)
        common = dict(is_video=self.is_video, dtype=self.dtype, param_dtype=self.param_dtype)
        x = ConvLayer(
            2 * mid, 1, 1, use_bias=False, norm=self.norm[0],
            act_func=self.act_func[0], **common, name="inverted_conv",
        )(x)
        x = ConvLayer(
            2 * mid, self.kernel_size, 1, groups=2 * mid, use_bias=False,
            norm=self.norm[1], act_func=None, **common, name="depth_conv",
        )(x)
        x, gate = jnp.split(x, 2, axis=-1)
        x = x * nn.silu(gate)
        return ConvLayer(
            self.out_channels, 1, 1, use_bias=False, norm=self.norm[2],
            act_func=self.act_func[2], **common, name="point_conv",
        )(x)


class LiteMLA(nn.Module):
    """Multi-scale linear ReLU attention (reference ops.py:642-825).

    fp32 compute island preserved: the linear attention runs in fp32 with the
    homogeneous-coordinate trick (pad v with ones, divide by the last row)."""

    out_channels: int
    dim: int = 8
    scales: Sequence[int] = (5,)
    norm: Tuple = (None, "rms3d")
    eps: float = 1e-15
    is_video: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        heads = in_ch // self.dim
        total = heads * self.dim
        common = dict(is_video=self.is_video, dtype=self.dtype, param_dtype=self.param_dtype)

        qkv = ConvLayer(3 * total, 1, 1, use_bias=False, **common, name="qkv")(qkv_in := x)
        multi = [qkv]
        nd = 3 if self.is_video else 2
        for si, scale in enumerate(self.scales):
            h = nn.Conv(
                3 * total, (scale,) * nd, padding="SAME",
                feature_group_count=3 * total, use_bias=False,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"aggreg_{si}_0",
            )(qkv)
            h = nn.Conv(
                3 * total, (1,) * nd, feature_group_count=3 * heads, use_bias=False,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"aggreg_{si}_1",
            )(h)
            multi.append(h)
        qkv_ms = jnp.concatenate(multi, axis=-1)

        lead = qkv_ms.shape[:-1]
        n_tok = 1
        for s in lead[1:]:
            n_tok *= s
        b = lead[0]
        # (B, N, n_heads_total, 3*dim) in fp32
        qkv_f = qkv_ms.astype(jnp.float32).reshape(b, n_tok, -1, 3 * self.dim)
        q = nn.relu(qkv_f[..., : self.dim])
        k = nn.relu(qkv_f[..., self.dim : 2 * self.dim])
        v = qkv_f[..., 2 * self.dim :]
        v = jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)
        # vk: (B, h, d+1, d) = Σ_n v k^T ; out = vk q
        vk = jnp.einsum("bnhe,bnhd->bhed", v, k)
        out = jnp.einsum("bhed,bnhd->bnhe", vk, q)
        out = out[..., :-1] / (out[..., -1:] + self.eps)
        out = out.reshape(*lead, -1).astype(x.dtype)

        return ConvLayer(
            self.out_channels, 1, 1, use_bias=False, norm=self.norm[1],
            act_func=None, **common, name="proj",
        )(out)


class EfficientViTBlock(nn.Module):
    """LiteMLA + GLUMBConv, each residual (reference ops.py:826-894)."""

    in_channels: int
    scales: Sequence[int] = (5,)
    norm: str = "rms3d"
    act_func: str = "silu"
    is_video: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + LiteMLA(
            self.in_channels, scales=tuple(self.scales), norm=(None, self.norm),
            is_video=self.is_video, dtype=self.dtype, param_dtype=self.param_dtype,
            name="context_module",
        )(x)
        x = x + GLUMBConv(
            self.in_channels, expand_ratio=4,
            norm=(None, None, self.norm), act_func=(self.act_func, self.act_func, None),
            is_video=self.is_video, dtype=self.dtype, param_dtype=self.param_dtype,
            name="local_module",
        )(x)
        return x
