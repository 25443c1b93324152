"""Flux 2D image KL-VAE (8× spatial, 16 latent ch) for the t2i2v pipeline.

Behavioral reference: opensora/models/vae/autoencoder_2d.py:34-339
(AutoEncoderConfig, AttnBlock, ResnetBlock, Encoder/Decoder, scale/shift,
registry "autoencoder_2d"). Standard SD-style VAE; channels-last internally,
(B, C, H, W) at the boundary like the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from opensora_tpu.ops.norms import group_norm
from opensora_tpu.registry import MODELS
from opensora_tpu.utils.misc import to_jax_dtype


@dataclass
class AutoEncoderConfig:
    from_pretrained: Optional[str] = None
    resolution: int = 256
    in_channels: int = 3
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = field(default_factory=lambda: [1, 2, 4, 4])
    num_res_blocks: int = 2
    z_channels: int = 16
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159
    dtype: str = "bf16"
    param_dtype: str = "fp32"


class GroupNorm2D(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return group_norm(x, min(self.num_groups, c), scale, bias, self.eps)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        conv = dict(kernel_size=(3, 3), padding=1, dtype=self.dtype, param_dtype=self.param_dtype)
        h = GroupNorm2D(param_dtype=self.param_dtype, name="norm1")(x)
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, **conv, name="conv1")(h)
        h = GroupNorm2D(param_dtype=self.param_dtype, name="norm2")(h)
        h = nn.swish(h)
        h = nn.Conv(self.out_channels, **conv, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(
                self.out_channels, kernel_size=(1, 1),
                dtype=self.dtype, param_dtype=self.param_dtype, name="nin_shortcut",
            )(x)
        return x + h


class AttnBlock(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        conv = dict(kernel_size=(1, 1), dtype=self.dtype, param_dtype=self.param_dtype)
        y = GroupNorm2D(param_dtype=self.param_dtype, name="norm")(x)
        q = nn.Conv(c, **conv, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, **conv, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, **conv, name="v")(y).reshape(b, h * w, c)
        s = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
        s = jax.nn.softmax(s / jnp.sqrt(jnp.float32(c)), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", s, v.astype(jnp.float32)).astype(x.dtype)
        out = out.reshape(b, h, w, c)
        return x + nn.Conv(c, **conv, name="proj_out")(out)


class Encoder2D(nn.Module):
    config: AutoEncoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        conv = dict(dtype=dtype, param_dtype=pdtype)
        h = nn.Conv(cfg.ch, (3, 3), padding=1, **conv, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, dtype, pdtype, name=f"down_{i}_block_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                # asymmetric pad (0,1,0,1) + stride-2 conv like the reference
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=2, padding="VALID", **conv,
                    name=f"down_{i}_downsample",
                )(h)
        ch = h.shape[-1]
        h = ResnetBlock(ch, dtype, pdtype, name="mid_block_1")(h)
        h = AttnBlock(dtype, pdtype, name="mid_attn_1")(h)
        h = ResnetBlock(ch, dtype, pdtype, name="mid_block_2")(h)
        h = GroupNorm2D(param_dtype=pdtype, name="norm_out")(h)
        h = nn.swish(h)
        return nn.Conv(2 * cfg.z_channels, (3, 3), padding=1, **conv, name="conv_out")(h)


class Decoder2D(nn.Module):
    config: AutoEncoderConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        conv = dict(dtype=dtype, param_dtype=pdtype)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding=1, **conv, name="conv_in")(z)
        h = ResnetBlock(ch, dtype, pdtype, name="mid_block_1")(h)
        h = AttnBlock(dtype, pdtype, name="mid_attn_1")(h)
        h = ResnetBlock(ch, dtype, pdtype, name="mid_block_2")(h)
        for i in reversed(range(len(cfg.ch_mult))):
            out_ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(out_ch, dtype, pdtype, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                b, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(c, (3, 3), padding=1, **conv, name=f"up_{i}_upsample")(h)
        h = GroupNorm2D(param_dtype=pdtype, name="norm_out")(h)
        h = nn.swish(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, **conv, name="conv_out")(h)


class AutoEncoder2D(nn.Module):
    config: AutoEncoderConfig

    def setup(self):
        self.encoder = Encoder2D(self.config)
        self.decoder = Decoder2D(self.config)

    @staticmethod
    def _fold_t(x):
        """(B, C, T, H, W) → ((B·T), C, H, W), like the reference's
        rearrange in autoencoder_2d.py:269-291; 4D passes through."""
        if x.ndim == 5:
            b, c, t, h, w = x.shape
            return x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w), t
        return x, None

    @staticmethod
    def _unfold_t(x, t):
        if t is None:
            return x
        bt, c, h, w = x.shape
        return x.reshape(bt // t, t, c, h, w).transpose(0, 2, 1, 3, 4)

    def encode(self, x, rng=None, sample_posterior=True, return_posterior=False, **_):
        """(B, C, [T,] H, W) → latent, scale/shift applied."""
        from opensora_tpu.models.hunyuan_vae.model import DiagonalGaussianDistribution

        x, t = self._fold_t(x)
        x_cl = jnp.transpose(x, (0, 2, 3, 1))
        moments = self.encoder(x_cl)
        posterior = DiagonalGaussianDistribution(moments, axis=-1)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("gaussian")
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        z = self.config.scale_factor * (z - self.config.shift_factor)
        z = self._unfold_t(jnp.transpose(z, (0, 3, 1, 2)), t)
        if return_posterior:
            return z, posterior
        return z

    def decode(self, z, **_):
        z, t = self._fold_t(z)
        z = z / self.config.scale_factor + self.config.shift_factor
        z_cl = jnp.transpose(z, (0, 2, 3, 1))
        dec = self.decoder(z_cl)
        return self._unfold_t(jnp.transpose(dec, (0, 3, 1, 2)), t)

    def __call__(self, x, rng=None, sample_posterior=True):
        z, posterior = self.encode(
            x, rng=rng, sample_posterior=sample_posterior, return_posterior=True
        )
        return self.decode(z), posterior, z


@MODELS.register_module("autoencoder_2d")
def AutoEncoderFlux(from_pretrained: Optional[str] = None, **kwargs) -> AutoEncoder2D:
    known = {f.name for f in AutoEncoderConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    cfg = AutoEncoderConfig(
        from_pretrained=from_pretrained,
        **{k: v for k, v in kwargs.items() if k in known},
    )
    return AutoEncoder2D(cfg)
