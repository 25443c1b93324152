"""HunyuanVideo causal 3D KL-VAE (flax.linen) — 4×T, 8×H/W, 16 latent ch.

Behavioral reference: opensora/models/hunyuan_vae/autoencoder_kl_causal_3d.py
(AutoEncoder3DConfig:60-81, encode:269-316, decode:338-359, blend/tiled
encode-decode:360-552, get_latent_size:615-622) and vae.py:40-339
(EncoderCausal3D / DecoderCausal3D / DiagonalGaussianDistribution).

Public tensors use the reference's (B, C, T, H, W) layout; channels-last
internally. The first frame is a pure-image latent: latent frames =
(T-1)//4 + 1. Spatial/temporal tiling runs as host-level Python loops over
the jitted encoder/decoder — tiles are shape-uniform so XLA compiles each
tile shape once.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.models.hunyuan_vae.blocks import (
    CausalConv3d,
    DownEncoderBlockCausal3D,
    GroupNorm,
    UNetMidBlockCausal3D,
    UpDecoderBlockCausal3D,
)
from opensora_tpu.registry import MODELS
from opensora_tpu.utils.misc import to_jax_dtype


@dataclass
class AutoEncoder3DConfig:
    from_pretrained: Optional[str] = None
    act_fn: str = "silu"
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scale_factor: float = 0.476986
    shift_factor: float = 0.0
    time_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    mid_block_add_attention: bool = True
    block_out_channels: Sequence[int] = field(default_factory=lambda: (128, 256, 512, 512))
    sample_size: int = 256
    sample_tsize: int = 64
    use_spatial_tiling: bool = False
    use_temporal_tiling: bool = False
    tile_overlap_factor: float = 0.25
    dropout: float = 0.0
    dtype: str = "bf16"
    param_dtype: str = "fp32"

    def get(self, name, default=None):
        return getattr(self, name, default)


class DiagonalGaussianDistribution:
    """Latent posterior (reference vae.py:282-339). RNG is explicit."""

    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False, axis: int = 1):
        self.parameters = parameters
        self.mean, self.logvar = jnp.split(parameters, 2, axis=axis)
        self.logvar = jnp.clip(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.var = self.std = jnp.zeros_like(self.mean)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        noise = jax.random.normal(rng, self.mean.shape, jnp.float32)
        return self.mean + self.std * noise.astype(self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(self.mean.shape[0], self.mean.dtype)
        reduce_dims = tuple(range(1, self.mean.ndim))
        m = self.mean.astype(jnp.float32)
        return 0.5 * jnp.sum(
            m * m + self.var.astype(jnp.float32) - 1.0 - self.logvar.astype(jnp.float32),
            axis=reduce_dims,
        )

    def nll(self, sample: jnp.ndarray, dims=(1, 2, 3)) -> jnp.ndarray:
        if self.deterministic:
            return jnp.zeros(self.mean.shape[0], self.mean.dtype)
        logtwopi = math.log(2.0 * math.pi)
        s = sample.astype(jnp.float32)
        m = self.mean.astype(jnp.float32)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar.astype(jnp.float32) + (s - m) ** 2 / self.var.astype(jnp.float32),
            axis=dims,
        )


def blend_tiles(a: jnp.ndarray, b: jnp.ndarray, extent: int, axis: int) -> jnp.ndarray:
    """Linear overlap blend of adjacent tiles, vectorized over the blend axis
    (reference autoencoder_kl_causal_3d.py:362-383 blend_v/h/t loops)."""
    extent = min(a.shape[axis], b.shape[axis], extent)
    if extent == 0:
        return b
    ramp_shape = [1] * b.ndim
    ramp_shape[axis] = extent
    ramp = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(ramp_shape)
    a_tail = jax.lax.slice_in_dim(a, a.shape[axis] - extent, a.shape[axis], axis=axis)
    b_head = jax.lax.slice_in_dim(b, 0, extent, axis=axis)
    blended = (a_tail.astype(jnp.float32) * (1 - ramp) + b_head.astype(jnp.float32) * ramp).astype(b.dtype)
    b_rest = jax.lax.slice_in_dim(b, extent, b.shape[axis], axis=axis)
    return jnp.concatenate([blended, b_rest], axis=axis)


def _down_block_strides(cfg: AutoEncoder3DConfig, i: int) -> Tuple[bool, Tuple[int, int, int]]:
    """Stride schedule from compression ratios (reference vae.py:66-101)."""
    n = len(cfg.block_out_channels)
    is_final = i == n - 1
    n_spatial = int(np.log2(cfg.spatial_compression_ratio))
    n_time = int(np.log2(cfg.time_compression_ratio))
    if cfg.time_compression_ratio == 4:
        add_spatial = i < n_spatial
        add_time = i >= (n - 1 - n_time) and not is_final
    elif cfg.time_compression_ratio == 8:
        add_spatial = i < n_spatial
        add_time = i < n_spatial
    else:
        raise ValueError(f"Unsupported time_compression_ratio {cfg.time_compression_ratio}")
    stride = (2 if add_time else 1, 2 if add_spatial else 1, 2 if add_spatial else 1)
    return (add_spatial or add_time), stride


class EncoderCausal3D(nn.Module):
    config: AutoEncoder3DConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        common = dict(dtype=dtype, param_dtype=pdtype)

        x = CausalConv3d(cfg.block_out_channels[0], 3, 1, **common, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            add_down, stride = _down_block_strides(cfg, i)
            x = DownEncoderBlockCausal3D(
                out_channels=ch,
                num_layers=cfg.layers_per_block,
                add_downsample=add_down,
                downsample_stride=stride,
                num_groups=cfg.norm_num_groups,
                dropout=cfg.dropout,
                **common,
                name=f"down_blocks_{i}",
            )(x, deterministic)
        x = UNetMidBlockCausal3D(
            num_groups=cfg.norm_num_groups,
            add_attention=cfg.mid_block_add_attention,
            dropout=cfg.dropout,
            **common,
            name="mid_block",
        )(x, deterministic)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, pdtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return CausalConv3d(2 * cfg.latent_channels, 3, 1, **common, name="conv_out")(x)


class DecoderCausal3D(nn.Module):
    config: AutoEncoder3DConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        common = dict(dtype=dtype, param_dtype=pdtype)
        rev = list(reversed(cfg.block_out_channels))

        x = CausalConv3d(rev[0], 3, 1, **common, name="conv_in")(z)
        x = UNetMidBlockCausal3D(
            num_groups=cfg.norm_num_groups,
            add_attention=cfg.mid_block_add_attention,
            dropout=cfg.dropout,
            **common,
            name="mid_block",
        )(x, deterministic)
        for i, ch in enumerate(rev):
            add_up, stride = _down_block_strides(cfg, i)
            x = UpDecoderBlockCausal3D(
                out_channels=ch,
                num_layers=cfg.layers_per_block + 1,
                add_upsample=add_up,
                upsample_scale_factor=stride,
                num_groups=cfg.norm_num_groups,
                dropout=cfg.dropout,
                **common,
                name=f"up_blocks_{i}",
            )(x, deterministic)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, pdtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return CausalConv3d(cfg.out_channels, 3, 1, **common, name="conv_out")(x)


class AutoencoderKLCausal3D(nn.Module):
    """Full KL-VAE with quant convs, scale/shift, and tiled encode/decode."""

    config: AutoEncoder3DConfig

    def setup(self):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        self.encoder = EncoderCausal3D(cfg)
        self.decoder = DecoderCausal3D(cfg)
        self.quant_conv = nn.Conv(
            2 * cfg.latent_channels, (1, 1, 1), dtype=dtype, param_dtype=pdtype
        )
        self.post_quant_conv = nn.Conv(
            cfg.latent_channels, (1, 1, 1), dtype=dtype, param_dtype=pdtype
        )

    # ---- geometry ----
    @property
    def time_compression_ratio(self):
        return self.config.time_compression_ratio

    @property
    def spatial_compression_ratio(self):
        return self.config.spatial_compression_ratio

    @property
    def compression(self):
        return (
            self.config.time_compression_ratio,
            self.config.spatial_compression_ratio,
            self.config.spatial_compression_ratio,
        )

    def get_latent_size(self, input_size: Tuple[int, int, int]) -> Tuple[int, int, int]:
        """(T, H, W) pixels → latent dims (reference :615-622)."""
        t, h, w = input_size
        return (
            (t - 1) // self.config.time_compression_ratio + 1,
            (h - 1) // self.config.spatial_compression_ratio + 1,
            (w - 1) // self.config.spatial_compression_ratio + 1,
        )

    # ---- tiling geometry (reference :134-143) ----
    @property
    def tile_sample_min_size(self):
        return self.config.sample_size

    @property
    def tile_latent_min_size(self):
        return self.config.sample_size // self.config.spatial_compression_ratio

    @property
    def tile_sample_min_tsize(self):
        return self.config.sample_tsize

    @property
    def tile_latent_min_tsize(self):
        return self.config.sample_tsize // self.config.time_compression_ratio

    # ---- core paths (channels-last internal) ----
    def _encode_moments(self, x_cl: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = self.encoder(x_cl, deterministic)
        return self.quant_conv(h)

    def _decode_core(self, z_cl: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        z_cl = self.post_quant_conv(z_cl)
        return self.decoder(z_cl, deterministic)

    # ---- blending (reference :362-383) ----
    _blend = staticmethod(lambda a, b, extent, axis: blend_tiles(a, b, extent, axis))

    def spatial_tiled_encode(self, x_cl: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Overlap-tile encode over H/W (reference :384-441). channels-last."""
        ts = self.tile_sample_min_size
        overlap = int(ts * (1 - self.config.tile_overlap_factor))
        blend = int(self.tile_latent_min_size * self.config.tile_overlap_factor)
        limit = self.tile_latent_min_size - blend

        rows = []
        for i in range(0, x_cl.shape[2], overlap):
            row = []
            for j in range(0, x_cl.shape[3], overlap):
                tile = x_cl[:, :, i:i + ts, j:j + ts, :]
                row.append(self._encode_moments(tile, deterministic))
            rows.append(row)
        result_rows = []
        for i, row in enumerate(rows):
            result = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = self._blend(rows[i - 1][j], tile, blend, axis=2)
                if j > 0:
                    tile = self._blend(row[j - 1], tile, blend, axis=3)
                result.append(tile[:, :, :limit, :limit, :])
            result_rows.append(jnp.concatenate(result, axis=3))
        return jnp.concatenate(result_rows, axis=2)

    def spatial_tiled_decode(self, z_cl: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        tl = self.tile_latent_min_size
        overlap = int(tl * (1 - self.config.tile_overlap_factor))
        blend = int(self.tile_sample_min_size * self.config.tile_overlap_factor)
        limit = self.tile_sample_min_size - blend

        rows = []
        for i in range(0, z_cl.shape[2], overlap):
            row = []
            for j in range(0, z_cl.shape[3], overlap):
                tile = z_cl[:, :, i:i + tl, j:j + tl, :]
                row.append(self._decode_core(tile, deterministic))
            rows.append(row)
        result_rows = []
        for i, row in enumerate(rows):
            result = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = self._blend(rows[i - 1][j], tile, blend, axis=2)
                if j > 0:
                    tile = self._blend(row[j - 1], tile, blend, axis=3)
                result.append(tile[:, :, :limit, :limit, :])
            result_rows.append(jnp.concatenate(result, axis=3))
        return jnp.concatenate(result_rows, axis=2)

    def temporal_tiled_encode(self, x_cl: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """Causality-aware temporal tiling (reference :486-515): tiles carry
        one extra leading frame; the first latent frame of non-first tiles is
        dropped before blending."""
        T = x_cl.shape[1]
        tst = self.tile_sample_min_tsize
        overlap = int(tst * (1 - self.config.tile_overlap_factor))
        blend = int(self.tile_latent_min_tsize * self.config.tile_overlap_factor)
        limit = self.tile_latent_min_tsize - blend

        tiles = []
        for i in range(0, T, overlap):
            tile = x_cl[:, i:i + tst + 1]
            if self.config.use_spatial_tiling and (
                tile.shape[2] > self.tile_sample_min_size
                or tile.shape[3] > self.tile_sample_min_size
            ):
                tile = self.spatial_tiled_encode(tile, deterministic)
            else:
                tile = self._encode_moments(tile, deterministic)
            if i > 0:
                tile = tile[:, 1:]
            tiles.append(tile)
        result = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = self._blend(tiles[i - 1], tile, blend, axis=1)
                result.append(tile[:, :limit])
            else:
                result.append(tile[:, :limit + 1])
        return jnp.concatenate(result, axis=1)

    def temporal_tiled_decode(self, z_cl: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        T = z_cl.shape[1]
        tlt = self.tile_latent_min_tsize
        overlap = int(tlt * (1 - self.config.tile_overlap_factor))
        blend = int(self.tile_sample_min_tsize * self.config.tile_overlap_factor)
        limit = self.tile_sample_min_tsize - blend

        tiles = []
        for i in range(0, T, overlap):
            tile = z_cl[:, i:i + tlt + 1]
            if self.config.use_spatial_tiling and (
                tile.shape[2] > self.tile_latent_min_size
                or tile.shape[3] > self.tile_latent_min_size
            ):
                dec = self.spatial_tiled_decode(tile, deterministic)
            else:
                dec = self._decode_core(tile, deterministic)
            if i > 0:
                dec = dec[:, 1:]
            tiles.append(dec)
        result = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = self._blend(tiles[i - 1], tile, blend, axis=1)
                result.append(tile[:, :limit])
            else:
                result.append(tile[:, :limit + 1])
        return jnp.concatenate(result, axis=1)

    # ---- public API, (B, C, T, H, W) like the reference ----
    def encode(
        self,
        x: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = True,
        return_posterior: bool = False,
        deterministic: bool = True,
    ):
        assert x.ndim == 5, "expected (B, C, T, H, W)"
        x_cl = jnp.transpose(x, (0, 2, 3, 4, 1))
        cfg = self.config
        if cfg.use_temporal_tiling and x_cl.shape[1] > self.tile_sample_min_tsize:
            moments = self.temporal_tiled_encode(x_cl, deterministic)
        elif cfg.use_spatial_tiling and (
            x_cl.shape[2] > self.tile_sample_min_size
            or x_cl.shape[3] > self.tile_sample_min_size
        ):
            moments = self.spatial_tiled_encode(x_cl, deterministic)
        else:
            moments = self._encode_moments(x_cl, deterministic)
        posterior = DiagonalGaussianDistribution(moments, axis=-1)
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("gaussian")
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        z = self.config.scale_factor * (z - self.config.shift_factor)
        z = jnp.transpose(z, (0, 4, 1, 2, 3))
        if return_posterior:
            return z, posterior
        return z

    def decode(self, z: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        assert z.ndim == 5, "expected (B, C, T, H, W)"
        z = z / self.config.scale_factor + self.config.shift_factor
        z_cl = jnp.transpose(z, (0, 2, 3, 4, 1))
        cfg = self.config
        if cfg.use_temporal_tiling and z_cl.shape[1] > self.tile_latent_min_tsize:
            dec = self.temporal_tiled_decode(z_cl, deterministic)
        elif cfg.use_spatial_tiling and (
            z_cl.shape[2] > self.tile_latent_min_size
            or z_cl.shape[3] > self.tile_latent_min_size
        ):
            dec = self.spatial_tiled_decode(z_cl, deterministic)
        else:
            dec = self._decode_core(z_cl, deterministic)
        return jnp.transpose(dec, (0, 4, 1, 2, 3))

    def __call__(
        self,
        x: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = True,
        deterministic: bool = True,
    ):
        """Full fwd: returns (x_rec, posterior, z) like the reference trainer."""
        z, posterior = self.encode(
            x, rng=rng, sample_posterior=sample_posterior,
            return_posterior=True, deterministic=deterministic,
        )
        x_rec = self.decode(z, deterministic=deterministic)
        return x_rec, posterior, z


@MODELS.register_module("hunyuan_vae")
def CausalVAE3D_HUNYUAN(from_pretrained: Optional[str] = None, **kwargs) -> AutoencoderKLCausal3D:
    known = {f.name for f in AutoEncoder3DConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    cfg = AutoEncoder3DConfig(
        from_pretrained=from_pretrained,
        **{k: v for k, v in kwargs.items() if k in known},
    )
    return AutoencoderKLCausal3D(cfg)
