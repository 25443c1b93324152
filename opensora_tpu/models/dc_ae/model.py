"""Video DC-AE: deep-compression autoencoder (4×T, 32×H/W, 128 latent ch,
no KL).

Behavioral reference: opensora/models/dc_ae/models/dc_ae.py (Encoder:376,
Decoder:443, DCAE:522 with tiled encode/decode :589-760, dc_ae_f32:790) and
ae_model_zoo.py:37-84 ("dc-ae-f32t4c128"). Stage layout for the f32t4c128
model: 6 stages [ResBlock×3, EViTS5_GLU×3], widths [128,256,512,512,1024,
1024], temporal down/up at stages 3,4, rms3d norms, Conv downsample +
channel-averaging shortcut, InterpolateConv upsample + channel-duplicating
shortcut, latent = 128 ch, posterior = None (deterministic AE).

Layout: (B, C, T, H, W) at the boundary, channels-last inside.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from opensora_tpu.models.dc_ae.ops import (
    ChannelDuplicatingPixelShuffleUpSampleLayer,
    ConvLayer,
    EfficientViTBlock,
    InterpolateConvUpSampleLayer,
    PixelUnshuffleChannelAveragingDownSampleLayer,
    ResBlock,
    build_act,
    build_norm,
)
from opensora_tpu.models.hunyuan_vae.model import blend_tiles
from opensora_tpu.registry import MODELS
from opensora_tpu.utils.misc import to_jax_dtype


@dataclass
class DCAEConfig:
    from_pretrained: Optional[str] = None
    in_channels: int = 3
    latent_channels: int = 128
    time_compression_ratio: int = 4
    spatial_compression_ratio: int = 32
    width_list: Sequence[int] = field(default_factory=lambda: (128, 256, 512, 512, 1024, 1024))
    encoder_depth_list: Sequence[int] = field(default_factory=lambda: (2, 2, 2, 3, 3, 3))
    decoder_depth_list: Sequence[int] = field(default_factory=lambda: (3, 3, 3, 3, 3, 3))
    block_type: Sequence[str] = field(
        default_factory=lambda: ("ResBlock", "ResBlock", "ResBlock", "EViTS5_GLU", "EViTS5_GLU", "EViTS5_GLU")
    )
    norm: str = "rms3d"
    act: str = "silu"
    temporal_downsample: Sequence[bool] = field(
        default_factory=lambda: (False, False, False, True, True, False)
    )
    downsample_block_type: str = "Conv"
    upsample_block_type: str = "InterpolateConv"
    is_video: bool = True
    scaling_factor: Optional[float] = None
    is_training: bool = False
    use_spatial_tiling: bool = False
    use_temporal_tiling: bool = False
    spatial_tile_size: int = 256
    temporal_tile_size: int = 32
    tile_overlap_factor: float = 0.25
    dtype: str = "bf16"
    param_dtype: str = "fp32"

    def get(self, name, default=None):
        return getattr(self, name, default)


def _build_block(block_type, width, norm, act, is_video, dtype, pdtype, name):
    if block_type == "ResBlock":
        class _Res(nn.Module):
            @nn.compact
            def __call__(self, x):
                return x + ResBlock(
                    width, norm=(None, norm), act_func=(act, None),
                    use_bias=(True, False), is_video=is_video,
                    dtype=dtype, param_dtype=pdtype, name="main",
                )(x)

        return _Res(name=name)
    if block_type in ("EViT_GLU", "EViTS5_GLU"):
        scales = (5,) if block_type == "EViTS5_GLU" else ()
        return EfficientViTBlock(
            width, scales=scales, norm=norm, act_func=act, is_video=is_video,
            dtype=dtype, param_dtype=pdtype, name=name,
        )
    raise ValueError(f"block_type {block_type!r} not supported")


class DCAEEncoder(nn.Module):
    config: DCAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        widths = list(cfg.width_list)
        depths = list(cfg.encoder_depth_list)
        n = len(widths)

        x = ConvLayer(
            widths[0], 3, 1, use_bias=True, is_video=cfg.is_video,
            dtype=dtype, param_dtype=pdtype, name="project_in",
        )(x)

        for sid in range(n):
            bt = cfg.block_type[sid]
            for d in range(depths[sid]):
                x = _build_block(
                    bt, widths[sid], cfg.norm, cfg.act, cfg.is_video,
                    dtype, pdtype, name=f"stage_{sid}_block_{d}",
                )(x)
            if sid < n - 1 and depths[sid] > 0:
                tdown = cfg.temporal_downsample[sid] if cfg.temporal_downsample else False
                stride = (2, 2, 2) if (cfg.is_video and tdown) else ((1, 2, 2) if cfg.is_video else 2)
                main = ConvLayer(
                    widths[sid + 1], 3, stride, use_bias=True,
                    is_video=cfg.is_video, dtype=dtype, param_dtype=pdtype,
                    name=f"stage_{sid}_downsample",
                )(x)
                short = PixelUnshuffleChannelAveragingDownSampleLayer(
                    widths[sid], widths[sid + 1], 2, temporal_downsample=tdown,
                )(x)
                x = main + short

        # project_out: norm → act → conv, with channel-averaging shortcut
        h = build_norm(cfg.norm, pdtype, "out_norm")(x)
        h = build_act(cfg.act)(h)
        h = ConvLayer(
            cfg.latent_channels, 3, 1, use_bias=True, is_video=cfg.is_video,
            dtype=dtype, param_dtype=pdtype, name="project_out",
        )(h)
        short = PixelUnshuffleChannelAveragingDownSampleLayer(
            widths[-1], cfg.latent_channels, 1
        )(x)
        return h + short


class DCAEDecoder(nn.Module):
    config: DCAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dtype = to_jax_dtype(cfg.dtype)
        pdtype = to_jax_dtype(cfg.param_dtype)
        widths = list(cfg.width_list)
        depths = list(cfg.decoder_depth_list)
        n = len(widths)

        # project_in with channel-duplicating shortcut
        h = ConvLayer(
            widths[-1], 3, 1, use_bias=True, is_video=cfg.is_video,
            dtype=dtype, param_dtype=pdtype, name="project_in",
        )(z)
        short = ChannelDuplicatingPixelShuffleUpSampleLayer(
            cfg.latent_channels, widths[-1], 1
        )(z)
        x = h + short

        for sid in reversed(range(n)):
            if sid < n - 1 and depths[sid] > 0:
                tup = cfg.temporal_downsample[sid] if cfg.temporal_downsample else False
                main = InterpolateConvUpSampleLayer(
                    widths[sid], 3, 2, is_video=cfg.is_video, temporal_upsample=tup,
                    dtype=dtype, param_dtype=pdtype, name=f"stage_{sid}_upsample",
                )(x)
                short = ChannelDuplicatingPixelShuffleUpSampleLayer(
                    widths[sid + 1], widths[sid], 2, temporal_upsample=tup,
                )(x)
                x = main + short
            bt = cfg.block_type[sid]
            for d in range(depths[sid]):
                x = _build_block(
                    bt, widths[sid], cfg.norm, cfg.act, cfg.is_video,
                    dtype, pdtype, name=f"stage_{sid}_block_{d}",
                )(x)

        x = build_norm(cfg.norm, pdtype, "out_norm")(x)
        x = build_act(cfg.act)(x)
        return ConvLayer(
            cfg.in_channels, 3, 1, use_bias=True, is_video=cfg.is_video,
            dtype=dtype, param_dtype=pdtype, name="project_out",
        )(x)


class DCAE(nn.Module):
    """Deterministic deep-compression AE with hunyuan-style tiled inference.

    encode: z = enc(x) [/ scaling_factor]; no posterior sampling (returns
    posterior=None from __call__, reference dc_ae.py:761-778)."""

    config: DCAEConfig

    def setup(self):
        self.encoder = DCAEEncoder(self.config)
        self.decoder = DCAEDecoder(self.config)

    # geometry
    @property
    def time_compression_ratio(self):
        return self.config.time_compression_ratio

    @property
    def spatial_compression_ratio(self):
        return self.config.spatial_compression_ratio

    @property
    def compression(self):
        c = self.config
        return (c.time_compression_ratio, c.spatial_compression_ratio, c.spatial_compression_ratio)

    def get_latent_size(self, input_size: Tuple[int, int, int]) -> Tuple[int, int, int]:
        t, h, w = input_size
        c = self.config
        return (
            (t - 1) // c.time_compression_ratio + 1,
            (h - 1) // c.spatial_compression_ratio + 1,
            (w - 1) // c.spatial_compression_ratio + 1,
        )

    @property
    def spatial_tile_latent_size(self):
        return self.config.spatial_tile_size // self.config.spatial_compression_ratio

    @property
    def temporal_tile_latent_size(self):
        return self.config.temporal_tile_size // self.config.time_compression_ratio

    def _encode(self, x_cl):
        z = self.encoder(x_cl)
        if self.config.scaling_factor is not None:
            z = z / self.config.scaling_factor
        return z

    def _decode(self, z_cl):
        if self.config.scaling_factor is not None:
            z_cl = z_cl * self.config.scaling_factor
        return self.decoder(z_cl)

    _blend = staticmethod(blend_tiles)

    def spatial_tiled_encode(self, x_cl):
        ts = self.config.spatial_tile_size
        net = int(ts * (1 - self.config.tile_overlap_factor))
        blend = int(self.spatial_tile_latent_size * self.config.tile_overlap_factor)
        limit = self.spatial_tile_latent_size - blend
        rows = []
        for i in range(0, x_cl.shape[2], net):
            row = []
            for j in range(0, x_cl.shape[3], net):
                row.append(self._encode(x_cl[:, :, i:i + ts, j:j + ts, :]))
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

    def temporal_tiled_encode(self, x_cl):
        tt = self.config.temporal_tile_size
        overlap = int(tt * (1 - self.config.tile_overlap_factor))
        blend = int(self.temporal_tile_latent_size * self.config.tile_overlap_factor)
        limit = self.temporal_tile_latent_size - blend
        tiles = []
        for i in range(0, x_cl.shape[1], overlap):
            tile = x_cl[:, i:i + tt]
            if self.config.use_spatial_tiling and (
                tile.shape[2] > self.config.spatial_tile_size
                or tile.shape[3] > self.config.spatial_tile_size
            ):
                tiles.append(self.spatial_tiled_encode(tile))
            else:
                tiles.append(self._encode(tile))
        result = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = self._blend(tiles[i - 1], tile, blend, axis=1)
            result.append(tile[:, :limit])
        return jnp.concatenate(result, axis=1)

    def spatial_tiled_decode(self, z_cl):
        tl = self.spatial_tile_latent_size
        net = int(tl * (1 - self.config.tile_overlap_factor))
        blend = int(self.config.spatial_tile_size * self.config.tile_overlap_factor)
        limit = self.config.spatial_tile_size - blend
        rows = []
        for i in range(0, z_cl.shape[2], net):
            row = []
            for j in range(0, z_cl.shape[3], net):
                row.append(self._decode(z_cl[:, :, i:i + tl, j:j + tl, :]))
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

    def temporal_tiled_decode(self, z_cl):
        tl = self.temporal_tile_latent_size
        overlap = int(tl * (1 - self.config.tile_overlap_factor))
        blend = int(self.config.temporal_tile_size * self.config.tile_overlap_factor)
        limit = self.config.temporal_tile_size - blend
        tiles = []
        for i in range(0, z_cl.shape[1], overlap):
            tile = z_cl[:, i:i + tl]
            if self.config.use_spatial_tiling and (
                tile.shape[2] > self.spatial_tile_latent_size
                or tile.shape[3] > self.spatial_tile_latent_size
            ):
                tiles.append(self.spatial_tiled_decode(tile))
            else:
                tiles.append(self._decode(tile))
        result = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = self._blend(tiles[i - 1], tile, blend, axis=1)
            result.append(tile[:, :limit])
        return jnp.concatenate(result, axis=1)

    # public API
    def encode(self, x, rng=None, **_):
        assert x.ndim == 5
        x_cl = jnp.transpose(x, (0, 2, 3, 4, 1))
        cfg = self.config
        if cfg.use_temporal_tiling and x_cl.shape[1] > cfg.temporal_tile_size:
            z = self.temporal_tiled_encode(x_cl)
        elif cfg.use_spatial_tiling and (
            x_cl.shape[2] > cfg.spatial_tile_size or x_cl.shape[3] > cfg.spatial_tile_size
        ):
            z = self.spatial_tiled_encode(x_cl)
        else:
            z = self._encode(x_cl)
        return jnp.transpose(z, (0, 4, 1, 2, 3))

    def decode(self, z, **_):
        assert z.ndim == 5
        z_cl = jnp.transpose(z, (0, 2, 3, 4, 1))
        cfg = self.config
        if cfg.use_temporal_tiling and z_cl.shape[1] > self.temporal_tile_latent_size:
            x = self.temporal_tiled_decode(z_cl)
        elif cfg.use_spatial_tiling and (
            z_cl.shape[2] > self.spatial_tile_latent_size
            or z_cl.shape[3] > self.spatial_tile_latent_size
        ):
            x = self.spatial_tiled_decode(z_cl)
        else:
            x = self._decode(z_cl)
        return jnp.transpose(x, (0, 4, 1, 2, 3))

    def __call__(self, x, rng=None, **_):
        """Returns (x_rec, posterior=None, z) like the reference forward."""
        z = self.encode(x, rng)
        dec = self.decode(z)
        return dec, None, z


def dc_ae_f32(name: str = "dc-ae-f32t4c128", **overrides) -> DCAEConfig:
    """Model-zoo config (reference dc_ae.py:790-815 + ae_model_zoo.py:37-84)."""
    if name != "dc-ae-f32t4c128":
        raise NotImplementedError(name)
    return DCAEConfig(**overrides)


@MODELS.register_module("dc_ae")
def DC_AE(model_name: str = "dc-ae-f32t4c128", from_pretrained: Optional[str] = None, **kwargs) -> DCAE:
    known = {f.name for f in DCAEConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    cfg = dc_ae_f32(
        model_name, from_pretrained=from_pretrained,
        **{k: v for k, v in kwargs.items() if k in known},
    )
    return DCAE(cfg)
