"""Host-level tiled encode/decode for AutoencoderKLCausal3D.

Why this exists: the module's tiled methods (model.py spatial/temporal_tiled_*)
trace fine, but wrapping the WHOLE ``decode`` in one ``jax.jit`` fuses every
tile's decoder pass into a single XLA executable. XLA then keeps all tiles'
activations live across the fused graph and 768px decode blows the 16 GiB HBM
of one v5e chip (observed: "Used 20.22G of 15.75G hbm"). The reference has the
same structure but runs tiles **eagerly** on the host loop, so peak memory is
one tile (reference opensora/models/hunyuan_vae/autoencoder_kl_causal_3d.py:
443-484 spatial_tiled_decode, :516-547 temporal_tiled_decode).

This module is the TPU-correct equivalent: the tiling loop runs in Python on
the host; only the per-tile core (``_decode_core`` / ``_encode_moments``) is
jitted. jax.jit caches one executable per distinct tile shape (interior tiles
are shape-uniform, so typically 1-3 compiles), and slicing/blending/concat are
cheap eager device ops. Peak HBM = one tile's activations + the assembled
output.

Use these for large inputs at inference time; the in-module tiled methods
remain for small shapes and for tests that want a single traced graph.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from opensora_tpu.models.hunyuan_vae.model import (
    AutoencoderKLCausal3D,
    DiagonalGaussianDistribution,
    blend_tiles,
)


class TiledVAERunner:
    """Host-loop tiled encode/decode around jitted per-tile cores.

    ``model``: the (unbound) AutoencoderKLCausal3D module.
    ``variables``: its params pytree.
    ``spatial_batch``: stack up to this many same-shape spatial tiles along
    the batch axis per core call. At the 768px latent the spatial grid is
    4x4 per temporal tile (48 core dispatches total); batching the nine
    interior 32x32 tiles into ceil(9/k) calls raises conv efficiency and
    cuts dispatch count, at the price of k x one tile's activation memory
    (~1.1 GiB bf16 at the widest decoder layer per 32x32-latent tile) — so
    the cap stays small. 1 = exact round-2 behavior.
    """

    def __init__(
        self,
        model: AutoencoderKLCausal3D,
        variables,
        spatial_batch: int = 1,
    ):
        self.model = model
        self.variables = variables
        self.spatial_batch = max(1, int(spatial_batch))
        self._encode_core = jax.jit(
            lambda v, t: model.apply(v, t, True, method="_encode_moments")
        )
        self._decode_core = jax.jit(
            lambda v, t: model.apply(v, t, True, method="_decode_core")
        )

    # geometry — mirror the module's properties without binding it
    @property
    def cfg(self):
        return self.model.config

    @property
    def tile_sample_min_size(self):
        return self.cfg.sample_size

    @property
    def tile_latent_min_size(self):
        return self.cfg.sample_size // self.cfg.spatial_compression_ratio

    @property
    def tile_sample_min_tsize(self):
        return self.cfg.sample_tsize

    @property
    def tile_latent_min_tsize(self):
        return self.cfg.sample_tsize // self.cfg.time_compression_ratio

    # ---- spatial tiling (same blend math as model.py:285-334) ----
    def _run_tiles(self, core, tiles: dict):
        """Run ``core`` over ``{key: tile}``; same-shape tiles are stacked
        along batch (up to ``spatial_batch`` per call). Conv/norm are
        batch-parallel, so this matches per-tile calls up to XLA's
        batch-shape-dependent reduction blocking (~1e-5 fp32)."""
        if self.spatial_batch <= 1:
            return {k: core(self.variables, t) for k, t in tiles.items()}
        groups: dict = {}
        for k, t in tiles.items():
            groups.setdefault(t.shape, []).append(k)
        out = {}
        for keys in groups.values():
            bsz = tiles[keys[0]].shape[0]
            for s in range(0, len(keys), self.spatial_batch):
                chunk = keys[s:s + self.spatial_batch]
                if len(chunk) == 1:
                    out[chunk[0]] = core(self.variables, tiles[chunk[0]])
                    continue
                stacked = jnp.concatenate([tiles[k] for k in chunk], axis=0)
                res = core(self.variables, stacked)
                for n, k in enumerate(chunk):
                    out[k] = res[n * bsz:(n + 1) * bsz]
        return out

    def _spatial_tiled(self, x_cl, core, tile_in, tile_out):
        overlap = int(tile_in * (1 - self.cfg.tile_overlap_factor))
        blend = int(tile_out * self.cfg.tile_overlap_factor)
        limit = tile_out - blend

        ii = list(range(0, x_cl.shape[2], overlap))
        jj = list(range(0, x_cl.shape[3], overlap))
        tiles = {
            (i, j): x_cl[:, :, i:i + tile_in, j:j + tile_in, :]
            for i in ii for j in jj
        }
        done = self._run_tiles(core, tiles)
        rows = [[done[(i, j)] for j in jj] for i in ii]
        result_rows = []
        for i, row in enumerate(rows):
            result = []
            for j, tile in enumerate(row):
                if i > 0:
                    tile = blend_tiles(rows[i - 1][j], tile, blend, axis=2)
                if j > 0:
                    tile = blend_tiles(row[j - 1], tile, blend, axis=3)
                result.append(tile[:, :, :limit, :limit, :])
            result_rows.append(jnp.concatenate(result, axis=3))
        return jnp.concatenate(result_rows, axis=2)

    def _spatial_tiled_encode(self, x_cl):
        return self._spatial_tiled(
            x_cl, self._encode_core,
            self.tile_sample_min_size, self.tile_latent_min_size,
        )

    def _spatial_tiled_decode(self, z_cl):
        return self._spatial_tiled(
            z_cl, self._decode_core,
            self.tile_latent_min_size, self.tile_sample_min_size,
        )

    # ---- temporal tiling (same causal-overlap math as model.py:336-395) ----
    def _temporal_tiled(self, x_cl, core, spatial_fn, tile_t_in, tile_t_out,
                        spatial_limit):
        """Shared causal-overlap temporal loop: slice ``tile_t_in + 1``
        frames (the +1 is the causal context frame, dropped from every tile
        after the first), run ``core`` — or ``spatial_fn`` when the tile's
        spatial extent exceeds ``spatial_limit`` — then blend/crop in
        ``tile_t_out`` units. One body for encode and decode so the causal
        frame and blend logic cannot desynchronize between them."""
        overlap = int(tile_t_in * (1 - self.cfg.tile_overlap_factor))
        blend = int(tile_t_out * self.cfg.tile_overlap_factor)
        limit = tile_t_out - blend

        tiles = []
        for i in range(0, x_cl.shape[1], overlap):
            tile = x_cl[:, i:i + tile_t_in + 1]
            if self.cfg.use_spatial_tiling and (
                tile.shape[2] > spatial_limit or tile.shape[3] > spatial_limit
            ):
                tile = spatial_fn(tile)
            else:
                tile = core(self.variables, tile)
            if i > 0:
                tile = tile[:, 1:]
            tiles.append(tile)
        result = []
        for i, tile in enumerate(tiles):
            if i > 0:
                tile = blend_tiles(tiles[i - 1], tile, blend, axis=1)
                result.append(tile[:, :limit])
            else:
                result.append(tile[:, :limit + 1])
        return jnp.concatenate(result, axis=1)

    def _temporal_tiled_encode(self, x_cl):
        return self._temporal_tiled(
            x_cl, self._encode_core, self._spatial_tiled_encode,
            self.tile_sample_min_tsize, self.tile_latent_min_tsize,
            self.tile_sample_min_size,
        )

    def _temporal_tiled_decode(self, z_cl):
        return self._temporal_tiled(
            z_cl, self._decode_core, self._spatial_tiled_decode,
            self.tile_latent_min_tsize, self.tile_sample_min_tsize,
            self.tile_latent_min_size,
        )

    # ---- public API, (B, C, T, H, W), matching model.encode/decode ----
    def encode(
        self,
        x: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = True,
    ) -> jnp.ndarray:
        assert x.ndim == 5, "expected (B, C, T, H, W)"
        cfg = self.cfg
        x_cl = jnp.transpose(x, (0, 2, 3, 4, 1))
        if cfg.use_temporal_tiling and x_cl.shape[1] > self.tile_sample_min_tsize:
            moments = self._temporal_tiled_encode(x_cl)
        elif cfg.use_spatial_tiling and (
            x_cl.shape[2] > self.tile_sample_min_size
            or x_cl.shape[3] > self.tile_sample_min_size
        ):
            moments = self._spatial_tiled_encode(x_cl)
        else:
            moments = self._encode_core(self.variables, x_cl)
        posterior = DiagonalGaussianDistribution(moments, axis=-1)
        if sample_posterior:
            assert rng is not None, "sample_posterior=True requires rng"
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        z = cfg.scale_factor * (z - cfg.shift_factor)
        return jnp.transpose(z, (0, 4, 1, 2, 3))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        assert z.ndim == 5, "expected (B, C, T, H, W)"
        cfg = self.cfg
        z = z / cfg.scale_factor + cfg.shift_factor
        z_cl = jnp.transpose(z, (0, 2, 3, 4, 1))
        if cfg.use_temporal_tiling and z_cl.shape[1] > self.tile_latent_min_tsize:
            dec = self._temporal_tiled_decode(z_cl)
        elif cfg.use_spatial_tiling and (
            z_cl.shape[2] > self.tile_latent_min_size
            or z_cl.shape[3] > self.tile_latent_min_size
        ):
            dec = self._spatial_tiled_decode(z_cl)
        else:
            dec = self._decode_core(self.variables, z_cl)
        return jnp.transpose(dec, (0, 4, 1, 2, 3))

    def needs_tiling(self, z_shape) -> bool:
        """True if a (B,C,T,H,W) latent of this shape would hit a tiled path."""
        _, _, t, h, w = z_shape
        cfg = self.cfg
        return (cfg.use_temporal_tiling and t > self.tile_latent_min_tsize) or (
            cfg.use_spatial_tiling
            and (h > self.tile_latent_min_size or w > self.tile_latent_min_size)
        )

    def needs_tiling_sample(self, x_shape) -> bool:
        """True if a (B,C,T,H,W) pixel input of this shape would tile on encode."""
        _, _, t, h, w = x_shape
        cfg = self.cfg
        return (cfg.use_temporal_tiling and t > self.tile_sample_min_tsize) or (
            cfg.use_spatial_tiling
            and (h > self.tile_sample_min_size or w > self.tile_sample_min_size)
        )
