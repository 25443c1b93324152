"""Sharded VAE (context-parallel over height) == single-device VAE on the
8-virtual-device CPU mesh — the CP-parity test the reference can't run
without a GPU cluster (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.models.hunyuan_vae.model import AutoEncoder3DConfig, AutoencoderKLCausal3D
from opensora_tpu.parallel.mesh import MeshConfig, create_mesh
from opensora_tpu.parallel.vae_sharding import make_sharded_vae_fn


def test_sharded_encode_matches_local():
    cfg = AutoEncoder3DConfig(
        block_out_channels=(8, 8, 8, 8), latent_channels=4,
        norm_num_groups=4, layers_per_block=1, dtype="fp32",
    )
    vae = AutoencoderKLCausal3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 64, 64))
    params = vae.init({"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}, x)

    mesh = create_mesh(MeshConfig(dp_size=2, sp_size=4, tp_size=1))
    enc = make_sharded_vae_fn(
        vae, params, mesh, method=AutoencoderKLCausal3D.encode
    )
    rng = jax.random.PRNGKey(7)
    z_sharded = enc(x, rng)
    z_local = vae.apply(
        params, x, rngs={"gaussian": rng}, method=AutoencoderKLCausal3D.encode
    )
    assert np.abs(np.asarray(z_sharded) - np.asarray(z_local)).max() < 1e-4
