"""Autoencoder tests: causal-VAE geometry/roundtrip, DC-AE shapes, tiling
consistency, PSNR-style sanity (BASELINE config 1 shape at toy width)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensora_tpu.models.dc_ae.model import DCAEConfig, DCAE
from opensora_tpu.models.hunyuan_vae.model import (
    AutoEncoder3DConfig,
    AutoencoderKLCausal3D,
    DiagonalGaussianDistribution,
)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = AutoEncoder3DConfig(
        block_out_channels=(8, 16, 16, 16), latent_channels=4,
        norm_num_groups=4, layers_per_block=1, dtype="fp32",
    )
    vae = AutoencoderKLCausal3D(cfg)
    x = jnp.zeros((1, 3, 9, 32, 32))
    params = vae.init({"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}, x)
    return vae, params


def test_causal_vae_roundtrip_shapes(tiny_vae):
    vae, params = tiny_vae
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 9, 32, 32))
    xrec, post, z = vae.apply(params, x, rngs={"gaussian": jax.random.PRNGKey(2)})
    assert z.shape == (1, 4, 3, 4, 4)  # (9-1)/4+1 latent frames, 32/8 spatial
    assert xrec.shape == x.shape
    assert np.isfinite(np.asarray(xrec)).all()


def test_causal_vae_image_input(tiny_vae):
    vae, params = tiny_vae
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 1, 32, 32))
    z = vae.apply(
        params, x, rngs={"gaussian": jax.random.PRNGKey(2)},
        method=AutoencoderKLCausal3D.encode,
    )
    assert z.shape == (1, 4, 1, 4, 4)


def test_causal_conv3d_is_temporally_causal():
    """CausalConv3d output at frame t must not depend on frames > t.
    (The full encoder is only approximately causal — GroupNorm statistics
    span all frames, same as the reference's nn.GroupNorm.)"""
    from opensora_tpu.models.hunyuan_vae.blocks import CausalConv3d

    conv = CausalConv3d(4, 3, 1, jnp.float32, jnp.float32)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8, 8, 3))
    x2 = x1.at[:, 4:].set(jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 3)))
    params = conv.init(jax.random.PRNGKey(2), x1)
    y1 = conv.apply(params, x1)
    y2 = conv.apply(params, x2)
    assert np.allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-6)
    assert not np.allclose(np.asarray(y1[:, 4:]), np.asarray(y2[:, 4:]), atol=1e-3)


def test_diagonal_gaussian():
    rng = jax.random.PRNGKey(0)
    params = jax.random.normal(rng, (2, 8, 3, 4, 4))
    post = DiagonalGaussianDistribution(params, axis=1)
    assert post.mean.shape == (2, 4, 3, 4, 4)
    kl = post.kl()
    assert kl.shape == (2,)
    assert np.isfinite(np.asarray(kl)).all()
    det = DiagonalGaussianDistribution(params, deterministic=True, axis=1)
    assert np.allclose(np.asarray(det.sample(rng)), np.asarray(det.mean))


def test_host_tiled_runner_matches_module_tiling():
    """TiledVAERunner (host loop + jitted per-tile core, models/hunyuan_vae/
    tiled.py) must be numerically identical to the module's in-graph tiled
    paths — it exists only to cap peak HBM (one tile live, not all fused)."""
    from opensora_tpu.models.hunyuan_vae.tiled import TiledVAERunner

    cfg = AutoEncoder3DConfig(
        block_out_channels=(4, 8, 8, 8), latent_channels=4,
        norm_num_groups=4, layers_per_block=1, dtype="fp32",
        sample_size=16, sample_tsize=8,
        use_spatial_tiling=True, use_temporal_tiling=True,
    )
    vae = AutoencoderKLCausal3D(cfg)
    x = jnp.zeros((1, 3, 9, 24, 24))  # > tsize 8 and > sample 16 → both tiled
    params = vae.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}, x
    )
    runner = TiledVAERunner(vae, params)

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 9, 24, 24))
    z_mod = vae.apply(
        params, x, sample_posterior=False, method=AutoencoderKLCausal3D.encode
    )
    z_run = runner.encode(x, sample_posterior=False)
    assert runner.needs_tiling_sample(x.shape) and runner.needs_tiling(z_run.shape)
    np.testing.assert_allclose(np.asarray(z_run), np.asarray(z_mod), atol=1e-5)

    # NOTE: at toy geometry the tiled decode overshoots the input extent in
    # BOTH implementations (tail tiles each contribute `limit` px); at
    # production sizes (256px tiles / 768px frames) tiles divide exactly.
    # Parity — identical shape and values — is what matters here.
    dec_mod = vae.apply(params, z_mod, method=AutoencoderKLCausal3D.decode)
    dec_run = runner.decode(z_run)
    assert dec_run.shape == dec_mod.shape
    np.testing.assert_allclose(np.asarray(dec_run), np.asarray(dec_mod), atol=1e-4)

    # batched spatial tiles (same-shape tiles stacked along batch, capped)
    # must match the per-tile loop — conv decode is batch-parallel, so only
    # the dispatch shape changes (and with it XLA's reduction blocking:
    # observed fp32 drift 2.4e-5 on the decode path, zero on encode).
    batched = TiledVAERunner(vae, params, spatial_batch=3)
    np.testing.assert_allclose(
        np.asarray(batched.decode(z_run)), np.asarray(dec_run), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(batched.encode(x, sample_posterior=False)),
        np.asarray(z_run), atol=1e-5,
    )


def test_dc_ae_shapes():
    cfg = DCAEConfig(
        width_list=(8, 8, 16, 16, 16, 16),
        encoder_depth_list=(1, 1, 1, 1, 1, 1),
        decoder_depth_list=(1, 1, 1, 1, 1, 1),
        latent_channels=8,
        dtype="fp32",
    )
    ae = DCAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 64, 64))
    params = ae.init(jax.random.PRNGKey(0), x)
    xrec, post, z = ae.apply(params, x)
    # 32x spatial → 2x2; 4x temporal via stages 3,4 → ceil(4/2)/... = 1
    assert z.shape == (1, 8, 1, 2, 2), z.shape
    assert post is None
    assert xrec.shape[0:2] == (1, 3)
    assert np.isfinite(np.asarray(xrec)).all()
