"""Encode/decode parity against the REFERENCE'S OWN HunyuanVideo causal-3D
VAE (opensora/models/hunyuan_vae/autoencoder_kl_causal_3d.py), executing on
CPU through the diffusers shim in ref_shim.py (whose group-norm Attention is
a real implementation, so the mid-block attention + causal mask run for
real). Complements test_vae.py's JAX-vs-JAX roundtrips with a torch oracle,
at tiny geometry AND the real channel geometry at reduced depth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ref_shim import import_reference_hunyuan_vae  # noqa: E402

REF = import_reference_hunyuan_vae()

from opensora_tpu.models.hunyuan_vae.model import (  # noqa: E402
    AutoEncoder3DConfig,
    AutoencoderKLCausal3D,
)
from opensora_tpu.utils.ckpt import convert_hunyuan_vae_state_dict  # noqa: E402


def _build_pair(block_out_channels, norm_num_groups, latent_channels,
                layers_per_block=1, seed=0):
    ref_cfg = REF.AutoEncoder3DConfig(
        from_pretrained=None,
        block_out_channels=tuple(block_out_channels),
        norm_num_groups=norm_num_groups,
        latent_channels=latent_channels,
        layers_per_block=layers_per_block,
    )
    torch.manual_seed(seed)
    ref = REF.AutoencoderKLCausal3D(ref_cfg).float().eval()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_hunyuan_vae_state_dict(sd)
    ours = AutoencoderKLCausal3D(AutoEncoder3DConfig(
        block_out_channels=tuple(block_out_channels),
        norm_num_groups=norm_num_groups,
        latent_channels=latent_channels,
        layers_per_block=layers_per_block,
        dtype="fp32",
    ))
    return ref, ours, {"params": params}


def _roundtrip_parity(ref, ours, variables, x, atol):
    xt = torch.from_numpy(x)
    with torch.no_grad():
        z_ref = ref.encode(xt, sample_posterior=False).numpy()
        y_ref = ref.decode(torch.from_numpy(z_ref)).numpy()

    z = ours.apply(
        variables, jnp.asarray(x), sample_posterior=False,
        method=AutoencoderKLCausal3D.encode,
    )
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=atol, rtol=1e-3)

    y = ours.apply(
        variables, jnp.asarray(z_ref), method=AutoencoderKLCausal3D.decode
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=atol, rtol=1e-3)
    return z_ref, y_ref


def test_hunyuan_vae_oracle_tiny():
    """Tiny widths, full 4-stage topology (8x spatial / 4x temporal, causal
    convs, mid-block attention with the frame-causal mask)."""
    ref, ours, variables = _build_pair(
        block_out_channels=(8, 16, 16, 16), norm_num_groups=4,
        latent_channels=4,
    )
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(1, 3, 5, 32, 32)) * 0.4).astype(np.float32)
    _roundtrip_parity(ref, ours, variables, x, atol=2e-4)


def test_hunyuan_vae_oracle_first_frame_image_semantics():
    """T=1 input must round-trip as a pure image through BOTH stacks
    (the causal first-frame special case, reference vae.py/blocks)."""
    ref, ours, variables = _build_pair(
        block_out_channels=(8, 16, 16, 16), norm_num_groups=4,
        latent_channels=4, seed=3,
    )
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(1, 3, 1, 32, 32)) * 0.4).astype(np.float32)
    z_ref, _ = _roundtrip_parity(ref, ours, variables, x, atol=2e-4)
    assert z_ref.shape[2] == 1  # (T-1)//4 + 1


def test_hunyuan_vae_oracle_real_channel_geometry():
    """The published channel geometry (128/256/512/512, 16 latent ch,
    32 groups) with layers_per_block=1 (depth-reduced; per-layer math is
    what conversion can get wrong) on a small spatial extent."""
    ref, ours, variables = _build_pair(
        block_out_channels=(128, 256, 512, 512), norm_num_groups=32,
        latent_channels=16, layers_per_block=1, seed=5,
    )
    rng = np.random.default_rng(2)
    x = (rng.normal(size=(1, 3, 5, 16, 16)) * 0.4).astype(np.float32)
    _roundtrip_parity(ref, ours, variables, x, atol=1e-3)
