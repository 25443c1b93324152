"""End-to-end tiny t2v: config → models → schedule → denoise → unpack →
VAE decode. Exercises the same call path as the reference's
scripts/diffusion/inference.py main loop (SURVEY.md §3.1) at toy scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensora_tpu.models.hunyuan_vae.model import AutoEncoder3DConfig, AutoencoderKLCausal3D
from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
from opensora_tpu.models.text.conditioner import HFEmbedder
from opensora_tpu.models.text.clip import clip_small_test_config
from opensora_tpu.models.text.t5 import t5_small_test_config
from opensora_tpu.utils.api import ModelBundle, prepare_api
from opensora_tpu.utils.sampling import SamplingOption, sanitize_sampling_option


@pytest.fixture(scope="module")
def tiny_models():
    rng = jax.random.PRNGKey(0)

    mmdit_cfg = MMDiTConfig(
        in_channels=16, vec_in_dim=32, context_in_dim=64, hidden_size=64,
        mlp_ratio=2.0, num_heads=2, depth=1, depth_single_blocks=1,
        axes_dim=[8, 12, 12], qkv_bias=True, guidance_embed=True,
        cond_embed=True, attn_backend="xla", dtype="fp32",
    )
    mmdit = MMDiTModel(mmdit_cfg)
    B, Li, Lt = 3, 8, 16
    mmdit_vars = mmdit.init(
        rng,
        jnp.zeros((B, Li, 16)), jnp.zeros((B, Li, 3)),
        jnp.zeros((B, Lt, 64)), jnp.zeros((B, Lt, 3)),
        jnp.zeros((B,)), jnp.zeros((B, 32)),
        jnp.zeros((B, Li, 20)), jnp.zeros((B,)),
    )

    vae_cfg = AutoEncoder3DConfig(
        block_out_channels=(8, 8, 8, 8), latent_channels=4,
        norm_num_groups=4, layers_per_block=1, dtype="fp32",
    )
    vae = AutoencoderKLCausal3D(vae_cfg)
    vae_vars = vae.init(
        {"params": rng, "gaussian": rng}, jnp.zeros((1, 3, 5, 32, 32))
    )

    t5_cfg = t5_small_test_config()
    t5_cfg.d_model = 64
    t5_cfg.dtype = "fp32"
    t5 = HFEmbedder("", max_length=16, t5_config=t5_cfg)

    clip_cfg = clip_small_test_config()
    clip_cfg.hidden_size = 32
    clip_cfg.dtype = "fp32"
    clip = HFEmbedder("clip-fallback", max_length=16, clip_config=clip_cfg)
    return (
        ModelBundle(mmdit, mmdit_vars),
        ModelBundle(vae, vae_vars),
        t5,
        clip,
    )


def test_t2v_tiny(tiny_models):
    model, ae, t5, clip = tiny_models
    api_fn = prepare_api(model, ae, t5, clip)
    opt = sanitize_sampling_option(
        SamplingOption(
            height=32, width=32, num_frames=5, num_steps=2,
            guidance=4.0, guidance_img=1.0, seed=42, is_causal_vae=True,
        )
    )
    x = api_fn(opt, cond_type="t2v", text=["a cat playing piano"], channel=16)
    x = np.asarray(x)
    assert x.shape == (1, 3, 5, 32, 32)
    assert np.isfinite(x).all()


def test_t2v_sequential_cfg_matches_batched(tiny_models):
    """cfg_batched=False (three sequential B=1 passes per step — the
    768px single-chip memory mode) must produce the same video as the
    3-way-batched CFG up to XLA reassociation."""
    model, ae, t5, clip = tiny_models
    api_fn = prepare_api(model, ae, t5, clip)
    kw = dict(
        height=32, width=32, num_frames=5, num_steps=2,
        guidance=4.0, guidance_img=1.05, seed=42, is_causal_vae=True,
    )
    batched = np.asarray(
        api_fn(sanitize_sampling_option(SamplingOption(**kw)),
               text=["a cat"], channel=16)
    )
    seq = np.asarray(
        api_fn(sanitize_sampling_option(SamplingOption(**kw, cfg_batched=False)),
               text=["a cat"], channel=16)
    )
    np.testing.assert_allclose(seq, batched, rtol=2e-4, atol=2e-4)


def test_t2v_deterministic(tiny_models):
    model, ae, t5, clip = tiny_models
    api_fn = prepare_api(model, ae, t5, clip)
    opt = sanitize_sampling_option(
        SamplingOption(height=32, width=32, num_frames=1, num_steps=2, seed=7,
                       guidance_img=1.0, is_causal_vae=True)
    )
    a = np.asarray(api_fn(opt, text=["x"], channel=16))
    b = np.asarray(api_fn(opt, text=["x"], channel=16))
    assert np.array_equal(a, b)


def test_t2i_single_frame(tiny_models):
    model, ae, t5, clip = tiny_models
    api_fn = prepare_api(model, ae, t5, clip)
    opt = sanitize_sampling_option(
        SamplingOption(height=32, width=32, num_frames=1, num_steps=2, seed=1,
                       guidance_img=1.0, is_causal_vae=True)
    )
    x = np.asarray(api_fn(opt, text=["a dog"], channel=16))
    assert x.shape == (1, 3, 1, 32, 32)
