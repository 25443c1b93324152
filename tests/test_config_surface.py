"""Every shipped config file must parse and compose (reference config tree
parity: configs/diffusion/{inference,train}, configs/vae/{inference,train}).
Guards the _base_ composition of the round-3 additions (t2i2v plugin split,
i2v train stages, high-compression training, DC-AE GAN phase)."""

import glob
import os

import pytest

from opensora_tpu.utils.config import parse_configs

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
ALL_CONFIGS = sorted(
    p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.py"), recursive=True)
    if os.sep + "plugins" + os.sep not in p  # plugins are mixins, not entries
)


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_parses(path):
    cfg = parse_configs([path])
    assert isinstance(cfg, dict) and cfg


def test_t2i2v_composition():
    cfg = parse_configs(
        [os.path.join(REPO, "configs/diffusion/inference/t2i2v_768px.py")]
    )
    assert cfg["use_t2i2v"] is True
    assert cfg["sampling_option"]["resolution"] == "768px"
    assert cfg["img_flux"]["guidance_embed"] is True
    assert cfg["cond_type"] == "i2v_head"
    # 256px variant shares the plugin
    cfg256 = parse_configs(
        [os.path.join(REPO, "configs/diffusion/inference/t2i2v_256px.py")]
    )
    assert cfg256["img_flux"] == cfg["img_flux"]


def test_i2v_train_stages_weight_image_conditioning():
    for name in ("stage1_i2v", "stage2_i2v"):
        cfg = parse_configs(
            [os.path.join(REPO, f"configs/diffusion/train/{name}.py")]
        )
        assert cfg["condition_config"]["i2v_head"] == 5
        assert cfg["model"]["cond_embed"] is True


def test_high_compression_train_uses_dcae_latents():
    cfg = parse_configs(
        [os.path.join(REPO, "configs/diffusion/train/high_compression.py")]
    )
    assert cfg["ae"]["type"] == "dc_ae"
    assert cfg["model"]["in_channels"] == 128
    assert cfg["model"]["patch_size"] == 1
    assert cfg["is_causal_vae"] is False


def test_tp_inference_mesh():
    cfg = parse_configs(
        [os.path.join(REPO, "configs/diffusion/inference/256px_tp.py")]
    )
    assert cfg["mesh"]["tp_size"] == -1 and cfg["mesh"]["sp_size"] == 1


def test_dcae_gan_phase_config():
    cfg = parse_configs(
        [os.path.join(REPO, "configs/vae/train/video_dc_ae_disc.py")]
    )
    assert cfg["disc_start"] == 0 and cfg["gen_start"] == 0
    assert cfg["discriminator"]["n_layers"] == 5
