"""Config system: _base_ inheritance, _delete_, CLI overrides, aliases."""

import os

import pytest

from opensora_tpu.utils.config import Config, load_config, parse_configs


@pytest.fixture
def cfg_dir(tmp_path):
    (tmp_path / "base.py").write_text(
        "lr = 1e-4\n"
        "model = dict(type='flux', hidden_size=3072, depth=19)\n"
        "ae = dict(type='hunyuan_vae', latent_channels=16)\n"
    )
    (tmp_path / "child.py").write_text(
        "_base_ = ['base.py']\n"
        "model = dict(depth=2)\n"
        "ae = dict(_delete_=True, type='dc_ae')\n"
        "sampling_option = dict(num_steps=50, guidance=4.0)\n"
    )
    return tmp_path


def test_base_inheritance_and_delete(cfg_dir):
    cfg = load_config(str(cfg_dir / "child.py"))
    assert cfg.model.type == "flux"       # inherited
    assert cfg.model.depth == 2           # overridden
    assert cfg.model.hidden_size == 3072  # merged
    assert cfg.ae == {"type": "dc_ae"}    # _delete_ replaced the base dict
    assert cfg.lr == 1e-4


def test_cli_overrides_and_aliases(cfg_dir):
    cfg = parse_configs([
        str(cfg_dir / "child.py"),
        "--model.hidden_size", "128",
        "--lr", "2e-5",
        "--num-steps", "10",
        "--resolution", "256px",
        "--model.new_field", "hello",
    ])
    assert cfg.model.hidden_size == 128      # int-typed conversion
    assert cfg.lr == 2e-5                    # float-typed
    assert cfg.sampling_option.num_steps == 10   # alias
    assert cfg.sampling_option.resolution == "256px"
    assert cfg.model.new_field == "hello"    # new key as string


def test_bool_and_list_conversion(cfg_dir):
    (cfg_dir / "b.py").write_text("flag = True\nsizes = [1, 2]\n")
    cfg = parse_configs([str(cfg_dir / "b.py"), "--flag", "false", "--sizes", "[3,4,5]"])
    assert cfg.flag is False
    assert cfg.sizes == [3, 4, 5]


def test_ae_spatial_compression_env(cfg_dir):
    (cfg_dir / "c.py").write_text("ae_spatial_compression = 32\n")
    parse_configs([str(cfg_dir / "c.py")])
    assert os.environ["AE_SPATIAL_COMPRESSION"] == "32"
    os.environ["AE_SPATIAL_COMPRESSION"] = "16"  # restore
