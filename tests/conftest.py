"""Test config: force an 8-virtual-device CPU platform so multi-chip
sharding paths (mesh/pjit/shard_map) are exercised without TPU hardware.

Note: the env var JAX_PLATFORMS alone is not enough in environments where a
TPU plugin registers itself programmatically (it wins over the env var), so
we also set the config explicitly before any backend is initialized.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: repeat suite runs skip XLA recompiles (the single
# host core makes cold compiles the dominant cost of the heavier tests).
_cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_global_state():
    """Tests that set process-global state must not leak it into later
    tests:
    - a global mesh (train CLI, sharding suites) makes the model's
      with_sharding_constraint hints reference devices/axes from a dead
      context (observed: test_train_cli -> test_lora ValueError);
    - parse_configs writes the AE_SPATIAL_COMPRESSION env side-channel
      (observed: test_config_surface parsing high_compression.py set 32 and
      broke test_data's pack/unpack at the default 16)."""
    ae = os.environ.get("AE_SPATIAL_COMPRESSION")
    yield
    from opensora_tpu.parallel.context import set_mesh

    set_mesh(None)
    if ae is None:
        os.environ.pop("AE_SPATIAL_COMPRESSION", None)
    else:
        os.environ["AE_SPATIAL_COMPRESSION"] = ae
