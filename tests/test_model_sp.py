"""MMDiT forward with sequence-parallel attention (ring / ulysses) matches
the unsharded model on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
from opensora_tpu.parallel.context import set_mesh
from opensora_tpu.parallel.mesh import MeshConfig, create_mesh


@pytest.fixture
def mesh():
    m = create_mesh(MeshConfig(dp_size=1, sp_size=4, tp_size=2))
    set_mesh(m)
    yield m
    set_mesh(None)


def _build(backend):
    cfg = MMDiTConfig(
        in_channels=8, vec_in_dim=8, context_in_dim=16, hidden_size=64,
        mlp_ratio=2.0, num_heads=4, depth=1, depth_single_blocks=1,
        axes_dim=[8, 4, 4], qkv_bias=True, guidance_embed=False,
        cond_embed=False, attn_backend=backend, dtype="fp32",
    )
    return MMDiTModel(cfg)


def _args(B=2, L=32, Lt=8):
    r = np.random.default_rng(0)
    return (
        jnp.asarray(r.normal(size=(B, L, 8)), jnp.float32),
        jnp.zeros((B, L, 3)),
        jnp.asarray(r.normal(size=(B, Lt, 16)), jnp.float32),
        jnp.zeros((B, Lt, 3)),
        jnp.full((B,), 0.5),
        jnp.asarray(r.normal(size=(B, 8)), jnp.float32),
    )


@pytest.mark.parametrize("backend", ["ulysses:xla", "ring:xla"])
def test_sp_model_matches_unsharded(mesh, backend):
    args = _args()
    ref_model = _build("xla")
    params = ref_model.init(jax.random.PRNGKey(0), *args)
    ref = ref_model.apply(params, *args)

    sp_model = _build(backend)
    tok = NamedSharding(mesh, P("data", "sp", None))
    sharded_args = tuple(
        jax.device_put(a, tok) if a.ndim == 3 else a for a in args
    )
    out = jax.jit(lambda p, *a: sp_model.apply(p, *a))(params, *sharded_args)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-4
