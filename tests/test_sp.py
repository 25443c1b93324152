"""Sequence-parallel attention (Ulysses + ring) == full attention, on an
8-virtual-device CPU mesh. This is the multi-device test strategy the
reference lacks (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from opensora_tpu.ops.attention import xla_attention
from opensora_tpu.ops.sp import ring_attention, ulysses_attention
from opensora_tpu.parallel.mesh import MeshConfig, create_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(dp_size=2, sp_size=4, tp_size=1))


def _inputs(mesh, B=2, L=64, H=4, D=32):
    qkv = [
        jax.random.normal(jax.random.PRNGKey(i), (B, L, H, D), jnp.float32)
        for i in range(3)
    ]
    sharding = NamedSharding(mesh, P("data", "sp", None, None))
    return [jax.device_put(x, sharding) for x in qkv]


def _reference(q, k, v):
    out = xla_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    )
    return out.transpose(0, 2, 1, 3)


def test_ulysses_matches_full(mesh):
    q, k, v = _inputs(mesh)
    out = ulysses_attention(q, k, v, mesh, backend="xla")
    ref = _reference(q, k, v)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_ring_matches_full(mesh):
    q, k, v = _inputs(mesh)
    out = ring_attention(q, k, v, mesh, backend="xla")
    ref = _reference(q, k, v)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-4


def test_ulysses_under_jit(mesh):
    q, k, v = _inputs(mesh)
    f = jax.jit(lambda a, b, c: ulysses_attention(a, b, c, mesh, backend="xla"))
    out = f(q, k, v)
    ref = _reference(q, k, v)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_ring_backward_matches_full(mesh):
    q, k, v = _inputs(mesh)

    def loss_ring(a, b, c):
        return (ring_attention(a, b, c, mesh, backend="xla") ** 2).sum()

    def loss_ref(a, b, c):
        return (_reference(a, b, c) ** 2).sum()

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


def test_ring_pallas_interpret_matches_xla(mesh):
    """Ring with the Pallas kernels (interpret mode) == ring with einsums:
    validates the partial_flash_backward path used on TPU."""
    q, k, v = _inputs(mesh, B=2, L=64, H=2, D=128)

    out_p = ring_attention(q, k, v, mesh, backend="pallas_interpret")
    out_x = ring_attention(q, k, v, mesh, backend="xla")
    assert np.abs(np.asarray(out_p) - np.asarray(out_x)).max() < 1e-4

    gp = jax.grad(
        lambda a, b, c: (ring_attention(a, b, c, mesh, backend="pallas_interpret") ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    gx = jax.grad(
        lambda a, b, c: (ring_attention(a, b, c, mesh, backend="xla") ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b in zip(gp, gx):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-3
