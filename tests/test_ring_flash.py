"""Pallas-RDMA ring flash attention vs full attention (interpret mode on a
4-virtual-device single-axis mesh — interpret-mode remote DMA requires a
single named mesh axis and scalar logical ids)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensora_tpu.ops.attention import xla_attention
from opensora_tpu.ops.ring_flash import ring_flash_attention


@pytest.fixture(scope="module")
def mesh():
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    return Mesh(np.asarray(devs[:4]), ("sp",))


def _qkv(L=512, B=1, H=2, D=128):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (B, H, L, D), jnp.float32) for k in ks)


def test_ring_flash_matches_full(mesh):
    q, k, v = _qkv()
    out, lse = ring_flash_attention(
        q, k, v, mesh, block_q=128, block_k=128, interpret=True
    )
    ref = xla_attention(q, k, v)
    assert jnp.abs(out - ref).max() < 5e-5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    ref_lse = jax.scipy.special.logsumexp(s, axis=-1)[..., None]
    assert jnp.abs(lse - ref_lse).max() < 1e-5


def test_ring_flash_causal_global_offsets(mesh):
    """Frame-causal masking must use GLOBAL row/col indices: each ring hop's
    KV shard originates on a different device."""
    q, k, v = _qkv()
    out, _ = ring_flash_attention(
        q, k, v, mesh, block_q=128, block_k=128, causal_block=128, interpret=True
    )
    ref = xla_attention(q, k, v, causal_block=128)
    assert jnp.abs(out - ref).max() < 5e-5


def test_attention_dispatcher_ring_rdma(mesh):
    """attention(..., backend='ring_rdma') routes through the RDMA kernel
    (single-axis mesh; interpret on CPU) and matches the dense path."""
    from opensora_tpu.ops.attention import attention
    from opensora_tpu.parallel.context import set_mesh

    B, L, H, D = 1, 512, 2, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, L, H, D), jnp.float32) for kk in ks)
    set_mesh(mesh)
    try:
        out = attention(q, k, v, backend="ring_rdma")
    finally:
        set_mesh(None)
    ref = attention(q, k, v, backend="xla")
    assert out.shape == (B, L, H * D)
    assert jnp.abs(out - ref).max() < 5e-5


def test_flat_neighbor_id_multi_axis_mesh():
    """Ring neighbors on a (data=2, sp=2, tp=2) mesh must stay within the
    same (data, tp) group — the bare sp index would cross groups. Interpret
    mode can't run multi-axis LOGICAL DMA, so the id math is validated via
    plain shard_map against row-major flattened mesh coordinates."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from opensora_tpu.ops.ring_flash import flat_neighbor_id

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 2, 2), ("data", "sp", "tp"))
    mesh_axes = tuple(zip(mesh.axis_names, mesh.devices.shape))

    def per_device(_):
        return jnp.stack(
            [flat_neighbor_id("sp", 1, mesh_axes),
             flat_neighbor_id("sp", -1, mesh_axes)]
        )[None]

    x = jnp.zeros((8, 1))
    got = shard_map(
        per_device, mesh=mesh,
        in_specs=P(("data", "sp", "tp")), out_specs=P(("data", "sp", "tp")),
    )(x)
    got = np.asarray(got)  # row i = flat logical id i → [right, left]
    d, s, t = 2, 2, 2
    for i in range(8):
        di, si, ti = i // (s * t), (i // t) % s, i % t
        right = di * s * t + ((si + 1) % s) * t + ti
        left = di * s * t + ((si - 1) % s) * t + ti
        assert got[i, 0] == right and got[i, 1] == left, (i, got[i])


def test_ring_flash_backward_matches_full(mesh):
    """RDMA ring backward (rotating dk/dv accumulators) vs dense-attention
    grads — mirrors ops/sp.py::_ring_bwd semantics."""
    q, k, v = _qkv()
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

    def loss_ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, mesh, block_q=128, block_k=128, interpret=True
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        err = float(jnp.abs(gr - gf).max())
        scale = float(jnp.abs(gf).max())
        assert err < 2e-4 * max(scale, 1.0), (name, err, scale)


def test_ring_flash_backward_causal(mesh):
    """Backward with frame-causal masking at global offsets."""
    q, k, v = _qkv()
    w = jax.random.normal(jax.random.PRNGKey(3), q.shape, jnp.float32)

    def loss_ring(q, k, v):
        out, _ = ring_flash_attention(
            q, k, v, mesh, block_q=128, block_k=128, causal_block=128,
            interpret=True,
        )
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal_block=128) * w)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        err = float(jnp.abs(gr - gf).max())
        scale = float(jnp.abs(gf).max())
        assert err < 2e-4 * max(scale, 1.0), (name, err, scale)
