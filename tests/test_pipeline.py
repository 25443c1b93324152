"""Pipeline parallelism: GPipe SPMD schedule == sequential layer stack,
forward AND backward (reference stage slicing:
models/mmdit/distributed.py:638-669, 853-883)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensora_tpu.parallel.pipeline import (
    create_pipeline_mesh,
    merge_scan_params,
    pipeline_apply,
    shard_pipeline_params,
    split_scan_params,
)

L, D, MLP = 8, 16, 32  # 8 layers → 4 stages × 2 layers


def _layer(p, x):
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _stack(x, params):
    """Sequential reference: scan over all L layers."""
    def body(h, p):
        return _layer(p, h), None
    out, _ = jax.lax.scan(body, x, params)
    return out


def _stage_fn(stage_params, x):
    """One pipeline stage = inner scan over its L/S layers."""
    def body(h, p):
        return _layer(p, h), None
    out, _ = jax.lax.scan(body, x, stage_params)
    return out


@pytest.fixture(scope="module")
def setup():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "w1": 0.3 * jax.random.normal(k1, (L, D, MLP)),
        "b1": jnp.zeros((L, MLP)),
        "w2": 0.3 * jax.random.normal(k2, (L, MLP, D)),
    }
    x_mb = jax.random.normal(k3, (6, 2, D))  # 6 microbatches of (2, D)
    mesh = create_pipeline_mesh(pp_size=4)
    staged = shard_pipeline_params(split_scan_params(params, 4), mesh, "pp")
    return params, staged, x_mb, mesh


def test_split_merge_roundtrip(setup):
    params, _, _, _ = setup
    rt = merge_scan_params(split_scan_params(params, 4))
    for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_forward_matches_sequential(setup):
    params, staged, x_mb, mesh = setup
    ref = jax.vmap(lambda x: _stack(x, params))(x_mb)
    out = jax.jit(
        lambda p, x: pipeline_apply(_stage_fn, p, x, mesh=mesh, axis="pp")
    )(staged, x_mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_backward_matches_sequential(setup):
    params, staged, x_mb, mesh = setup

    def loss_pipe(p, x):
        return (pipeline_apply(_stage_fn, p, x, mesh=mesh, axis="pp") ** 2).mean()

    def loss_ref(p, x):
        return (jax.vmap(lambda xi: _stack(xi, p)) (x) ** 2).mean()

    g_pipe = jax.jit(jax.grad(loss_pipe))(staged, x_mb)
    g_ref = jax.grad(loss_ref)(params, x_mb)
    g_pipe = merge_scan_params(g_pipe)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pipeline_composes_with_data_axis(setup):
    """pp can coexist with a data axis on the same mesh (2×4 devices)."""
    params, _, x_mb, _ = setup
    mesh = create_pipeline_mesh(pp_size=4, data_size=2)
    staged = shard_pipeline_params(split_scan_params(params, 4), mesh, "pp")
    out = jax.jit(
        lambda p, x: pipeline_apply(_stage_fn, p, x, mesh=mesh, axis="pp")
    )(staged, x_mb)
    ref = jax.vmap(lambda x: _stack(x, params))(x_mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
