"""Pipeline-parallel MMDiT TRAIN-STEP parity vs the GSPMD default — the
integration-level proof of the equivalence claimed at the primitive level
(test_pipeline.py). Reference slices the MMDiT block list over stages and
runs GPipe (opensora/models/mmdit/distributed.py:638-669, 853-883;
scripts/diffusion/train.py:442-458)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
from opensora_tpu.training.diffusion import (
    TrainState,
    make_train_step,
    shard_state,
)
from opensora_tpu.training.pp import (
    create_pp_mesh,
    make_pp_forward,
    pp_state_shardings,
)

B, L, LT = 8, 32, 8  # n_micro=4 → microbatch 2, data-shardable over data=2


def _cfg():
    return MMDiTConfig(
        in_channels=8, vec_in_dim=16, context_in_dim=24, hidden_size=64,
        mlp_ratio=2.0, num_heads=4, axes_dim=[4, 6, 6], depth=4,
        depth_single_blocks=8, qkv_bias=True, guidance_embed=False,
        cond_embed=False, attn_backend="xla", dtype="fp32",
        param_dtype="fp32",
    )


def _batch(rng):
    ks = jax.random.split(rng, 4)
    return {
        "x0": jax.random.normal(ks[0], (B, L, 8)),
        "img_ids": jnp.zeros((B, L, 3)),
        "txt": jax.random.normal(ks[1], (B, LT, 24)),
        "txt_ids": jnp.zeros((B, LT, 3)),
        "y_vec": jax.random.normal(ks[2], (B, 16)),
        "shift_alpha": jnp.ones((B,)),
        "null_txt": jnp.zeros((1, LT, 24)),
        "null_vec": jnp.zeros((1, 16)),
    }


@pytest.fixture(scope="module")
def setup():
    model = MMDiTModel(_cfg())
    batch = _batch(jax.random.PRNGKey(7))
    params = model.init(
        jax.random.PRNGKey(0), batch["x0"], batch["img_ids"], batch["txt"],
        batch["txt_ids"], jnp.full((B,), 0.5), batch["y_vec"],
    )["params"]
    tx = optax.adamw(1e-3)
    return model, batch, params, tx


def _run_gspmd(model, batch, params, tx):
    from opensora_tpu.parallel.mesh import create_mesh

    mesh = create_mesh({"dp_size": 2, "sp_size": 2, "tp_size": 2})
    state = TrainState.create(params, tx, ema=True)
    state, _ = shard_state(mesh, state)
    step = make_train_step(model, tx)
    jstep = jax.jit(step)
    new_state, metrics = jstep(state, batch, jax.random.PRNGKey(42))
    return new_state, metrics


def _run_pp(model, batch, params, tx, n_micro=4):
    mesh = create_pp_mesh(pp=4, data=2)
    state = TrainState.create(params, tx, ema=True)
    shardings = pp_state_shardings(mesh, state)
    state = jax.device_put(state, shardings)
    fwd = make_pp_forward(model, mesh, n_micro=n_micro)
    step = make_train_step(model, tx, forward_fn=fwd)
    jstep = jax.jit(
        step, in_shardings=(shardings, None, None),
        out_shardings=(shardings, None),
    )
    new_state, metrics = jstep(state, batch, jax.random.PRNGKey(42))
    return new_state, metrics


def test_pp_train_step_matches_gspmd(setup):
    """Same params, same batch, same RNG → same loss/grad-norm/updated
    params through the pipeline schedule as through plain GSPMD."""
    model, batch, params, tx = setup
    s_ref, m_ref = _run_gspmd(model, batch, params, tx)
    s_pp, m_pp = _run_pp(model, batch, params, tx)

    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_ref["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(m_pp["grad_norm"]), float(m_ref["grad_norm"]), rtol=2e-4
    )
    for (pa, a), (pb, b) in zip(
        jax.tree.flatten_with_path(s_pp.params)[0][:50],
        jax.tree.flatten_with_path(s_ref.params)[0][:50],
    ):
        assert pa == pb
        # adamw divides by sqrt(nu): near-zero grad elements amplify fp32
        # reduction-order noise between the two schedules ~lr-scale
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=str(pa)
        )


def test_pp_forward_matches_plain(setup):
    """Forward-only parity at fp32 (no train-step noise sources)."""
    model, batch, params, tx = setup
    mesh = create_pp_mesh(pp=4, data=2)
    fwd = make_pp_forward(model, mesh, n_micro=4)
    t = jnp.full((B,), 0.5)
    ref = model.apply(
        {"params": params}, batch["x0"], batch["img_ids"], batch["txt"],
        batch["txt_ids"], t, batch["y_vec"],
    )
    out = jax.jit(
        lambda p: fwd(
            p, img=batch["x0"], img_ids=batch["img_ids"], txt=batch["txt"],
            txt_ids=batch["txt_ids"], timesteps=t, y_vec=batch["y_vec"],
        )
    )(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pp_opt_state_path_matched_sharding(setup):
    """Regression: this config's img_in kernel (8, 64) shares its shape with
    the depth-8 single_blocks stacked biases — a shape-keyed opt-state match
    replicated those moments (defeating the PP memory win). Path-suffix
    matching must shard every block-stack moment over 'pp'."""
    from jax.tree_util import keystr, tree_flatten_with_path

    model, batch, params, tx = setup
    mesh = create_pp_mesh(pp=4, data=2)
    state = TrainState.create(params, tx, ema=True)
    sh = pp_state_shardings(mesh, state)
    checked = 0
    for path, s in tree_flatten_with_path(
        sh.opt_state, is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding)
    )[0]:
        ps = keystr(path)
        if "single_blocks" in ps or "double_blocks" in ps:
            assert len(s.spec) > 0 and s.spec[0] == "pp", (ps, s.spec)
            checked += 1
    assert checked > 0


def test_pp_requires_divisible_depth(setup):
    model, *_ = setup
    mesh = create_pp_mesh(pp=4, data=2)
    bad = MMDiTModel(MMDiTConfig(**{**_cfg().__dict__, "depth": 3}))
    with pytest.raises(ValueError):
        make_pp_forward(bad, mesh, n_micro=4)


def test_pp_forward_with_cond_and_guidance():
    """The 11B config runs cond_embed + guidance_embed; the PP forward must
    thread cond/guidance through prepare_block_inputs identically."""
    cfg = MMDiTConfig(
        in_channels=8, vec_in_dim=16, context_in_dim=24, hidden_size=64,
        mlp_ratio=2.0, num_heads=4, axes_dim=[4, 6, 6], depth=2,
        depth_single_blocks=2, qkv_bias=True, guidance_embed=True,
        cond_embed=True, attn_backend="xla", dtype="fp32",
        param_dtype="fp32",
    )
    model = MMDiTModel(cfg)
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    t = jnp.full((B,), 0.5)
    args = dict(
        img=jax.random.normal(ks[0], (B, L, 8)),
        img_ids=jnp.zeros((B, L, 3)),
        txt=jax.random.normal(ks[1], (B, LT, 24)),
        txt_ids=jnp.zeros((B, LT, 3)),
        timesteps=t,
        y_vec=jax.random.normal(ks[2], (B, 16)),
        cond=jax.random.normal(ks[3], (B, L, 12)),
        guidance=jnp.full((B,), 4.0),
    )
    params = model.init(ks[4], *args.values())["params"]
    ref = model.apply({"params": params}, *args.values())
    mesh = create_pp_mesh(pp=2, data=2)
    fwd = make_pp_forward(model, mesh, n_micro=4)
    out = jax.jit(lambda p: fwd(p, **args))(params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_pp_tp_train_step_matches_pp(setup):
    """PP × TP hybrid (reference HybridParallelPlugin tp×pp,
    utils/train.py:100-128): stage params additionally tp-shard their
    qkv/proj/mlp features; 'tp' stays a GSPMD auto axis inside the
    shard_map body (pipeline_apply auto_axes). Same data/RNG → the same
    loss and grad-norm as pure PP (both schedules are exact)."""
    model, batch, params, tx = setup
    _, m_pp = _run_pp(model, batch, params, tx)
    mesh = create_pp_mesh(pp=2, data=2, tp=2)
    state = TrainState.create(params, tx, ema=True)
    shardings = pp_state_shardings(mesh, state)
    state = jax.device_put(state, shardings)
    fwd = make_pp_forward(model, mesh, n_micro=4)
    step = make_train_step(model, tx, forward_fn=fwd)
    jstep = jax.jit(
        step, in_shardings=(shardings, None, None),
        out_shardings=(shardings, None),
    )
    _, m = jstep(state, batch, jax.random.PRNGKey(42))
    np.testing.assert_allclose(float(m["loss"]), float(m_pp["loss"]), rtol=2e-5)
    np.testing.assert_allclose(
        float(m["grad_norm"]), float(m_pp["grad_norm"]), rtol=2e-4
    )
