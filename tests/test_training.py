"""Training utilities: RF interpolation golden values, conditioning dropout,
EMA, masked loss, eval loss, optimizer schedules."""

import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.utils.train import (
    choose_mask_conditions,
    dropout_condition,
    get_batch_loss,
    rf_interpolate,
    update_ema,
)
from opensora_tpu.utils.optimizer import (
    cosine_annealing_warmup_schedule,
    linear_warmup_schedule,
)


def test_rf_interpolate_golden():
    """x_t = (1-t)x0 + (1-(1-σ)(1-t))x1, v = (1-σ)x1 - x0
    (reference scripts/diffusion/train.py:431-437)."""
    x0 = jnp.full((2, 3), 2.0)
    x1 = jnp.full((2, 3), -1.0)
    t = jnp.asarray([0.0, 1.0])
    sigma_min = 1e-5
    x_t, v_t = rf_interpolate(x0, x1, t, sigma_min)
    # t=0: x_t = x0 + σ·x1
    assert np.allclose(np.asarray(x_t[0]), 2.0 + sigma_min * -1.0, atol=1e-6)
    # t=1: x_t = x1
    assert np.allclose(np.asarray(x_t[1]), -1.0, atol=1e-6)
    assert np.allclose(np.asarray(v_t), (1 - sigma_min) * -1.0 - 2.0, atol=1e-6)


def test_dropout_condition():
    txt = jnp.ones((8, 4, 2))
    null = jnp.zeros((1, 4, 2))
    out = dropout_condition(jax.random.PRNGKey(0), 1.0, txt, null)
    assert float(jnp.abs(out).max()) == 0.0  # prob 1 → all nulled
    out = dropout_condition(jax.random.PRNGKey(0), 0.0, txt, null)
    assert np.array_equal(np.asarray(out), np.asarray(txt))


def test_update_ema():
    ema = {"w": jnp.zeros((3,))}
    params = {"w": jnp.ones((3,))}
    new = update_ema(ema, params, decay=0.9)
    assert np.allclose(np.asarray(new["w"]), 0.1)


def test_masked_loss_excludes_conditioned_frames():
    B, T, H, W, ph = 1, 4, 4, 4, 2
    hp = wp = H // ph
    L = T * hp * wp
    C = 8
    pred = jnp.zeros((B, L, C))
    # target nonzero ONLY on frame 0 tokens
    target = jnp.zeros((B, L, C)).at[:, : hp * wp].set(10.0)
    masks = jnp.zeros((B, 1, T, H, W)).at[:, :, 0].set(1.0)  # i2v_head
    loss_masked = get_batch_loss(pred, target, masks, latent_shape=(T, H, W), patch_size=ph)
    loss_plain = get_batch_loss(pred, target, None)
    assert float(loss_masked) < 1e-6  # conditioned frame excluded
    assert float(loss_plain) > 0


def test_choose_mask_conditions_pruning():
    rng = np.random.default_rng(0)
    cfg = {"t2v": 0.5, "v2v_head": 0.5, "v2v_head_easy": 0.5}
    # latent_t too short for v2v: everything must fall back to t2v
    out = choose_mask_conditions(cfg, 16, latent_t=4, time_compression=4, rng=rng)
    assert set(out) == {"t2v"}
    # image: t2v only
    out = choose_mask_conditions(cfg, 4, latent_t=1, time_compression=4, rng=rng)
    assert set(out) == {"t2v"}


def test_schedules():
    lin = linear_warmup_schedule(1e-3, 10)
    assert float(lin(0)) == 0.0
    assert abs(float(lin(10)) - 1e-3) < 1e-9
    assert abs(float(lin(100)) - 1e-3) < 1e-9
    cos = cosine_annealing_warmup_schedule(1e-3, 10, 100, eta_min=1e-6)
    assert float(cos(10)) <= 1e-3 + 1e-9
    assert float(cos(100)) < float(cos(50))


def test_rf_eval_loss():
    from opensora_tpu.eval.rf_loss import rf_eval_loss

    def model_fn(img, timesteps, **kw):
        return jnp.zeros_like(img)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))
    losses = rf_eval_loss(model_fn, x0, {}, jax.random.PRNGKey(1))
    assert "eval_loss_mean" in losses
    assert np.isfinite(float(losses["eval_loss_mean"]))
