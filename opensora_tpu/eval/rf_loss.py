"""Rectified-flow evaluation loss on fixed timesteps.

Reference lineage: Open-Sora 1.2 tracked RF eval loss on fixed validation
sets at equidistant timesteps as the main training-quality signal
(docs/report_03.md:129-147; the eval code itself is absent from the
reference tree). Eval loss = MSE(model(x_t, t), v_t) averaged over a fixed
grid of t, fixed noise, fixed data — deterministic between runs."""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from opensora_tpu.utils.train import rf_interpolate


def rf_eval_loss(
    model_fn: Callable,
    x0: jnp.ndarray,
    model_kwargs: Dict,
    rng: jax.Array,
    timesteps: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
    sigma_min: float = 1e-5,
) -> Dict[str, jnp.ndarray]:
    """Per-timestep and mean eval losses for packed latents x0 (B, L, C)."""
    x1 = jax.random.normal(rng, x0.shape, jnp.float32)
    losses = {}
    total = 0.0
    for tv in timesteps:
        t = jnp.full((x0.shape[0],), tv, jnp.float32)
        x_t, v_t = rf_interpolate(x0, x1, t, sigma_min)
        pred = model_fn(img=x_t, timesteps=t, **model_kwargs)
        loss = jnp.mean((pred.astype(jnp.float32) - v_t.astype(jnp.float32)) ** 2)
        losses[f"eval_loss_t{tv}"] = loss
        total = total + loss
    losses["eval_loss_mean"] = total / len(timesteps)
    return losses
