"""Training-side helpers: rectified-flow targets, conditioning dropout,
visual-condition building, EMA, masked loss.

Behavioral reference: opensora/utils/train.py (update_ema:131-163,
dropout_condition:166-183, prepare_visual_condition_{causal,uncausal}
:186-407, get_batch_loss:410-450) and scripts/diffusion/train.py:363-499
(timestep sampling + x_t interpolation).

TPU design: everything here is jit-compatible pure functions; the visual
condition builder replaces the reference's per-sample Python loop with a
batched mask-select over a *statically chosen* mask type per call (the
per-sample random choice happens on host at batch assembly, where the
reference also draws it — random.choices on CPU)."""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.utils.sampling import get_res_lin_function, time_shift


# ----------------------------------------------------------------------
# rectified flow
# ----------------------------------------------------------------------


def sample_timesteps(
    rng: jax.Array,
    batch: int,
    height: int,
    width: int,
    num_frames: int,
    ae_spatial_compression: int = 16,
    patch_size: int = 2,
) -> jnp.ndarray:
    """Logit-normal t with resolution/temporal shift
    (reference scripts/diffusion/train.py:384-390)."""
    image_seq_len = (height // ae_spatial_compression) * (width // ae_spatial_compression)
    shift_alpha = get_res_lin_function()(image_seq_len * patch_size**2 / 4.0)
    shift_alpha = shift_alpha * math.sqrt(num_frames)
    t = jax.nn.sigmoid(jax.random.normal(rng, (batch,), jnp.float32))
    return time_shift(shift_alpha, t)


def rf_interpolate(
    x0: jnp.ndarray, x1: jnp.ndarray, t: jnp.ndarray, sigma_min: float = 1e-5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x_t = (1-t)·x0 + (1-(1-σ)(1-t))·x1 with velocity target
    v_t = (1-σ)·x1 - x0 (reference train.py:431-439). x0 = clean latent,
    x1 = noise; t broadcast over (B, ...)."""
    tb = t.reshape((-1,) + (1,) * (x0.ndim - 1)).astype(jnp.float32)
    x0f, x1f = x0.astype(jnp.float32), x1.astype(jnp.float32)
    x_t = (1 - tb) * x0f + (1 - (1 - sigma_min) * (1 - tb)) * x1f
    v_t = (1 - sigma_min) * x1f - x0f
    return x_t.astype(x0.dtype), v_t.astype(x0.dtype)


def dropout_condition(
    rng: jax.Array, prob: float, txt: jnp.ndarray, null_txt: jnp.ndarray
) -> jnp.ndarray:
    """CFG text dropout (reference utils/train.py:166-183)."""
    drop = jax.random.uniform(rng, (txt.shape[0],)) < prob
    drop = drop.reshape((-1,) + (1,) * (txt.ndim - 1))
    return jnp.where(drop, null_txt.astype(txt.dtype), txt)


# ----------------------------------------------------------------------
# masked loss
# ----------------------------------------------------------------------


def get_batch_loss(
    model_pred: jnp.ndarray,
    v_t: jnp.ndarray,
    masks: Optional[jnp.ndarray] = None,
    latent_shape: Optional[Tuple[int, int, int]] = None,
    patch_size: int = 2,
) -> jnp.ndarray:
    """MSE excluding conditioned padded frames (reference train.py:410-450).

    The reference drops the first/last latent frame from the loss when it is
    an i2v head/tail condition frame; here that is a per-frame weight mask
    (jit-friendly — no data-dependent slicing)."""
    pred = model_pred.astype(jnp.float32)
    target = v_t.astype(jnp.float32)
    if masks is None:
        return jnp.mean((pred - target) ** 2)

    # masks: (B, 1, T, H, W) latent-space visual-condition mask
    b = masks.shape[0]
    tdim = masks.shape[2]
    frame_mask = masks[:, 0, :, 0, 0]  # (B, T)
    head = frame_mask[:, 0]
    tail = frame_mask[:, -1]
    middle_any = jnp.any(frame_mask[:, 1:-1] > 0, axis=1) if tdim > 2 else jnp.zeros((b,), bool)
    # weight 0 on head/tail frames that are pure i2v conditioning
    w = jnp.ones((b, tdim), jnp.float32)
    drop_head = (head == 1) & (~middle_any)
    drop_tail = (tail == 1) & (~middle_any)
    w = w.at[:, 0].set(jnp.where(drop_head, 0.0, w[:, 0]))
    w = w.at[:, -1].set(jnp.where(drop_tail, 0.0, w[:, -1]))

    t_lat, h_lat, w_lat = latent_shape
    hp, wp = h_lat // patch_size, w_lat // patch_size
    # tokens are (t h w)-ordered; expand frame weights to token weights
    tok_w = jnp.repeat(w, hp * wp, axis=1)[..., None]  # (B, L, 1)
    per_tok = ((pred - target) ** 2) * tok_w
    per_sample = jnp.sum(per_tok, axis=(1, 2)) / (
        jnp.sum(tok_w, axis=(1, 2)) * pred.shape[-1] + 1e-8
    )
    return jnp.mean(per_sample)


# ----------------------------------------------------------------------
# EMA
# ----------------------------------------------------------------------


def update_ema(ema_params, params, decay: float = 0.9999):
    """EMA over fp32 master params (reference utils/train.py:131-163). On
    TPU the EMA lives as a sharded pytree updated inside the jitted step —
    no gather/flat-shard dance needed."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1 - decay), ema_params, params
    )


# ----------------------------------------------------------------------
# visual conditioning (training)
# ----------------------------------------------------------------------

MASK_CONDITIONS = (
    "t2v", "i2v_head", "i2v_tail", "i2v_loop",
    "v2v_head", "v2v_tail", "v2v_head_easy", "v2v_tail_easy",
)


def choose_mask_conditions(
    condition_config: Dict[str, float],
    batch: int,
    latent_t: int,
    time_compression: int,
    rng: np.random.Generator,
    causal: bool = True,
) -> list:
    """Host-side per-sample mask-type draw (reference train.py:219-247 uses
    random.choices with the same applicability pruning)."""
    cfg = dict(condition_config)
    if latent_t <= 1:
        return ["t2v"] * batch
    lim = 32 // time_compression + (1 if causal else 0)
    lim_easy = 64 // time_compression + (1 if causal else 0)
    if latent_t <= lim:
        cfg.pop("v2v_head", None)
        cfg.pop("v2v_tail", None)
    if latent_t <= lim_easy:
        cfg.pop("v2v_head_easy", None)
        cfg.pop("v2v_tail_easy", None)
    options = list(cfg.keys())
    weights = np.asarray([cfg[k] for k in options], np.float64)
    weights = weights / weights.sum()
    return [options[rng.choice(len(options), p=weights)] for _ in range(batch)]


def build_visual_condition(
    x0: jnp.ndarray,
    mask_conds: list,
    encode_single_frame: Callable,
    latent_full: jnp.ndarray,
    time_compression: int = 4,
    causal: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble (masks, cond) for a batch (reference train.py:186-407,
    causal variant). ``latent_full`` is the encoded full video; head/tail
    image frames are re-encoded separately via ``encode_single_frame`` to
    avoid information leakage across the causal boundary.

    Returns masks (B,1,T,H,W) and cond = concat([masks, masks*latent]) in
    channel dim — ready for ``pack`` + MMDiT cond_in."""
    B, C, T, H, W = latent_full.shape
    masks = np.zeros((B, 1, T, H, W), np.float32)
    latent = jnp.zeros_like(latent_full)

    for i, mc in enumerate(mask_conds):
        if mc == "t2v" or T <= 1:
            continue
        if mc in ("i2v_head", "i2v_loop"):
            masks[i, :, 0] = 1
            first = encode_single_frame(x0[i : i + 1, :, :1])
            latent = latent.at[i, :, :1].set(first[0])
        if mc in ("i2v_tail", "i2v_loop"):
            masks[i, :, -1] = 1
            last = encode_single_frame(x0[i : i + 1, :, -1:])
            latent = latent.at[i, :, -1:].set(last[0])
        if mc.startswith("v2v"):
            ref_t = 65 if "easy" in mc else 33
            if not causal:
                ref_t -= 1
            cond_t = (ref_t - 1) // time_compression + 1 if causal else ref_t // time_compression
            if "head" in mc:
                masks[i, :, :cond_t] = 1
                latent = latent.at[i, :, :cond_t].set(latent_full[i, :, :cond_t])
            else:
                masks[i, :, -cond_t:] = 1
                latent = latent.at[i, :, -cond_t:].set(latent_full[i, :, -cond_t:])

    masks_j = jnp.asarray(masks, latent_full.dtype)
    cond = jnp.concatenate([masks_j, masks_j * latent], axis=1)
    return masks_j, cond
