"""VAE training losses: reconstruction + LPIPS + KL, GAN generator /
discriminator objectives.

Behavioral reference: opensora/models/vae/losses.py:86-223 (VAELoss,
GeneratorLoss with adaptive grad-norm weight, DiscriminatorLoss
hinge/vanilla/wgan-gp, lecam_reg) and lpips.py (VGG16 perceptual).

JAX design: losses are pure functions; the adaptive generator weight takes
the two gradients explicitly (the caller computes them with jax.grad against
the decoder's last-layer kernel — no autograd.grad side channel)."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def l1(x, y):
    return jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))


def batch_mean(x):
    return jnp.mean(x.reshape(x.shape[0], -1), axis=-1).mean()


def adopt_weight(weight: float, global_step, threshold: int = 0, value: float = 0.0):
    return jnp.where(global_step < threshold, value, weight)


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real.astype(jnp.float32)))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake.astype(jnp.float32)))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real.astype(jnp.float32)))
        + jnp.mean(jax.nn.softplus(logits_fake.astype(jnp.float32)))
    )


def wgan_gp_loss(logits_real, logits_fake):
    return 0.5 * (-logits_real.astype(jnp.float32).mean() + logits_fake.astype(jnp.float32).mean())


def lecam_reg(real_pred, fake_pred, ema_real_pred, ema_fake_pred):
    """LeCam regularization (reference losses.py:60-66)."""
    return jnp.mean(jax.nn.relu(real_pred - ema_fake_pred) ** 2) + jnp.mean(
        jax.nn.relu(ema_real_pred - fake_pred) ** 2
    )


def vae_loss(
    video: jnp.ndarray,
    recon_video: jnp.ndarray,
    posterior,
    logvar: jnp.ndarray,
    perceptual_loss_fn: Optional[Callable] = None,
    perceptual_loss_weight: float = 1.0,
    kl_loss_weight: float = 5e-4,
) -> Dict[str, jnp.ndarray]:
    """VAELoss.forward (reference losses.py:115-153). video/recon:
    (B, C, T, H, W); frames are folded into batch for LPIPS."""
    b, c, t, h, w = video.shape
    vid = video.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    rec = recon_video.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)

    recon = l1(vid, rec)
    if perceptual_loss_fn is not None:
        perceptual = perceptual_loss_fn(vid, rec)
    else:
        perceptual = jnp.zeros((b * t, 1, 1, 1), jnp.float32)
    nll = recon + perceptual * perceptual_loss_weight
    nll = nll / jnp.exp(logvar) + logvar

    nll_loss = batch_mean(nll)
    recon_loss = batch_mean(recon)
    numel = vid.size // vid.shape[0]
    perceptual_loss = batch_mean(perceptual) * numel

    if posterior is None:
        kl_loss = jnp.zeros((), jnp.float32)
    else:
        kl_loss = jnp.mean(posterior.kl())
    return {
        "nll_loss": nll_loss,
        "kl_loss": kl_loss * kl_loss_weight,
        "recon_loss": recon_loss,
        "perceptual_loss": perceptual_loss,
    }


def adaptive_generator_weight(
    nll_grad_last: jnp.ndarray, g_grad_last: jnp.ndarray, disc_weight: float = 0.5
) -> jnp.ndarray:
    """Adaptive GAN weight = |∇nll| / |∇g| on the decoder's last layer
    (reference losses.py:163-170); caller supplies both gradients."""
    d_weight = jnp.linalg.norm(nll_grad_last) / (jnp.linalg.norm(g_grad_last) + 1e-4)
    d_weight = jnp.clip(d_weight, 0.0, 1e4)
    return jax.lax.stop_gradient(d_weight) * disc_weight


def generator_loss(
    logits_fake: jnp.ndarray,
    global_step,
    d_weight: jnp.ndarray | float = 1.0,
    disc_factor: float = 1.0,
    gen_start: int = 2001,
):
    g_loss = -jnp.mean(logits_fake.astype(jnp.float32))
    factor = adopt_weight(disc_factor, global_step, threshold=gen_start)
    return d_weight * factor * g_loss, g_loss


def discriminator_loss(
    logits_real: jnp.ndarray,
    logits_fake: jnp.ndarray,
    global_step,
    disc_factor: float = 1.0,
    disc_start: int = 2001,
    disc_loss_type: str = "hinge",
):
    fn = {"hinge": hinge_d_loss, "vanilla": vanilla_d_loss, "wgan-gp": wgan_gp_loss}[
        disc_loss_type
    ]
    factor = adopt_weight(disc_factor, global_step, threshold=disc_start)
    return factor * fn(logits_real, logits_fake)
