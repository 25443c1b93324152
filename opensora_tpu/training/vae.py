"""VAE/GAN training: generator + discriminator steps.

Behavioral reference: scripts/vae/train.py:323-593 — full encode+decode
forward, VAELoss (L1 + LPIPS + logvar-NLL + weighted KL), generator loss
with adaptive grad-norm weight after gen_start, separate discriminator
optimizer with hinge loss after disc_start, mixed image/video strategy, EMA.

TPU design: two jitted steps (generator, discriminator) sharing the
reconstruction; the adaptive weight's two last-layer gradients come from
jax.grad on scalar heads (no autograd side-channel)."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from opensora_tpu.models.vae2d.losses import (
    discriminator_loss,
    generator_loss,
    vae_loss,
)
from opensora_tpu.utils.train import update_ema


class VAETrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any           # AE params (+ logvar)
    opt_state: Any
    ema_params: Optional[Any] = None
    disc_params: Optional[Any] = None
    disc_opt_state: Optional[Any] = None

    @classmethod
    def create(cls, params, tx, disc_params=None, disc_tx=None, ema: bool = True):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(lambda x: jnp.array(x, jnp.float32), params)
            if ema else None,
            disc_params=disc_params,
            disc_opt_state=disc_tx.init(disc_params) if disc_params is not None else None,
        )


def make_vae_train_step(
    ae_model,
    tx: optax.GradientTransformation,
    disc_model=None,
    disc_tx: Optional[optax.GradientTransformation] = None,
    perceptual_loss_fn: Optional[Callable] = None,
    perceptual_loss_weight: float = 1.0,
    kl_loss_weight: float = 5e-4,
    gen_start: int = 2001,
    disc_start: int = 2001,
    disc_factor: float = 1.0,
    disc_weight: float = 0.5,
    disc_loss_type: str = "hinge",
    ema_decay: float = 0.9999,
    use_discriminator: bool = True,
    adaptive_disc_weight: bool = True,
    grad_checkpoint: bool = False,
):
    """Returns train_step(state, batch{'video'}, rng) → (state, metrics).

    ``grad_checkpoint`` remats the AE forward (reference ``grad_checkpoint``
    for long-clip / high-res AE training, docs/ae.md) — activations are
    recomputed in the backward instead of held across the whole
    encode+decode. The discriminator is never rematted, so the adaptive
    generator weight's last-layer gradients stay exact (the reference needs
    ``disc_off_grad_ckpt`` for the same reason)."""

    from opensora_tpu.models.vae2d.losses import adaptive_generator_weight

    def ae_forward(ae_params, video, rng):
        return ae_model.apply({"params": ae_params}, video, rngs={"gaussian": rng})

    if grad_checkpoint:
        ae_forward = jax.checkpoint(ae_forward)

    def gen_loss_fn(params, video, rng, disc_params, global_step):
        logvar = params.get("loss_logvar", jnp.zeros(()))
        ae_params = {k: v for k, v in params.items() if k != "loss_logvar"}
        x_rec, posterior, z = ae_forward(ae_params, video, rng)
        losses = vae_loss(
            video, x_rec, posterior, logvar,
            perceptual_loss_fn=perceptual_loss_fn,
            perceptual_loss_weight=perceptual_loss_weight,
            kl_loss_weight=kl_loss_weight,
        )
        total = losses["nll_loss"] + losses["kl_loss"]
        g_loss_raw = jnp.zeros(())
        if use_discriminator and disc_params is not None:
            logits_fake = disc_model.apply({"params": disc_params}, x_rec)
            if adaptive_disc_weight:
                # reference losses.py:163-170 balances the GAN term by
                # ||grad(nll)|| / ||grad(g)|| on the decoder's last layer.
                # Both last-layer gradients share the layer's input
                # activations as a common factor, so the ratio of the
                # OUTPUT-space gradients (cheap: backward through the loss
                # heads only, not the decoder) is the same quantity — the
                # taming-transformers last_layer=None fallback semantics.
                x_sg = jax.lax.stop_gradient(x_rec)

                def nll_head(xr):
                    l = vae_loss(
                        video, xr, posterior, jax.lax.stop_gradient(logvar),
                        perceptual_loss_fn=perceptual_loss_fn,
                        perceptual_loss_weight=perceptual_loss_weight,
                        kl_loss_weight=kl_loss_weight,
                    )
                    return l["nll_loss"]

                def g_head(xr):
                    return -jnp.mean(
                        disc_model.apply(
                            {"params": jax.lax.stop_gradient(disc_params)}, xr
                        ).astype(jnp.float32)
                    )

                nll_grad = jax.grad(nll_head)(x_sg)
                g_grad = jax.grad(g_head)(x_sg)
                d_weight = adaptive_generator_weight(
                    nll_grad, g_grad, disc_weight
                )
            else:
                d_weight = disc_weight
            weighted, g_loss_raw = generator_loss(
                logits_fake, global_step,
                d_weight=d_weight, disc_factor=disc_factor, gen_start=gen_start,
            )
            total = total + weighted
        return total, (losses, x_rec, g_loss_raw)

    def disc_loss_fn(disc_params, video, x_rec, global_step):
        logits_real = disc_model.apply({"params": disc_params}, video)
        logits_fake = disc_model.apply(
            {"params": disc_params}, jax.lax.stop_gradient(x_rec)
        )
        return discriminator_loss(
            logits_real, logits_fake, global_step,
            disc_factor=disc_factor, disc_start=disc_start,
            disc_loss_type=disc_loss_type,
        )

    def train_step(state: VAETrainState, batch: Dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        video = batch["video"]

        (total, (losses, x_rec, g_loss)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.params, video, rng, state.disc_params, state.step)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_disc_params = state.disc_params
        new_disc_opt = state.disc_opt_state
        d_loss = jnp.zeros(())
        if use_discriminator and state.disc_params is not None:
            d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(
                state.disc_params, video, x_rec, state.step
            )
            d_updates, new_disc_opt = disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            new_disc_params = optax.apply_updates(state.disc_params, d_updates)

        new_ema = (
            update_ema(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None else None
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
            disc_params=new_disc_params,
            disc_opt_state=new_disc_opt,
        )
        metrics = {
            "loss": total,
            "gen_loss": g_loss,
            "disc_loss": d_loss,
            **losses,
        }
        return new_state, metrics

    return train_step
