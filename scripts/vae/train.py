"""VAE/GAN training CLI.

Behavioral reference: scripts/vae/train.py:56-593 — 256px 32f buckets,
AE + VAELoss(+LPIPS) + 3D discriminator with separate optimizer, mixed
image/video strategy, EMA, checkpointing."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from opensora_tpu.datasets.dataloader import prepare_dataloader
    from opensora_tpu.registry import DATASETS, MODELS, build_module
    from opensora_tpu.training.vae import VAETrainState, make_vae_train_step
    from opensora_tpu.utils.ckpt import CheckpointIO
    from opensora_tpu.utils.config import create_experiment_workspace, parse_configs
    from opensora_tpu.utils.logger import create_logger
    from opensora_tpu.utils.misc import Timers, count_params, format_numel
    from opensora_tpu.utils.optimizer import create_optimizer
    import opensora_tpu.models.hunyuan_vae  # noqa: F401
    import opensora_tpu.models.dc_ae  # noqa: F401
    import opensora_tpu.models.vae2d.discriminator  # noqa: F401
    import opensora_tpu.datasets.datasets  # noqa: F401

    cfg = parse_configs()
    exp_dir = create_experiment_workspace(cfg)
    logger = create_logger(exp_dir)

    dataset = build_module(dict(cfg.dataset), DATASETS)
    dataloader, sampler = prepare_dataloader(
        dataset,
        bucket_config=cfg.get("bucket_config"),
        batch_size=cfg.get("batch_size"),
        seed=cfg.get("seed", 42),
    )

    ae = build_module(dict(cfg.model), MODELS)
    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    x0 = jnp.zeros((1, 3, 5, 64, 64), jnp.float32)
    from opensora_tpu.utils.ckpt import init_ae_variables
    ae_vars = init_ae_variables(ae, dict(cfg.model), rng, x0)
    params = dict(ae_vars["params"])
    params["loss_logvar"] = jnp.zeros(())
    logger.info("AE params: %s", format_numel(count_params(params)))

    use_disc = cfg.get("discriminator") is not None
    disc = disc_params = disc_tx = None
    if use_disc:
        disc = build_module(dict(cfg.discriminator), MODELS)
        disc_params = disc.init(rng, x0)["params"]
        disc_tx = create_optimizer(lr=cfg.get("disc_lr", 1e-5))

    # perceptual loss only when VGG weights are on disk (zero-egress gate)
    perceptual_fn = None
    if cfg.get("vgg_ckpt") and os.path.exists(cfg.vgg_ckpt):
        from opensora_tpu.models.vae2d.lpips import LPIPS, load_lpips_params

        lpips = LPIPS()
        lp_vars = load_lpips_params(cfg.vgg_ckpt, cfg.get("lpips_ckpt"))
        perceptual_fn = lambda a, b: lpips.apply(lp_vars, a, b)

    tx = create_optimizer(lr=cfg.get("lr", 1e-5))
    state = VAETrainState.create(params, tx, disc_params, disc_tx, ema=True)
    train_step = jax.jit(
        make_vae_train_step(
            ae, tx, disc, disc_tx,
            perceptual_loss_fn=perceptual_fn,
            kl_loss_weight=cfg.get("kl_loss_weight", 5e-4),
            gen_start=cfg.get("gen_start", 2001),
            disc_start=cfg.get("disc_start", 2001),
            disc_loss_type=cfg.get("disc_loss_type", "hinge"),
            use_discriminator=use_disc,
        )
    )

    ckpt_io = CheckpointIO()
    timers = Timers()
    host_rng = np.random.default_rng(cfg.get("seed", 42))
    mixed_strategy = cfg.get("mixed_strategy")  # e.g. {"image_prob": 0.2}
    global_step = 0
    for epoch in range(cfg.get("epochs", 1)):
        sampler.set_epoch(epoch)
        for batch in dataloader:
            video = np.asarray(batch["video"])
            if mixed_strategy and video.shape[2] > 1:
                # random temporal truncation / image-only batches
                # (reference scripts/vae/train.py:377-388 mixed_strategy)
                if host_rng.random() < mixed_strategy.get("image_prob", 0.0):
                    video = video[:, :, :1]
                elif mixed_strategy.get("random_truncate", False):
                    tcr = getattr(ae.config, "time_compression_ratio", 4)
                    choices = [t for t in range(1, video.shape[2] + 1)
                               if t == 1 or (t - 1) % tcr == 0]
                    video = video[:, :, : int(host_rng.choice(choices))]
            with timers("step"):
                rng, r = jax.random.split(rng)
                state, metrics = train_step(
                    state, {"video": jnp.asarray(video)}, r
                )
            global_step += 1
            if global_step % cfg.get("log_every", 1) == 0:
                logger.info(
                    "epoch %d step %d loss %.4f recon %.4f kl %.6f disc %.4f %s",
                    epoch, global_step, float(metrics["loss"]),
                    float(metrics["recon_loss"]), float(metrics["kl_loss"]),
                    float(metrics["disc_loss"]), timers.to_dict(),
                )
            if global_step % cfg.get("ckpt_every", 1000) == 0:
                ckpt_io.save(exp_dir, state, epoch, global_step, global_step)
    ckpt_io.save(exp_dir, state, cfg.get("epochs", 1) - 1, global_step, global_step)
    ckpt_io.wait()
    logger.info("done")


if __name__ == "__main__":
    main()
