"""VAE reconstruction / eval CLI.

Behavioral reference: scripts/vae/inference.py:19-135 — eval_setting like
"32x256" builds a one-bucket config; saves orig/recon pairs and running
latent statistics + PSNR/SSIM-style metrics."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


def main():
    import jax
    import jax.numpy as jnp

    from opensora_tpu.datasets.dataloader import prepare_dataloader
    from opensora_tpu.registry import DATASETS, MODELS, build_module
    from opensora_tpu.utils.config import parse_configs
    from opensora_tpu.utils.inference import save_sample
    from opensora_tpu.utils.logger import create_logger
    import opensora_tpu.models.hunyuan_vae  # noqa: F401
    import opensora_tpu.models.dc_ae  # noqa: F401
    import opensora_tpu.datasets.datasets  # noqa: F401

    cfg = parse_configs()
    logger = create_logger()

    # eval_setting "TxS" → single bucket (reference vae/inference.py:69-78)
    if cfg.get("eval_setting"):
        t, s = (int(v) for v in cfg.eval_setting.split("x"))
        cfg["bucket_config"] = {f"{s}px": {t: (1.0, cfg.get("batch_size", 1))}}

    dataset = build_module(dict(cfg.dataset), DATASETS)
    dataloader, _ = prepare_dataloader(
        dataset, bucket_config=cfg.get("bucket_config"),
        batch_size=cfg.get("batch_size", 1), shuffle=False,
    )

    ae = build_module(dict(cfg.model), MODELS)
    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    from opensora_tpu.utils.ckpt import init_ae_variables
    ae_vars = init_ae_variables(
        ae, dict(cfg.model), rng, jnp.zeros((1, 3, 5, 64, 64), jnp.float32)
    )

    # the posterior object is host-side only; jit returns arrays
    def _fwd(x, r):
        x_rec, _, z = ae.apply(ae_vars, x, rngs={"gaussian": r})
        return x_rec, z

    fwd = jax.jit(_fwd)

    save_dir = cfg.get("save_dir", "samples/vae")
    os.makedirs(save_dir, exist_ok=True)
    psnrs, z_sum, z_sq, z_n = [], 0.0, 0.0, 0
    for i, batch in enumerate(dataloader):
        x = jnp.asarray(batch["video"])
        rng, r = jax.random.split(rng)
        x_rec, z = fwd(x, r)
        x_np, rec_np = np.asarray(x), np.asarray(x_rec)
        p = psnr(x_np, np.clip(rec_np, -1, 1))
        psnrs.append(p)
        zf = np.asarray(z, np.float64)
        z_sum += zf.sum()
        z_sq += (zf**2).sum()
        z_n += zf.size
        if i < cfg.get("num_save", 4):
            save_sample(x_np[0], os.path.join(save_dir, f"{i:04d}_orig"))
            save_sample(np.clip(rec_np[0], -1, 1), os.path.join(save_dir, f"{i:04d}_recn"))
        logger.info("sample %d PSNR %.2f dB", i, p)
        if cfg.get("max_samples") and i + 1 >= cfg.max_samples:
            break
    mean = z_sum / max(z_n, 1)
    std = np.sqrt(z_sq / max(z_n, 1) - mean**2)
    logger.info(
        "PSNR mean %.3f dB over %d samples; latent mean %.4f std %.4f "
        "(suggested scale_factor %.6f, shift_factor %.6f)",
        float(np.mean(psnrs)), len(psnrs), mean, std, 1.0 / std, mean,
    )


if __name__ == "__main__":
    main()
