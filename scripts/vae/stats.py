"""Latent-statistics CLI: encode-only pass computing the recommended
scale/shift factors (behavioral reference: scripts/vae/stats.py)."""

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
    from opensora_tpu.utils.config import parse_configs
    from opensora_tpu.utils.logger import create_logger
    import opensora_tpu.models.hunyuan_vae  # noqa: F401
    import opensora_tpu.models.dc_ae  # noqa: F401
    import opensora_tpu.datasets.datasets  # noqa: F401

    cfg = parse_configs()
    logger = create_logger()
    # eval_setting "TxS" → single bucket (same as scripts/vae/inference.py)
    if cfg.get("eval_setting") and not cfg.get("bucket_config"):
        t, sz = (int(v) for v in cfg.eval_setting.split("x"))
        cfg["bucket_config"] = {f"{sz}px": {t: (1.0, cfg.get("batch_size", 1))}}
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
    encode = jax.jit(
        lambda x, r: ae.apply(ae_vars, x, rngs={"gaussian": r}, method=type(ae).encode)
    )

    z_sum = z_sq = 0.0
    z_n = 0
    for i, batch in enumerate(dataloader):
        rng, r = jax.random.split(rng)
        z = np.asarray(encode(jnp.asarray(batch["video"]), r), np.float64)
        z_sum += z.sum()
        z_sq += (z**2).sum()
        z_n += z.size
        if cfg.get("max_samples") and i + 1 >= cfg.max_samples:
            break
    mean = z_sum / max(z_n, 1)
    std = np.sqrt(z_sq / max(z_n, 1) - mean**2)
    logger.info(
        "latent mean %.6f std %.6f → scale_factor %.6f shift_factor %.6f",
        mean, std, 1.0 / std, mean,
    )


if __name__ == "__main__":
    main()
