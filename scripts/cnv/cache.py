"""Precompute video latents + text embeddings for CachedVideoTextDataset.

Behavioral reference: opensora/datasets/utils.py:397-419 latent caching
helpers + the cached_video/cached_text train paths
(scripts/diffusion/train.py:380,393).

Usage: python scripts/cnv/cache.py CONFIG --out_dir data/cache
writes per-sample .npy latents/T5/CLIP embeddings and a cache_meta.csv.
"""

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
    import opensora_tpu.models.text.conditioner  # noqa: F401
    import opensora_tpu.datasets.datasets  # noqa: F401

    cfg = parse_configs()
    logger = create_logger()
    out_dir = cfg.get("out_dir", "data/cache")
    os.makedirs(out_dir, exist_ok=True)

    dataset = build_module(dict(cfg.dataset), DATASETS)
    dataloader, _ = prepare_dataloader(
        dataset, bucket_config=cfg.get("bucket_config"),
        batch_size=cfg.get("batch_size", 1), shuffle=False,
    )

    ae = build_module(dict(cfg.ae), MODELS)
    t5 = build_module(dict(cfg.t5), MODELS)
    clip = build_module(dict(cfg.clip), MODELS)
    rng = jax.random.PRNGKey(cfg.get("seed", 42))
    ae_vars = ae.init(
        {"params": rng, "gaussian": rng}, jnp.zeros((1, 3, 5, 64, 64), jnp.float32)
    )
    encode = jax.jit(
        lambda x, r: ae.apply(ae_vars, x, rngs={"gaussian": r}, method=type(ae).encode)
    )

    rows = []
    n = 0
    for batch in dataloader:
        rng, r = jax.random.split(rng)
        # store fp32 — np.save of bfloat16 round-trips as a void dtype
        latents = np.asarray(encode(jnp.asarray(batch["video"]), r), np.float32)
        t5_emb = np.asarray(t5(batch["text"]), np.float32)
        clip_emb = np.asarray(clip(batch["text"]), np.float32)
        for i in range(latents.shape[0]):
            lat_p = os.path.join(out_dir, f"lat_{n:06d}.npy")
            t5_p = os.path.join(out_dir, f"t5_{n:06d}.npy")
            cl_p = os.path.join(out_dir, f"clip_{n:06d}.npy")
            np.save(lat_p, latents[i])
            np.save(t5_p, t5_emb[i])
            np.save(cl_p, clip_emb[i])
            rows.append(
                dict(latent_path=lat_p, t5_path=t5_p, clip_path=cl_p,
                     text=batch["text"][i],
                     shape="x".join(str(d) for d in latents[i].shape))
            )
            n += 1
        if n % 100 == 0:
            logger.info("cached %d samples", n)

    import pandas as pd

    pd.DataFrame(rows).to_csv(os.path.join(out_dir, "cache_meta.csv"), index=False)
    logger.info("done: %d samples → %s", n, out_dir)


if __name__ == "__main__":
    main()
