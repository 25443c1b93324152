"""Text/image-to-video generation CLI.

Behavioral reference: scripts/diffusion/inference.py:42-238 — config parse,
model assembly, prompt dataset, per-batch api_fn calls (t2v / i2v_* / v2v_* /
t2i2v), saving mp4/png outputs.

Usage:
  python scripts/diffusion/inference.py configs/diffusion/inference/tiny_256px.py \
      --prompt "a cat playing piano" [--sampling_option.num_steps 20] ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    import jax

    from opensora_tpu.datasets.dataloader import prepare_dataloader
    from opensora_tpu.registry import DATASETS, build_module
    from opensora_tpu.utils.api import prepare_api, prepare_models
    from opensora_tpu.utils.config import parse_configs
    from opensora_tpu.utils.inference import process_and_save
    from opensora_tpu.utils.logger import create_logger
    from opensora_tpu.utils.misc import Timers
    from opensora_tpu.utils.sampling import (
        SamplingOption,
        sanitize_sampling_option,
    )
    import opensora_tpu.models.mmdit  # noqa: F401 (register)
    import opensora_tpu.models.hunyuan_vae  # noqa: F401
    import opensora_tpu.models.dc_ae  # noqa: F401
    import opensora_tpu.models.vae2d  # noqa: F401
    import opensora_tpu.models.text.conditioner  # noqa: F401
    import opensora_tpu.datasets.datasets  # noqa: F401

    # allow --prompt / advanced-usage shortcuts before generic parsing
    # (reference README "Advanced Usage": --motion-score, --refine-prompt,
    # --num-sample; reference scripts/diffusion/inference.py:42-238)
    argv = sys.argv[1:]
    prompt = None
    if "--prompt" in argv:
        i = argv.index("--prompt")
        prompt = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    motion_score = None
    for flag in ("--motion-score", "--motion_score"):
        if flag in argv:
            i = argv.index(flag)
            motion_score = argv[i + 1]  # int-like or "dynamic"
            argv = argv[:i] + argv[i + 2:]
    refine = False
    for flag in ("--refine-prompt", "--refine_prompt"):
        if flag in argv:
            i = argv.index(flag)
            # reference usage passes an explicit True/False value; the
            # bare flag also works
            has_val = i + 1 < len(argv) and not argv[i + 1].startswith("--")
            val = argv[i + 1] if has_val else "True"
            refine = val.lower() in ("1", "true", "yes")
            argv = argv[:i] + argv[i + (2 if has_val else 1):]
            break
    num_sample = 1
    for flag in ("--num-sample", "--num_sample"):
        if flag in argv:
            i = argv.index(flag)
            num_sample = int(argv[i + 1])
            argv = argv[:i] + argv[i + 2:]

    cfg = parse_configs(argv)
    logger = create_logger()
    logger.info("devices: %s", jax.devices())

    # dataset: inline prompt or csv/parquet prompt file
    if prompt is not None:
        import csv
        import tempfile

        tmp = tempfile.NamedTemporaryFile(
            "w", suffix=".csv", delete=False, newline=""
        )
        # csv-quote: a bare write drops everything before a comma in
        # prompts like "raining, sea" (round-5 regression find)
        w = csv.writer(tmp)
        w.writerow(["text"])
        w.writerow([prompt])
        tmp.close()
        cfg.dataset = dict(cfg.get("dataset", {"type": "text"}))
        cfg.dataset["data_path"] = tmp.name

    dataset = build_module(dict(cfg.dataset), DATASETS)
    dataloader, _ = prepare_dataloader(
        dataset, batch_size=cfg.get("batch_size", 1), shuffle=False,
        num_workers=1,
    )

    model, model_ae, model_t5, model_clip, optional = prepare_models(
        cfg, dtype=cfg.get("dtype", "bf16")
    )
    mesh = None
    if cfg.get("mesh") is not None and len(jax.devices()) > 1:
        from opensora_tpu.parallel.mesh import MeshConfig, create_mesh

        mesh = create_mesh(MeshConfig(**cfg.mesh))
        logger.info("inference mesh: %s", mesh)
    api_fn = prepare_api(model, model_ae, model_t5, model_clip, optional, mesh=mesh)

    opt = sanitize_sampling_option(SamplingOption(**cfg.get("sampling_option", {})))
    cond_type = cfg.get("cond_type", "t2v")
    save_dir = cfg.get("save_dir", "samples")
    fps_save = cfg.get("fps_save", 16)
    timers = Timers()

    # t2i2v: generate the first frame with the distilled image flux, then
    # condition the video model on it (reference inference.py:161-214)
    t2i2v = "img_flux" in optional
    api_fn_img = None
    if t2i2v:
        from opensora_tpu.utils.sampling import SamplingMethod

        api_fn_img = prepare_api(
            optional["img_flux"], optional["img_flux_ae"], model_t5, model_clip, {}
        )
        opt_img = sanitize_sampling_option(
            SamplingOption(**cfg.get("sampling_option_t2i", {"resolution": "768px",
                                                             "aspect_ratio": "1:1",
                                                             "num_frames": 1,
                                                             "method": "distill"}))
        )
        cond_type = "i2v_head"

    sample_idx = 0
    for batch in dataloader:
        texts = batch["text"]
        if refine:
            # GPT-backed in the reference; identity offline (prompt_refine)
            from opensora_tpu.utils.prompt_refine import refine_prompts

            texts = refine_prompts(
                list(texts), type="t2i" if t2i2v else "t2v"
            )
        if motion_score is not None:
            from opensora_tpu.utils.inference import add_motion_score_to_text

            texts = add_motion_score_to_text(list(texts), motion_score)
        kwargs = {}
        if "ref" in batch:
            kwargs["ref"] = batch["ref"]
        if t2i2v and "ref" not in kwargs:
            from opensora_tpu.utils.inference import save_sample

            imgs = api_fn_img(
                opt_img, cond_type="t2v", text=texts,
                channel=cfg["img_flux"]["in_channels"],
            )
            refs = []
            for bi in range(len(texts)):
                p = save_sample(
                    np.asarray(imgs[bi]),
                    os.path.join(save_dir, f"t2i_{sample_idx + bi:04d}"),
                )
                refs.append(p)
            kwargs["ref"] = refs
        # --num-sample k: k videos per prompt, seeds offset per sample
        # (reference README "Reproductivity"); t2i2v refs are generated
        # once per batch (fixed first frame, varied video seed)
        base_seed = opt.seed if opt.seed is not None else 42
        for j in range(num_sample):
            with timers("generate"):
                x = api_fn(
                    opt,
                    cond_type=cond_type,
                    seed=base_seed + j if num_sample > 1 else None,
                    text=texts,
                    neg=batch.get("neg"),
                    patch_size=cfg.get("patch_size", 2),
                    channel=cfg["model"]["in_channels"],
                    **kwargs,
                )
            x = np.asarray(jax.device_get(x))
            ids = list(range(sample_idx, sample_idx + len(texts)))
            paths = process_and_save(
                x, ids, save_dir, fps=fps_save, prompts=texts
            )
            logger.info("saved %s", paths)
            sample_idx += len(texts)
    logger.info("done: %s", timers.to_dict())


if __name__ == "__main__":
    main()
