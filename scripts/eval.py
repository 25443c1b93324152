"""Evaluation CLI: VAE reconstruction metrics and VBench-style generation
metrics over a directory of samples.

Usage:
  python scripts/eval.py --samples samples/ [--prompts prompts.csv]

Written fresh (the reference's eval folder is absent from its tree;
SURVEY.md §4)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def load_video(path):
    from opensora_tpu.datasets.utils import normalize_video, read_image, read_video

    if path.endswith(".png"):
        return normalize_video(read_image(path))
    return normalize_video(read_video(path)[0])


def main():
    import argparse

    from opensora_tpu.utils.config import apply_jax_platform_env

    apply_jax_platform_env()  # JAX_PLATFORMS=cpu must actually force CPU
    p = argparse.ArgumentParser(
        description="VAE reconstruction + VBench-style metrics over a sample dir"
    )
    p.add_argument("--samples", default="samples", help="directory of .mp4/.png samples")
    p.add_argument("--prompts", default=None, help="unused placeholder (prompts are read from per-sample .txt files)")
    p.add_argument(
        "--clip", default="./ckpts/clip-vit-large-patch14",
        help="local HF CLIPModel checkpoint for clip_score (skipped if absent)",
    )
    p.add_argument(
        "--aesthetic", default="./ckpts/aesthetic_predictor.pth",
        help="LAION aesthetic-predictor state dict for aesthetic_quality "
             "(skipped if absent; needs --clip too)",
    )
    p.add_argument(
        "--suite", default=None, choices=["vbench"],
        help="score each dimension over its OWN prompt suite "
             "(opensora_tpu/eval/suites.py) instead of pooled metrics",
    )
    p.add_argument(
        "--suite-dir", default=None,
        help="suite directory (default data/vbench_suites; drop "
             "<dim>.official.txt files there to run the official lists)",
    )
    p.add_argument(
        "--emit-prompts", default=None, metavar="CSV",
        help="with --suite: write every dimension's prompts to CSV "
             "(columns text,dimension) for generation runs, then exit",
    )
    args = p.parse_args()
    if args.suite and args.emit_prompts:
        from opensora_tpu.eval.suites import emit_prompts_csv

        n = emit_prompts_csv(args.emit_prompts, suite_dir=args.suite_dir)
        print(json.dumps({"prompts_written": n, "path": args.emit_prompts}))
        return
    sample_dir = args.samples
    if not os.path.isdir(sample_dir):
        p.error(f"sample directory not found: {sample_dir!r} (pass --samples)")
    from opensora_tpu.eval.metrics import psnr, ssim_video
    from opensora_tpu.eval.vbench import evaluate_videos

    files = sorted(
        f for f in os.listdir(sample_dir) if f.endswith((".mp4", ".png"))
    )
    videos, texts, meta = [], [], []
    for f in files:
        v = load_video(os.path.join(sample_dir, f))
        videos.append(v)
        stem = os.path.join(sample_dir, f.rsplit(".", 1)[0])
        texts.append(open(stem + ".txt").read() if os.path.exists(stem + ".txt") else "")
        # optional per-sample sidecar naming detection-suite slots explicitly
        # (keys: object / objects / color_object / scene / action / spatial),
        # overriding prompt-template parsing — VBench's suite JSONs carry the
        # same auxiliary info
        meta.append(
            json.load(open(stem + ".json")) if os.path.exists(stem + ".json") else None
        )

    if not videos:
        print(json.dumps({"error": f"no samples in {sample_dir}"}))
        return

    from opensora_tpu.eval.aesthetic import try_load_head
    from opensora_tpu.eval.clip_scorer import try_load_scorer

    scorer = try_load_scorer(args.clip)
    head = try_load_head(args.aesthetic)
    if args.suite:
        from opensora_tpu.eval.suites import evaluate_suite

        report = evaluate_suite(
            videos, texts, clip_scorer=scorer, aesthetic_head=head,
            suite_dir=args.suite_dir, meta=meta,
        )
    else:
        report = evaluate_videos(videos, texts, clip_scorer=scorer,
                                 aesthetic_head=head, meta=meta)
    report["num_samples"] = len(videos)

    # paired orig/recn files → reconstruction metrics (vae inference output)
    pairs = [
        (f, f.replace("_orig", "_recn"))
        for f in files
        if "_orig" in f and f.replace("_orig", "_recn") in files
    ]
    if pairs:
        ps, ss = [], []
        for a, b in pairs:
            va = load_video(os.path.join(sample_dir, a))
            vb = load_video(os.path.join(sample_dir, b))
            ps.append(psnr(va, vb))
            ss.append(ssim_video(va, vb))
        report["recon_psnr"] = float(np.mean(ps))
        report["recon_ssim"] = float(np.mean(ss))

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
