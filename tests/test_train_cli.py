"""Finetune-loop smoke test for the diffusion train CLI.

The reference's primary training story is finetuning from a published
checkpoint (reference scripts/diffusion/train.py:191-235: load model/AE,
optional LoRA via peft). This drives the full loop at toy scale:

  phase A  train from random init → orbax checkpoint
  export   scripts/cnv/export.py → torch-layout safetensors
  phase C  train again with model.from_pretrained=<export> — with the SAME
           seed the data/noise/timestep stream is identical to phase A, so
           first-step loss strictly below phase A's first-step loss proves
           the pretrained weights were actually loaded AND training reduced
           the loss (random init would reproduce phase A's loss exactly)
  phase D  LoRA finetune (lora_config) — factors-only train state
"""

import glob
import logging
import os
import re
import sys

import numpy as np
import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _write_videos(root, n=8, frames=16, size=96):
    import cv2

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        path = os.path.join(root, f"v{i}.mp4")
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 8.0, (size, size)
        )
        base = rng.integers(0, 255, (size, size, 3), np.uint8)
        for t in range(frames):
            w.write(np.roll(base, t * 3, axis=1))
        w.release()
        rows.append(f"{path},demo video {i},{size},{size},{frames},8.0")
    csv = os.path.join(root, "meta.csv")
    with open(csv, "w") as f:
        f.write("path,text,height,width,num_frames,fps\n" + "\n".join(rows) + "\n")
    return csv


def _write_cfg(path, csv, out_root, exp_name, epochs, extra=""):
    base = os.path.join(REPO, "configs", "diffusion", "train", "demo.py")
    with open(path, "w") as f:
        f.write(
            f"""
_base_ = [{base!r}]
outputs = {out_root!r}
exp_name = {exp_name!r}
dataset = dict(type="video_text", data_path={csv!r})
bucket_config = {{"64px": {{5: (1.0, 8)}}}}
epochs = {epochs}
lr = 5e-3
warmup_steps = 0
log_every = 1
ckpt_every = 1000
num_workers = 0
{extra}
"""
        )
    return path


def _run_train(cfg_path):
    """Run the train CLI main() in-process and return its logged losses."""
    sys.path.insert(0, os.path.join(REPO, "scripts", "diffusion"))
    try:
        import train as train_cli
    finally:
        sys.path.pop(0)
    # the CLI logger caches its FileHandler per process — reset between runs
    lg = logging.getLogger("opensora_tpu")
    for h in list(lg.handlers):
        lg.removeHandler(h)
        h.close()
    old_argv = sys.argv
    sys.argv = ["train.py", cfg_path]
    try:
        train_cli.main()
    finally:
        sys.argv = old_argv


def _read_losses(exp_dir):
    with open(os.path.join(exp_dir, "log.txt")) as f:
        text = f.read()
    return [float(m) for m in re.findall(r"loss (-?\d+\.\d+)", text)], text


def _latest_ckpt(exp_dir):
    dirs = glob.glob(os.path.join(exp_dir, "epoch*-global_step*"))
    assert dirs, f"no checkpoint written in {exp_dir}"
    return max(dirs, key=lambda d: int(d.rsplit("global_step", 1)[1]))


def test_pipeline_parallel_train_cli(tmp_path):
    """Opt-in PP through the CLI config surface: a (data=2, pp=2) mesh,
    depth 2/2 sliced one block per stage, GPipe forward inside the same
    train step (reference HybridParallelPlugin pp_size,
    scripts/diffusion/train.py:442-458)."""
    csv = _write_videos(str(tmp_path / "videos"))
    out_root = str(tmp_path / "out")
    cfg = _write_cfg(
        str(tmp_path / "cfg_pp.py"), csv, out_root, "pp", epochs=2,
        extra=(
            "model = dict(depth=2, depth_single_blocks=2)\n"
            "bucket_config = {'64px': {5: (1.0, 4)}}\n"
            "pipeline = dict(pp_size=2, data_size=2, n_micro=2)\n"
        ),
    )
    _run_train(cfg)
    losses, log = _read_losses(os.path.join(out_root, "pp"))
    assert len(losses) >= 2 and np.isfinite(losses).all()
    assert "'pp': 2" in log or "pp=2" in log or "pp" in log


def test_finetune_loop_pretrained_and_lora(tmp_path):
    csv = _write_videos(str(tmp_path / "videos"))
    out_root = str(tmp_path / "out")

    # ---- phase A: random init ----
    cfg_a = _write_cfg(str(tmp_path / "cfg_a.py"), csv, out_root, "phase_a", epochs=10)
    _run_train(cfg_a)
    losses_a, _ = _read_losses(os.path.join(out_root, "phase_a"))
    assert len(losses_a) >= 10 and np.isfinite(losses_a).all()

    # ---- export to torch-layout safetensors (scripts/cnv/export.py) ----
    ckpt = _latest_ckpt(os.path.join(out_root, "phase_a"))
    exported = str(tmp_path / "exported.safetensors")
    sys.path.insert(0, os.path.join(REPO, "scripts", "cnv"))
    try:
        import export as export_cli
    finally:
        sys.path.pop(0)
    old_argv = sys.argv
    sys.argv = ["export.py", ckpt, exported, "--config", cfg_a, "--source", "params"]
    try:
        export_cli.main()
    finally:
        sys.argv = old_argv
    assert os.path.exists(exported)

    # ---- phase C: finetune from the export (same seed → same noise) ----
    cfg_c = _write_cfg(
        str(tmp_path / "cfg_c.py"), csv, out_root, "phase_c", epochs=2,
        extra=f"model = dict(from_pretrained={exported!r})\n",
    )
    _run_train(cfg_c)
    losses_c, log_c = _read_losses(os.path.join(out_root, "phase_c"))
    assert "loaded pretrained MMDiT weights" in log_c
    assert np.isfinite(losses_c).all()
    # identical seed ⇒ identical batch/t/noise at step 1; random init would
    # reproduce losses_a[0] exactly, loaded-trained weights must beat it
    assert losses_c[0] < losses_a[0], (losses_c[0], losses_a[0])

    # ---- phase D: LoRA finetune ----
    cfg_d = _write_cfg(
        str(tmp_path / "cfg_d.py"), csv, out_root, "phase_d", epochs=2,
        extra=(
            f"model = dict(from_pretrained={exported!r})\n"
            "lora_config = dict(r=4, lora_alpha=4)\n"
        ),
    )
    _run_train(cfg_d)
    losses_d, log_d = _read_losses(os.path.join(out_root, "phase_d"))
    assert "LoRA enabled" in log_d
    assert np.isfinite(losses_d).all()
    # the LoRA train state holds only (A, B) factors — the saved checkpoint
    # must be the small factor tree, not the full model
    import orbax.checkpoint as ocp

    meta = ocp.StandardCheckpointer().metadata(
        os.path.join(_latest_ckpt(os.path.join(out_root, "phase_d")), "state")
    )
    flat = str(meta)
    assert "lora_a" in flat and "lora_b" in flat
