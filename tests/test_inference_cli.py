"""Inference CLI surface: --prompt (csv-quoted), --motion-score,
--num-sample through scripts/diffusion/inference.py main() in-process
(reference README "Advanced Usage" flags; reference CLI
scripts/diffusion/inference.py:42-238)."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_inference_cli_advanced_flags(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts", "diffusion"))
    try:
        import inference as infer_cli
    finally:
        sys.path.pop(0)

    save_dir = str(tmp_path / "samples")
    old_argv = sys.argv
    sys.argv = [
        "inference.py",
        os.path.join(REPO, "configs", "diffusion", "inference", "tiny_dev.py"),
        # comma in the prompt: regression for the unquoted tmp-csv write
        # that dropped everything before the comma
        "--prompt", "raining, sea",
        "--motion-score", "4",
        "--num-sample", "2",
        "--save_dir", save_dir,
    ]
    try:
        infer_cli.main()
    finally:
        sys.argv = old_argv

    mp4s = sorted(f for f in os.listdir(save_dir) if f.endswith(".mp4"))
    assert mp4s == ["sample_0000.mp4", "sample_0001.mp4"], mp4s
    with open(os.path.join(save_dir, "sample_0000.txt")) as f:
        sidecar = f.read()
    assert sidecar.startswith("raining, sea"), sidecar
    assert "4 motion score" in sidecar, sidecar
    # the two seeds must differ -> different videos
    import cv2

    caps = []
    for m in mp4s:
        c = cv2.VideoCapture(os.path.join(save_dir, m))
        ok, frame = c.read()
        assert ok
        caps.append(frame.astype(np.float32))
        c.release()
    assert np.abs(caps[0] - caps[1]).max() > 0
