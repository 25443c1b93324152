"""Media IO + data helpers.

Behavioral reference: opensora/datasets/utils.py (temporal_random_crop:85,
map_target_fps:294, read_from_path + save_sample:202-234) and
opensora/datasets/read_video.py (pyav decode; cv2 is the decoder here — it is
the host-side C++ library available in this image, playing the role PyAV/
FFmpeg plays for the reference).

Tensors returned are numpy (C, T, H, W) in [-1, 1]; the TPU never sees IO.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")
VID_EXTENSIONS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def is_img(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in IMG_EXTENSIONS


def is_vid(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in VID_EXTENSIONS


# ----------------------------------------------------------------------
# decoding
# ----------------------------------------------------------------------


def read_image(path: str) -> np.ndarray:
    """(C, 1, H, W) RGB float32 in [0, 255]."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"cannot read image {path}")
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
    return np.transpose(img, (2, 0, 1))[:, None]


def read_video(
    path: str,
    max_frames: Optional[int] = None,
    sampling_interval: int = 1,
) -> Tuple[np.ndarray, float]:
    """Decode to (C, T, H, W) RGB float32 in [0, 255]; returns (video, fps).

    The reference rewrote pyav decode to avoid thread/memory leaks
    (read_video.py:18-257); cv2.VideoCapture is leak-free by construction —
    it is opened and released per call.
    """
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    frames = []
    idx = 0
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % sampling_interval == 0:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                if max_frames is not None and len(frames) >= max_frames:
                    break
            idx += 1
    finally:
        cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    video = np.stack(frames).astype(np.float32)  # (T, H, W, C)
    return np.transpose(video, (3, 0, 1, 2)), fps


# ----------------------------------------------------------------------
# transforms
# ----------------------------------------------------------------------


def resize_crop(video: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Resize preserving aspect then center-crop to (H, W).
    video: (C, T, H, W) → (C, T, size[0], size[1])."""
    import cv2

    th, tw = size
    c, t, h, w = video.shape
    scale = max(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = np.empty((c, t, th, tw), video.dtype)
    i0 = (nh - th) // 2
    j0 = (nw - tw) // 2
    for k in range(t):
        frame = np.transpose(video[:, k], (1, 2, 0))
        frame = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR)
        out[:, k] = np.transpose(frame[i0:i0 + th, j0:j0 + tw], (2, 0, 1))
    return out


def normalize_video(video: np.ndarray) -> np.ndarray:
    """[0, 255] → [-1, 1]."""
    return video / 127.5 - 1.0


def temporal_random_crop(
    video: np.ndarray, num_frames: int, frame_interval: int, rng: np.random.Generator
) -> np.ndarray:
    """Random temporal window (reference datasets/utils.py:85-100)."""
    total = video.shape[1]
    span = (num_frames - 1) * frame_interval + 1
    if total < span:
        raise ValueError(f"video too short: {total} < {span}")
    start = int(rng.integers(0, total - span + 1))
    idx = start + np.arange(num_frames) * frame_interval
    return video[:, idx]


def map_target_fps(fps: float, fps_max: int = 16) -> Tuple[float, int]:
    """fps → (target fps, frame sampling interval)
    (reference datasets/utils.py:294-309)."""
    if fps <= 0 or math.isnan(fps):
        return 0.0, 1
    if fps <= fps_max:
        return fps, 1
    interval = math.ceil(fps / fps_max)
    return fps / interval, interval


def read_from_path(path: str, image_size: Tuple[int, int], transform_name: str = "resize_crop") -> np.ndarray:
    """Read image/video → normalized (C, T, H, W) in [-1, 1].

    Videos (and http(s) URLs, when pyav is importable) route through
    datasets/read_video.py — pyav with rotation/fps metadata when present,
    this module's cv2 reader otherwise."""
    from opensora_tpu.datasets.read_video import read_video_any

    if path.startswith("http") and is_img(path):
        raise NotImplementedError("URL image fetch requires network egress")
    media = read_image(path) if is_img(path) else read_video_any(path)[0]
    if transform_name == "resize_crop":
        media = resize_crop(media, image_size)
    else:
        raise ValueError(f"unknown transform {transform_name!r}")
    return normalize_video(media)
