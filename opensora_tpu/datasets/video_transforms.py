"""Video transforms over numpy (C, T, H, W) tensors.

Behavioral reference: opensora/datasets/video_transforms.py (ResizeCrop,
UCFCenterCropVideo, RandomSizedCrop, TemporalRandomCrop, normalization to
[-1, 1]). Host-side numpy/cv2 — the TPU only sees finished batches.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from opensora_tpu.datasets.utils import normalize_video, resize_crop, temporal_random_crop


class ResizeCrop:
    """Aspect-preserving resize + center crop to (H, W)."""

    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, video: np.ndarray) -> np.ndarray:
        return resize_crop(video, self.size)


class UCFCenterCropVideo:
    """Resize the short side to ``size`` then center-crop a square."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, video: np.ndarray) -> np.ndarray:
        return resize_crop(video, (self.size, self.size))


class RandomSizedCrop:
    """Random scale in [min_scale, 1] of the short side, then random crop."""

    def __init__(self, size: Tuple[int, int], min_scale: float = 0.5, seed: int = 0):
        self.size = size
        self.min_scale = min_scale
        self.rng = np.random.default_rng(seed)

    def __call__(self, video: np.ndarray) -> np.ndarray:
        import cv2

        th, tw = self.size
        c, t, h, w = video.shape
        scale = self.rng.uniform(self.min_scale, 1.0)
        base = max(th / h, tw / w)
        nh = max(th, int(round(h * base / scale)))
        nw = max(tw, int(round(w * base / scale)))
        out = np.empty((c, t, nh, nw), video.dtype)
        for k in range(t):
            frame = np.transpose(video[:, k], (1, 2, 0))
            out[:, k] = np.transpose(
                cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR), (2, 0, 1)
            )
        i0 = int(self.rng.integers(0, nh - th + 1))
        j0 = int(self.rng.integers(0, nw - tw + 1))
        return out[:, :, i0:i0 + th, j0:j0 + tw]


class TemporalRandomCrop:
    """Random temporal window of ``num_frames`` at ``frame_interval``."""

    def __init__(self, num_frames: int, frame_interval: int = 1, seed: int = 0):
        self.num_frames = num_frames
        self.frame_interval = frame_interval
        self.rng = np.random.default_rng(seed)

    def __call__(self, video: np.ndarray) -> np.ndarray:
        return temporal_random_crop(video, self.num_frames, self.frame_interval, self.rng)


class NormalizeVideo:
    """[0, 255] → [-1, 1]."""

    def __call__(self, video: np.ndarray) -> np.ndarray:
        return normalize_video(video)


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, video: np.ndarray) -> np.ndarray:
        for t in self.transforms:
            video = t(video)
        return video


def get_transforms_video(name: str, size: Tuple[int, int]):
    """Named transform pipelines (reference transform registry)."""
    if name == "resize_crop":
        return Compose([ResizeCrop(size), NormalizeVideo()])
    if name == "center":
        return Compose([UCFCenterCropVideo(size[0]), NormalizeVideo()])
    if name == "random_resize_crop":
        return Compose([RandomSizedCrop(size), NormalizeVideo()])
    raise ValueError(f"unknown transform pipeline {name!r}")
