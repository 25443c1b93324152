"""Video quality metrics: PSNR / SSIM, per-frame and per-clip.

The reference delegates quality tracking to external VBench runs and an
eval-loss folder that is not in its tree (SURVEY.md §4, report_03.md:129-147)
— this harness is written fresh, as the survey prescribes."""

from __future__ import annotations

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * float(np.log10(data_range**2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def ssim_frame(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """Single-frame grayscale SSIM (a, b: (H, W) float)."""
    from scipy.signal import fftconvolve  # scipy ships with the jax stack

    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mu_a = fftconvolve(a, k, mode="valid")
    mu_b = fftconvolve(b, k, mode="valid")
    va = fftconvolve(a * a, k, mode="valid") - mu_a**2
    vb = fftconvolve(b * b, k, mode="valid") - mu_b**2
    cov = fftconvolve(a * b, k, mode="valid") - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def ssim_video(a: np.ndarray, b: np.ndarray, data_range: float = 2.0) -> float:
    """(C, T, H, W) SSIM averaged over frames (luma-equal channel mean)."""
    a_g = a.mean(axis=0)
    b_g = b.mean(axis=0)
    return float(np.mean([ssim_frame(a_g[t], b_g[t], data_range) for t in range(a_g.shape[0])]))
