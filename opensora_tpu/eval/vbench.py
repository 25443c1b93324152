"""VBench-style evaluation components.

The reference tracks VBench externally (README.md:290-302); its eval folder
is not in the tree (SURVEY.md §4), so this harness is written fresh. Four
dimensions are implemented:

- **clip_score**: real text-video CLIP similarity through the JAX
  CLIP ViT-L/14 vision + text towers (eval/clip_scorer.py) — VBench's
  'overall consistency' recipe; requires local CLIPModel weights.
- **subject_consistency**: VBench's subject-consistency formula (first-
  frame + previous-frame cosines) on CLIP frame embeddings (VBench uses
  DINO; same recipe, different backbone — documented deviation).
- **temporal_consistency**: mean cosine similarity of adjacent frames'
  downsampled luma — VBench's 'temporal flickering' proxy.
- **motion_magnitude**: mean absolute inter-frame difference — the
  'dynamic degree' proxy.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def _luma(frames: np.ndarray) -> np.ndarray:
    """(C, T, H, W) [-1,1] → (T, H, W) luma."""
    r, g, b = frames[0], frames[1], frames[2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def temporal_consistency(video: np.ndarray) -> float:
    """Mean cosine similarity between adjacent frames (1 = static/smooth)."""
    y = _luma(np.asarray(video, np.float64))
    t = y.shape[0]
    if t < 2:
        return 1.0
    flat = y.reshape(t, -1)
    flat = flat - flat.mean(axis=1, keepdims=True)
    norms = np.linalg.norm(flat, axis=1) + 1e-8
    sims = np.sum(flat[:-1] * flat[1:], axis=1) / (norms[:-1] * norms[1:])
    return float(sims.mean())


def motion_magnitude(video: np.ndarray) -> float:
    """Mean |frame difference| in [-1,1] space (0 = static)."""
    v = np.asarray(video, np.float64)
    if v.shape[1] < 2:
        return 0.0
    return float(np.abs(v[:, 1:] - v[:, :-1]).mean())


def clip_score(video: np.ndarray, text: str, scorer) -> float:
    """Text-video CLIP similarity: mean of per-frame ViT embeddings vs the
    prompt embedding, both through the CLIPModel projection space.
    ``scorer``: eval/clip_scorer.py::CLIPScorer (real ViT-L/14 towers)."""
    return float(scorer(video, text))


def subject_consistency(video: np.ndarray, scorer, max_frames: int = 8) -> float:
    """VBench 'subject consistency' recipe on CLIP frame embeddings (VBench
    uses DINO; the formula is the same): for each later frame, average the
    cosine to the FIRST frame and to the PREVIOUS frame, then mean."""
    emb = scorer.embed_frames(video, max_frames=max_frames)  # (N, d), unit
    if emb.shape[0] < 2:
        return 1.0
    to_first = emb[1:] @ emb[0]
    to_prev = np.sum(emb[1:] * emb[:-1], axis=1)
    return float(((to_first + to_prev) / 2.0).mean())


def evaluate_videos(videos: List[np.ndarray], texts: List[str], clip_scorer=None) -> Dict[str, float]:
    out = {
        "temporal_consistency": float(
            np.mean([temporal_consistency(v) for v in videos])
        ),
        "motion_magnitude": float(np.mean([motion_magnitude(v) for v in videos])),
    }
    if clip_scorer is not None:
        out["clip_score"] = float(
            np.mean([clip_score(v, t, clip_scorer) for v, t in zip(videos, texts)])
        )
        out["subject_consistency"] = float(
            np.mean([subject_consistency(v, clip_scorer) for v in videos])
        )
    return out
