"""VBench-style evaluation components.

The reference tracks VBench externally (README.md:290-302); its eval folder
is not in the tree (SURVEY.md §4), so this harness is written fresh. Twelve
dimensions are implemented (VBench name → recipe here; deviations from the
official detectors are documented inline AND tabulated in docs/eval.md,
with rank-order calibration tests in tests/test_eval_calibration.py):

- **clip_score** ('overall consistency'): real text-video CLIP similarity
  through the JAX CLIP ViT-L/14 vision + text towers (eval/clip_scorer.py);
  requires local CLIPModel weights.
- **subject_consistency**: VBench's formula (first-frame + previous-frame
  cosines) on CLIP embeddings of CENTER-CROPPED frames (VBench uses DINO,
  whose features are subject-salient; the crop biases CLIP toward the
  subject — documented deviation).
- **background_consistency**: VBench's formula on CLIP embeddings of FULL
  frames (this one IS the official recipe — VBench uses CLIP here).
- **temporal_consistency**: mean cosine similarity of adjacent frames'
  luma (a contrast-invariant smoothness diagnostic).
- **temporal_flickering**: VBench's OFFICIAL formula — ``1 - MAE/255``
  over adjacent frame pairs on uint8-range frames (VBench applies it to
  static-camera videos; here it is reported for all samples).
- **motion_smoothness**: second-order temporal smoothness — VBench scores
  reconstruction error of an AMT frame interpolator; the proxy here scores
  how well each frame is predicted by linear interpolation of its
  neighbours, normalized by motion magnitude so static videos don't win
  by default.
- **dynamic_degree**: THRESHOLDED motion (fraction of videos judged
  dynamic), like VBench's binarized RAFT-flow recipe; flow magnitude is
  estimated with coarse block matching instead of RAFT.
- **imaging_quality**: no-reference sharpness/exposure score in [0, 1]
  (VBench uses MUSIQ; proxy = Laplacian-energy sharpness x a clipping
  penalty — documented deviation).
- **motion_magnitude**: raw mean |frame difference| (diagnostic, not a
  VBench dimension).
- **aesthetic_quality**: VBench's OFFICIAL recipe — the LAION aesthetic
  predictor (MLP head, eval/aesthetic.py) on L2-normalized CLIP ViT-L/14
  frame embeddings, score/10 clipped to [0, 1], averaged over frames;
  gated on the predictor weights being on disk.
- **appearance_style**: VBench's OFFICIAL recipe — mean CLIP cosine
  between each sampled frame and the prompt's style phrase (VBench's
  style prompt suite embeds phrases like "..., in the style of Van Gogh";
  the phrase is extracted from the prompt text here). Reported only over
  samples whose prompt carries a style phrase, as in VBench.

- **temporal_style**: CLIP frame-vs-phrase cosine against the prompt's
  camera-motion phrase (official VBench uses ViCLIP's video encoder —
  documented proxy; the phrase lexicon is the official temporal-style
  suite's).

The remaining VBench dimensions (object_class, multiple_objects, color,
spatial_relationship, scene, human_action, overall_consistency) require
detection/captioning backbones (GRiT, Tag2Text, UMT, ViCLIP) that are not
in this zero-egress image; clip_score is the documented stand-in for
overall_consistency."""

from __future__ import annotations

import re
from typing import Dict, List, Optional

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


def temporal_flickering(video: np.ndarray) -> float:
    """VBench's official temporal-flickering score: ``1 - MAE/255`` with
    MAE the mean absolute difference of adjacent frames in uint8 units
    (the [-1, 1] input maps to a 0-255 range, so MAE scales by 255/2)."""
    v = np.asarray(video, np.float64)
    if v.shape[1] < 2:
        return 1.0
    mae = np.abs(v[:, 1:] - v[:, :-1]).mean() * (255.0 / 2.0)
    return float(1.0 - mae / 255.0)


def clip_score(video: np.ndarray, text: str, scorer) -> float:
    """Text-video CLIP similarity: mean of per-frame ViT embeddings vs the
    prompt embedding, both through the CLIPModel projection space.
    ``scorer``: eval/clip_scorer.py::CLIPScorer (real ViT-L/14 towers)."""
    return float(scorer(video, text))


def _consistency_from_embeddings(emb: np.ndarray) -> float:
    """VBench's shared consistency formula: for each later frame, average
    the cosine to the FIRST frame and to the PREVIOUS frame, then mean."""
    if emb.shape[0] < 2:
        return 1.0
    to_first = emb[1:] @ emb[0]
    to_prev = np.sum(emb[1:] * emb[:-1], axis=1)
    return float(((to_first + to_prev) / 2.0).mean())


def subject_consistency(video: np.ndarray, scorer, max_frames: int = 8) -> float:
    """VBench 'subject consistency' on CLIP embeddings of center-cropped
    frames (VBench uses DINO, which is subject-salient; the center crop
    biases CLIP toward the subject — documented backbone deviation)."""
    c, t, h, w = video.shape
    ch, cw = max(h // 2, 1), max(w // 2, 1)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    crop = video[:, :, y0:y0 + ch, x0:x0 + cw]
    emb = scorer.embed_frames(crop, max_frames=max_frames)  # (N, d), unit
    return _consistency_from_embeddings(emb)


def background_consistency(video: np.ndarray, scorer, max_frames: int = 8) -> float:
    """VBench 'background consistency': the same formula on CLIP embeddings
    of FULL frames — this dimension officially uses CLIP features."""
    emb = scorer.embed_frames(video, max_frames=max_frames)
    return _consistency_from_embeddings(emb)


def _block_flow_magnitude(video: np.ndarray, grid: int = 8,
                          search: int = 3, down: int = 2) -> float:
    """Mean per-frame motion magnitude (pixels, at the downsampled scale)
    estimated by coarse block matching — a RAFT-free stand-in for VBench's
    flow backbone. For each adjacent frame pair, the luma is downsampled,
    split into a ``grid``x``grid`` patch grid, and each patch is matched
    against +-``search`` px shifts of the next frame; the 95th-percentile
    patch displacement per pair is averaged over the video (official
    VBench scores the mean of the LARGEST RAFT flow magnitudes for the
    same reason: a salient moving object must register as motion even
    when most of the scene is static)."""
    y = _luma(np.asarray(video, np.float64))[:, ::down, ::down]
    t, h, w = y.shape
    if t < 2 or h <= 2 * search or w <= 2 * search:
        return 0.0
    ph, pw = max(h // grid, 1), max(w // grid, 1)
    # vectorized over (frame pair, grid cell) with a small python loop over
    # the 49 candidate shifts only — the per-pixel python loops this
    # replaces dominated the whole eval harness at 129f (round-3 review)
    gys = np.array([gy for gy in range(0, h - ph + 1, ph)
                    if gy >= search and gy + ph + search <= h])
    gxs = np.array([gx for gx in range(0, w - pw + 1, pw)
                    if gx >= search and gx + pw + search <= w])
    if gys.size == 0 or gxs.size == 0:
        return 0.0
    rows = gys[:, None] + np.arange(ph)[None, :]          # (Gy, ph)
    cols = gxs[:, None] + np.arange(pw)[None, :]          # (Gx, pw)

    def patches(frames, dy=0, dx=0):
        # (F, Gy, Gx, ph, pw) patch tensor at a given shift
        p = frames[:, rows + dy]                          # (F, Gy, ph, w)
        return p[:, :, :, cols + dx].transpose(0, 1, 3, 2, 4)

    a = patches(y[:-1])                                   # (t-1, Gy, Gx, ph, pw)
    textured = a.var(axis=(-2, -1)) >= 1e-4               # (t-1, Gy, Gx)
    best_err = np.full(textured.shape, np.inf)
    best_disp = np.zeros(textured.shape)
    for dy in range(-search, search + 1):
        for dx in range(-search, search + 1):
            err = np.mean((a - patches(y[1:], dy, dx)) ** 2, axis=(-2, -1))
            d = float(np.hypot(dy, dx))
            # lexicographic (error, displacement): flat-tied errors must
            # resolve to the smallest motion, not the first candidate
            take = (err < best_err) | ((err == best_err) & (d < best_disp))
            best_err = np.where(take, err, best_err)
            best_disp = np.where(take, d, best_disp)
    mags = [float(np.quantile(best_disp[f][textured[f]], 0.95))
            for f in range(t - 1) if textured[f].any()]
    return float(np.mean(mags)) if mags else 0.0


def dynamic_degree(video: np.ndarray, threshold: float = 0.5) -> bool:
    """VBench's thresholded 'dynamic degree': is there real motion? VBench
    binarizes RAFT flow magnitude; here the block-matching estimate above
    is compared against ``threshold`` (in downsampled pixels/frame). The
    set-level score is the FRACTION of dynamic videos."""
    return bool(_block_flow_magnitude(video) > threshold)


def motion_smoothness(video: np.ndarray) -> float:
    """Second-order smoothness in [0, 1]: how well each frame is linearly
    interpolated from its neighbours (VBench scores an AMT interpolator's
    reconstruction error; same idea, analytic interpolator), relative to
    the zeroth-order hold-last-frame predictor. Smooth trajectories make
    interpolation much better than holding (score → 1); temporally
    incoherent content gains nothing (score → ~0.13 for white noise).
    Luma is 4x4 average-pooled first so hard-edge aliasing does not
    dominate the pixel-space interpolation error."""
    y = _luma(np.asarray(video, np.float64))
    t, h, w = y.shape
    if t < 3:
        return 1.0
    hp, wp = (h // 4) * 4, (w // 4) * 4
    y = y[:, :hp, :wp].reshape(t, hp // 4, 4, wp // 4, 4).mean(axis=(2, 4))
    interp_err = np.abs(y[1:-1] - (y[:-2] + y[2:]) / 2.0).mean()
    hold_err = np.abs(y[1:-1] - y[:-2]).mean()
    if hold_err < 1e-9:
        return 1.0  # static video: trivially smooth
    return float(np.clip(1.0 - interp_err / hold_err, 0.0, 1.0))


def imaging_quality(video: np.ndarray) -> float:
    """No-reference frame quality in [0, 1] (MUSIQ stand-in): Laplacian-
    energy sharpness saturating at a natural-image level, damped by an
    exposure-clipping penalty (fraction of pixels at the [-1, 1] rails)."""
    y = _luma(np.asarray(video, np.float64))
    lap = (
        -4.0 * y[:, 1:-1, 1:-1]
        + y[:, :-2, 1:-1] + y[:, 2:, 1:-1] + y[:, 1:-1, :-2] + y[:, 1:-1, 2:]
    )
    sharp = float(np.sqrt(np.mean(lap**2)))
    sharpness = min(sharp / 0.15, 1.0)  # ~0.15 = crisp natural footage
    clipped = float(np.mean(np.abs(video) > 0.995))
    return float(sharpness * (1.0 - min(4.0 * clipped, 1.0)))


def aesthetic_quality(video: np.ndarray, scorer, head,
                      max_frames: int = 8) -> float:
    """VBench 'aesthetic quality': mean over sampled frames of the LAION
    aesthetic predictor's score on the frame's L2-normalized CLIP embedding,
    divided by 10 and clipped to [0, 1] (the official normalization)."""
    emb = scorer.embed_frames(video, max_frames=max_frames)
    return float(np.clip(head(emb) / 10.0, 0.0, 1.0).mean())


_STYLE_RE = re.compile(
    # branch 2 must be a COMMA/SEMICOLON-DELIMITED TRAILING clause (the
    # VBench style-suite convention "..., oil painting style"): an
    # unanchored "<words> style" over-matched generic prose like
    # "A style icon ..." and diluted the dimension average (ADVICE r3)
    r"\bin the style of ([^,.;]+)"
    r"|[,;]\s*([A-Za-z][A-Za-z0-9 .'&-]*?)\s+style\b(?=\s*[,.;!?]|\s*$)",
    re.IGNORECASE,
)


def extract_style_phrase(text: str) -> Optional[str]:
    """Pull the style phrase out of a VBench-style prompt.

    Matches both suite conventions: ``..., in the style of Van Gogh`` and
    ``..., oil painting style`` (the latter only as a trailing
    comma-delimited clause). Returns the normalized phrase
    (``"in the style of ..." / "... style"``) or None."""
    m = _STYLE_RE.search(text or "")
    if not m:
        return None
    if m.group(1):
        return f"in the style of {m.group(1).strip()}"
    return f"{m.group(2).strip()} style"


def appearance_style(video: np.ndarray, style_text: str, scorer,
                     max_frames: int = 8) -> float:
    """VBench 'appearance style': mean CLIP cosine between sampled frame
    embeddings and the style phrase's text embedding (the official recipe
    family — this dimension uses CLIP directly, no detector; official
    VBench runs it on CLIP ViT-B/32 while the scorer here is ViT-L/14 —
    documented backbone deviation)."""
    emb = scorer.embed_frames(video, max_frames=max_frames)
    t = scorer.embed_text(style_text)
    return float((emb @ t).mean())


# VBench's temporal-style suite appends one of these camera/tempo phrases
# to the prompt (suite convention: a trailing comma-delimited clause)
_TEMPORAL_STYLES = (
    "camera pans left", "camera pans right", "camera tilts up",
    "camera tilts down", "zoom in", "zoom out", "in super slow motion",
    "racking focus",
)
_TEMPORAL_STYLE_RE = re.compile(
    r"[,;]\s*(" + "|".join(re.escape(s) for s in _TEMPORAL_STYLES) + r")\s*[.!?]?\s*$",
    re.IGNORECASE,
)


def extract_temporal_style_phrase(text: str) -> Optional[str]:
    """Temporal-style phrase (camera motion / tempo) from a VBench
    temporal-style prompt — lexicon-gated so generic prose never
    matches."""
    m = _TEMPORAL_STYLE_RE.search(text or "")
    return m.group(1).strip().lower() if m else None


def temporal_style(video: np.ndarray, style_text: str, scorer,
                   max_frames: int = 8) -> float:
    """VBench 'temporal style': consistency between the video and the
    prompt's temporal-style (camera motion) phrase. Official VBench scores
    it with ViCLIP's video encoder; that backbone is not in this
    zero-egress image, so the proxy scores the mean CLIP cosine between
    sampled FRAME embeddings and the phrase (the appearance_style recipe
    family applied to the temporal phrase — documented proxy: per-frame
    CLIP cannot see motion direction, only its visual correlates)."""
    emb = scorer.embed_frames(video, max_frames=max_frames)
    t = scorer.embed_text(style_text)
    return float((emb @ t).mean())


def evaluate_videos(videos: List[np.ndarray], texts: List[str],
                    clip_scorer=None, aesthetic_head=None) -> Dict[str, float]:
    out = {
        "temporal_consistency": float(
            np.mean([temporal_consistency(v) for v in videos])
        ),
        "motion_magnitude": float(np.mean([motion_magnitude(v) for v in videos])),
        "temporal_flickering": float(
            np.mean([temporal_flickering(v) for v in videos])
        ),
        "motion_smoothness": float(
            np.mean([motion_smoothness(v) for v in videos])
        ),
        "dynamic_degree": float(
            np.mean([float(dynamic_degree(v)) for v in videos])
        ),
        "imaging_quality": float(np.mean([imaging_quality(v) for v in videos])),
    }
    if clip_scorer is not None:
        out["clip_score"] = float(
            np.mean([clip_score(v, t, clip_scorer) for v, t in zip(videos, texts)])
        )
        out["subject_consistency"] = float(
            np.mean([subject_consistency(v, clip_scorer) for v in videos])
        )
        out["background_consistency"] = float(
            np.mean([background_consistency(v, clip_scorer) for v in videos])
        )
        if aesthetic_head is not None:
            out["aesthetic_quality"] = float(np.mean(
                [aesthetic_quality(v, clip_scorer, aesthetic_head)
                 for v in videos]
            ))
        styled = [
            (v, s) for v, t in zip(videos, texts)
            if (s := extract_style_phrase(t)) is not None
        ]
        if styled:
            out["appearance_style"] = float(np.mean(
                [appearance_style(v, s, clip_scorer) for v, s in styled]
            ))
        t_styled = [
            (v, s) for v, t in zip(videos, texts)
            if (s := extract_temporal_style_phrase(t)) is not None
        ]
        if t_styled:
            out["temporal_style"] = float(np.mean(
                [temporal_style(v, s, clip_scorer) for v, s in t_styled]
            ))
    return out
