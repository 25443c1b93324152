"""VBench-style evaluation components.

The reference tracks VBench externally (README.md:290-302); its eval folder
is not in the tree (SURVEY.md §4), so this harness is written fresh. All 16
official dimensions are implemented (VBench name → recipe here; deviations from the
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

The detection-suite dimensions (official backbones GRiT / Tag2Text / UMT,
none available in this zero-egress image) are implemented as CLIP
ZERO-SHOT VOTING proxies — per sampled frame, the target phrase competes
against a distractor vocabulary in CLIP space and the frame votes for the
argmax; the video's score is its frame-vote fraction and the set-level
score is the mean over applicable videos (VBench likewise reports
detection success rates over each dimension's own prompt suite):

- **object_class** (official: GRiT detection): frame votes "a photo of a
  {class}" against ``_OBJECT_VOCAB`` distractors.
- **multiple_objects** (official: GRiT detects BOTH): a frame votes
  success only if EACH prompted object wins its own vocabulary vote.
- **color** (official: GRiT attribute): "a {color} {object}" against the
  same object in every other ``_COLOR_VOCAB`` color.
- **spatial_relationship** (official: GRiT box geometry): the prompted
  relation phrase against the SWAPPED relation (left<->right,
  above<->below) — a weak diagnostic: CLIP is known to be poor at
  spatial composition; documented as such.
- **scene** (official: Tag2Text captioning): zero-shot vote against
  ``_SCENE_VOCAB``.
- **human_action** (official: UMT video recognition): "a person is
  {action}" against ``_ACTION_VOCAB`` (per-frame proxy of a video
  backbone).
- **overall_consistency** (official: ViCLIP text-video): reported as the
  CLIP text-video similarity (= clip_score on the full prompt) — same
  quantity through an image backbone.

Each applies only to samples whose prompt (or explicit ``meta`` entry)
carries the dimension's slot — mirroring VBench, where every dimension
has its own prompt suite. Prompts are parsed with the official suites'
templates ("a photo of a {x}", "a photo of a {a} and a {b}",
"a {color} {obj}", "a person is {action}", "{a} on the left of {b}");
``meta`` dicts override parsing (keys: object / objects / color+object /
scene / action / spatial)."""

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


# ======================================================
# Detection-suite proxies (CLIP zero-shot voting)
# ======================================================

# Distractor vocabularies for the zero-shot votes. Drawn from the object /
# color / scene / action categories the official suites sample from (COCO
# classes, base colors, Places-style scenes, Kinetics-style actions); the
# exact official lists ship with VBench's prompt JSONs, which are not in
# this image — callers can pass their own ``vocab=`` to match them exactly.
_OBJECT_VOCAB = (
    "person", "cat", "dog", "horse", "sheep", "cow", "elephant", "bear",
    "zebra", "giraffe", "bird", "airplane", "bicycle", "car", "motorcycle",
    "bus", "train", "truck", "boat", "bench", "backpack", "umbrella",
    "suitcase", "frisbee", "skateboard", "surfboard", "bottle", "cup",
    "bowl", "banana", "apple", "sandwich", "orange", "pizza", "cake",
    "chair", "couch", "bed", "laptop", "clock", "vase", "teddy bear",
)
_COLOR_VOCAB = (
    "red", "orange", "yellow", "green", "blue", "purple", "pink",
    "black", "white", "brown", "gray",
)
_SCENE_VOCAB = (
    "alley", "amusement park", "aquarium", "beach", "botanical garden",
    "bridge", "castle", "cliff", "desert", "forest", "fountain", "glacier",
    "harbor", "highway", "lake", "library", "lighthouse", "mountain",
    "ocean", "office", "rainforest", "restaurant", "skyscraper", "street",
    "temple", "tower", "underwater", "valley", "village", "waterfall",
)
_ACTION_VOCAB = (
    "dancing", "running", "swimming", "cooking", "reading a book",
    "playing guitar", "playing piano", "riding a bike", "riding a horse",
    "climbing", "surfing", "skiing", "drinking coffee", "eating",
    "laughing", "painting", "singing", "typing on a keyboard",
    "doing yoga", "playing basketball",
)

_SPATIAL_SWAP = {
    "left": "right", "right": "left",
    "top": "bottom", "bottom": "top",
    "above": "below", "below": "above",
}

_ARTICLE = r"(?:a|an|the)"
_OBJ_WORD = r"[A-Za-z][A-Za-z '-]*?"
_OBJECT_RE = re.compile(
    rf"^a (?:photo|video) of {_ARTICLE} ({_OBJ_WORD})\s*[.!?]?\s*$", re.IGNORECASE
)
_MULTI_RE = re.compile(
    rf"^a (?:photo|video) of {_ARTICLE} ({_OBJ_WORD}) and {_ARTICLE} ({_OBJ_WORD})\s*[.!?]?\s*$",
    re.IGNORECASE,
)
_COLOR_RE = re.compile(
    rf"^a ({'|'.join(_COLOR_VOCAB)}) ({_OBJ_WORD})\s*[.!?]?\s*$", re.IGNORECASE
)
_ACTION_RE = re.compile(
    r"^a person is ([a-z][a-z '-]+?)\s*[.!?]?\s*$", re.IGNORECASE
)
_SPATIAL_RE = re.compile(
    rf"^{_ARTICLE} ({_OBJ_WORD}) (?:is )?"
    rf"(?:on|to) the (left|right|top|bottom) (?:side )?of {_ARTICLE} ({_OBJ_WORD})\s*[.!?]?\s*$",
    re.IGNORECASE,
)


def _zero_shot_votes(video, scorer, texts: List[str], max_frames: int = 8):
    """Per-frame softmax-free argmax vote: (frames x texts) cosine matrix;
    returns the per-frame winner indices (CLIP embeddings are unit-norm, so
    argmax cosine == argmax logit)."""
    emb = scorer.embed_frames(video, max_frames=max_frames)       # (N, d)
    txt = np.stack([scorer.embed_text(t) for t in texts])          # (K, d)
    return np.argmax(emb @ txt.T, axis=1)                          # (N,)


def _vote_fraction(video, scorer, target: str, distractors, template: str,
                   max_frames: int = 8) -> float:
    pool = [target] + [d for d in distractors if d.lower() != target.lower()]
    wins = _zero_shot_votes(
        video, scorer, [template.format(x) for x in pool], max_frames
    )
    return float(np.mean(wins == 0))


def object_class(video: np.ndarray, cls: str, scorer,
                 vocab=_OBJECT_VOCAB, max_frames: int = 8) -> float:
    """VBench 'object class' (official: GRiT detection success) — CLIP
    zero-shot proxy: fraction of sampled frames voting "a photo of a
    {cls}" over the distractor vocabulary."""
    return _vote_fraction(video, scorer, cls, vocab, "a photo of a {}",
                          max_frames)


def multiple_objects(video: np.ndarray, cls_a: str, cls_b: str, scorer,
                     vocab=_OBJECT_VOCAB, max_frames: int = 8) -> float:
    """VBench 'multiple objects' (official: BOTH objects detected) — frame
    succeeds only if each prompted object wins its own vocabulary vote."""
    emb = scorer.embed_frames(video, max_frames=max_frames)
    ok = np.ones(emb.shape[0], dtype=bool)
    for cls in (cls_a, cls_b):
        pool = [cls] + [d for d in vocab if d.lower() != cls.lower()]
        txt = np.stack([scorer.embed_text(f"a photo of a {x}") for x in pool])
        ok &= np.argmax(emb @ txt.T, axis=1) == 0
    return float(np.mean(ok))


def color(video: np.ndarray, color_name: str, obj: str, scorer,
          vocab=_COLOR_VOCAB, max_frames: int = 8) -> float:
    """VBench 'color' (official: GRiT attribute) — the prompted color must
    win against the SAME object in every other color."""
    return _vote_fraction(
        video, scorer, color_name, vocab, "a {} " + obj, max_frames
    )


def spatial_relationship(video: np.ndarray, obj_a: str, relation: str,
                         obj_b: str, scorer, max_frames: int = 8) -> float:
    """VBench 'spatial relationship' (official: GRiT box geometry) — the
    prompted relation phrase vs the SWAPPED relation. A weak diagnostic:
    CLIP is known to be poor at spatial composition (documented)."""
    swapped = _SPATIAL_SWAP[relation.lower()]
    wins = _zero_shot_votes(
        video, scorer,
        [f"a {obj_a} on the {relation} of a {obj_b}",
         f"a {obj_a} on the {swapped} of a {obj_b}"],
        max_frames,
    )
    return float(np.mean(wins == 0))


def scene(video: np.ndarray, scene_name: str, scorer,
          vocab=_SCENE_VOCAB, max_frames: int = 8) -> float:
    """VBench 'scene' (official: Tag2Text captioning) — zero-shot scene
    vote against the scene vocabulary."""
    return _vote_fraction(video, scorer, scene_name, vocab,
                          "a photo of the {}", max_frames)


def human_action(video: np.ndarray, action: str, scorer,
                 vocab=_ACTION_VOCAB, max_frames: int = 8) -> float:
    """VBench 'human action' (official: UMT video recognition) — per-frame
    zero-shot vote for "a person is {action}" (a frame-level proxy of a
    video backbone: motion-defined actions lean on visual correlates)."""
    return _vote_fraction(video, scorer, action, vocab,
                          "a person is {}", max_frames)


def extract_object_class(text: str) -> Optional[str]:
    """'a photo of a {cls}' (the object_class suite template) → cls."""
    if _MULTI_RE.match(text or ""):
        return None  # the two-object template is the multiple_objects suite
    m = _OBJECT_RE.match(text or "")
    return m.group(1).strip().lower() if m else None


def extract_multiple_objects(text: str) -> Optional[tuple]:
    """'a photo of a {a} and a {b}' → (a, b)."""
    m = _MULTI_RE.match(text or "")
    return (m.group(1).strip().lower(), m.group(2).strip().lower()) if m else None


def extract_color_object(text: str) -> Optional[tuple]:
    """'a {color} {obj}' → (color, obj); the color must be in the suite's
    color list so ordinary prompts ('a big dog') never match."""
    m = _COLOR_RE.match(text or "")
    return (m.group(1).lower(), m.group(2).strip().lower()) if m else None


def extract_human_action(text: str) -> Optional[str]:
    """'a person is {action}' → action."""
    m = _ACTION_RE.match(text or "")
    return m.group(1).strip().lower() if m else None


def extract_spatial_relationship(text: str) -> Optional[tuple]:
    """'a {a} on the {rel} of a {b}' → (a, rel, b)."""
    m = _SPATIAL_RE.match(text or "")
    if not m:
        return None
    return (m.group(1).strip().lower(), m.group(2).lower(),
            m.group(3).strip().lower())


def evaluate_videos(videos: List[np.ndarray], texts: List[str],
                    clip_scorer=None, aesthetic_head=None,
                    meta: Optional[List[dict]] = None) -> Dict[str, float]:
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

        # detection-suite proxies: each applies only to samples whose
        # prompt matches its suite template (or whose ``meta`` entry names
        # the slot explicitly, which takes precedence)
        def _slot(i, key, extractor):
            if meta is not None and i < len(meta) and meta[i] and key in meta[i]:
                return meta[i][key]
            return extractor(texts[i])

        def _dim(name, key, extractor, fn):
            vals = [
                fn(videos[i], s) for i in range(len(videos))
                if (s := _slot(i, key, extractor)) is not None
            ]
            if vals:
                out[name] = float(np.mean(vals))

        _dim("object_class", "object", extract_object_class,
             lambda v, s: object_class(v, s, clip_scorer))
        _dim("multiple_objects", "objects", extract_multiple_objects,
             lambda v, s: multiple_objects(v, s[0], s[1], clip_scorer))
        _dim("color", "color_object", extract_color_object,
             lambda v, s: color(v, s[0], s[1], clip_scorer))
        _dim("spatial_relationship", "spatial", extract_spatial_relationship,
             lambda v, s: spatial_relationship(v, s[0], s[1], s[2], clip_scorer))
        _dim("scene", "scene", lambda t: None,
             lambda v, s: scene(v, s, clip_scorer))
        _dim("human_action", "action", extract_human_action,
             lambda v, s: human_action(v, s, clip_scorer))
        # official overall_consistency is ViCLIP text-video similarity;
        # clip_score is the same quantity through the CLIP image towers
        if "clip_score" in out:
            out["overall_consistency"] = out["clip_score"]
    return out
