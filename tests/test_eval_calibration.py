"""Eval-proxy calibration: a FIXED synthetic fixture set with a known
quality ordering per dimension; every dimension must reproduce the full
rank order, not just a pairwise split (VERDICT r3 item 7). The
per-dimension recipe fidelity vs official VBench is tabulated in
docs/eval.md; these fixtures are the regression instrument that keeps the
proxies honest (the official detector backbones are not in this
zero-egress image, so absolute-score comparison is impossible — rank
agreement on controlled content is the calibration we can run)."""

import numpy as np
import pytest

from opensora_tpu.eval.vbench import (
    _consistency_from_embeddings,
    dynamic_degree,
    extract_temporal_style_phrase,
    imaging_quality,
    motion_smoothness,
    temporal_consistency,
    temporal_flickering,
)


def _scene(t=10, h=48, w=64, dx=0, flicker=0.0, blur=0, noise=0.0, seed=0):
    """Deterministic clip: textured background + translating square, with
    controllable motion (dx px/frame), global flicker amplitude, box-blur
    passes, and pixel noise."""
    rng = np.random.default_rng(seed)
    bg = rng.uniform(-0.5, 0.3, (3, 1, h, w)).astype(np.float32)
    v = np.repeat(bg, t, axis=1)
    for f in range(t):
        x0 = (4 + dx * f) % (w - 16)
        v[:, f, 12:28, x0:x0 + 16] = 0.8
        if flicker:
            v[:, f] += flicker * (1 if f % 2 else -1)
    if noise:
        v += rng.normal(0, noise, v.shape).astype(np.float32)
    for _ in range(blur):  # blur AFTER noise so it degrades real detail
        v = (
            np.roll(v, 1, axis=2) + np.roll(v, -1, axis=2)
            + np.roll(v, 1, axis=3) + np.roll(v, -1, axis=3) + v
        ) / 5.0
    return np.clip(v, -1, 1).astype(np.float32)


def _ranked(metric, clips):
    """Assert metric(clips[0]) > metric(clips[1]) > ... (strict)."""
    scores = [metric(c) for c in clips]
    for a, b in zip(scores, scores[1:]):
        assert a > b, f"rank order violated: {scores}"
    return scores


def test_temporal_flickering_rank():
    # official formula (1 - MAE/255): less flicker must rank higher
    _ranked(temporal_flickering,
            [_scene(flicker=0.0), _scene(flicker=0.1), _scene(flicker=0.3)])


def test_temporal_consistency_rank():
    _ranked(temporal_consistency,
            [_scene(dx=0, noise=0.01), _scene(dx=2, noise=0.01),
             _scene(dx=6, noise=0.01)])


def test_motion_smoothness_rank():
    rng = np.random.default_rng(5)
    jitter = _scene(dx=2)
    # same trajectory + per-frame positional jitter = less interpolable
    for f in range(1, jitter.shape[1], 2):
        jitter[:, f] = np.roll(jitter[:, f], 2, axis=-1)
    noise = np.clip(rng.normal(0, 0.5, jitter.shape), -1, 1).astype(np.float32)
    # alternating positional jitter is maximally non-interpolable — worse
    # than white noise under a linear-interpolation predictor
    _ranked(motion_smoothness, [_scene(dx=2), noise, jitter])


def test_imaging_quality_rank():
    _ranked(imaging_quality,
            [_scene(noise=0.05), _scene(noise=0.05, blur=2),
             _scene(noise=0.05, blur=6)])


def test_dynamic_degree_threshold_calibration():
    # the binarization must separate genuinely static / sub-threshold
    # micro-motion / real motion the way VBench's RAFT threshold does
    assert not dynamic_degree(_scene(dx=0))
    assert not dynamic_degree(_scene(dx=0, noise=0.02))  # noise is not motion
    assert dynamic_degree(_scene(dx=3))
    assert dynamic_degree(_scene(dx=6))


def test_consistency_formula_rank_on_controlled_embeddings():
    """subject/background consistency share one formula; calibrate it on
    synthetic unit embeddings with known drift: identical > slow drift >
    orthogonal-ish frames. (With a real CLIP tower, similar frames give
    similar embeddings, so formula-level rank transfers.)"""
    rng = np.random.default_rng(0)

    def drift(step):
        e = rng.standard_normal((8, 32))
        base = rng.standard_normal(32)
        emb = np.stack([base + step * e[i] for i in range(8)])
        return emb / np.linalg.norm(emb, axis=1, keepdims=True)

    s0 = _consistency_from_embeddings(drift(0.0))
    s1 = _consistency_from_embeddings(drift(0.3))
    s2 = _consistency_from_embeddings(drift(2.0))
    assert s0 == pytest.approx(1.0, abs=1e-6)
    assert s0 > s1 > s2


def test_temporal_style_phrase_lexicon():
    assert extract_temporal_style_phrase("a busy market, zoom in") == "zoom in"
    assert (extract_temporal_style_phrase("a dog runs, camera pans left.")
            == "camera pans left")
    # lexicon-gated: generic prose with the words mid-sentence never matches
    assert extract_temporal_style_phrase("zoom in on life lessons") is None
    assert extract_temporal_style_phrase("no camera phrase here") is None
