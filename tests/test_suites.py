"""VBench per-dimension prompt suites (opensora_tpu/eval/suites.py):
every dimension ships its own prompt list (VERDICT r4 item 6 — the
reference evaluates on VBench's per-dimension suites, README.md:290-302).
Checks: all 16 dimensions build non-trivial suites, the detection-suite
prompts ROUND-TRIP through eval/vbench.py's template extractors with
targets inside the suite vocab, file overrides win, emit CSV works, and
evaluate_suite routes samples to their own dimension (non-CLIP dims
scored without any model weights)."""

import csv
import os

import numpy as np

from opensora_tpu.eval import vbench as V
from opensora_tpu.eval.suites import (
    DIMENSIONS,
    build_suite,
    emit_prompts_csv,
    evaluate_suite,
    load_suite,
    load_vocab,
)


def test_all_dimensions_build():
    vocab = load_vocab()
    for dim in DIMENSIONS:
        suite = build_suite(dim, vocab)
        assert len(suite) >= 60, f"{dim}: only {len(suite)} prompts"
        prompts = [p for p, _ in suite]
        assert len(set(prompts)) == len(prompts), f"{dim}: duplicates"


def test_detection_prompts_round_trip():
    """Every generated detection prompt must parse back through the
    official-template extractors, and the parsed target must be the meta
    slot the suite carries (so the scorer votes for the right phrase)."""
    vocab = load_vocab()

    for p, m in build_suite("object_class", vocab):
        got = V.extract_object_class(p)
        assert got == m["object"], (p, got, m)
        assert m["object"] in vocab["objects"]

    for p, m in build_suite("multiple_objects", vocab):
        got = V.extract_multiple_objects(p)
        assert got == tuple(m["objects"]), (p, got, m)

    for p, m in build_suite("color", vocab):
        got = V.extract_color_object(p)
        assert got == tuple(m["color_object"]), (p, got, m)
        assert m["color_object"][0] in vocab["colors"]

    for p, m in build_suite("human_action", vocab):
        got = V.extract_human_action(p)
        assert got == m["action"], (p, got, m)

    for p, m in build_suite("spatial_relationship", vocab):
        got = V.extract_spatial_relationship(p)
        assert got == tuple(m["spatial"]), (p, got, m)


def test_style_prompts_round_trip():
    vocab = load_vocab()
    n_style = sum(
        V.extract_style_phrase(p) is not None
        for p, _ in build_suite("appearance_style", vocab)
    )
    assert n_style == len(build_suite("appearance_style", vocab))
    n_temporal = sum(
        V.extract_temporal_style_phrase(p) is not None
        for p, _ in build_suite("temporal_style", vocab)
    )
    assert n_temporal == len(build_suite("temporal_style", vocab))


def test_official_file_override(tmp_path):
    d = tmp_path / "suites"
    d.mkdir()
    # vocab must exist for non-overridden dims
    import json as _json

    (d / "vocab.json").write_text(_json.dumps(load_vocab()))
    (d / "scene.official.txt").write_text("a photo of the moon\n\n")
    suite = load_suite("scene", str(d))
    assert suite == [("a photo of the moon", None)]


def test_emit_prompts_csv(tmp_path):
    path = tmp_path / "prompts.csv"
    n = emit_prompts_csv(str(path), dims=["object_class", "scene"])
    rows = list(csv.DictReader(open(path)))
    assert len(rows) == n
    dims = {r["dimension"] for r in rows}
    assert dims == {"object_class", "scene"}
    assert all(r["text"] for r in rows)


def test_evaluate_suite_routes_by_membership():
    """Samples whose prompts come from a dimension's suite are scored
    under that dimension (and only there); the CLIP-free dimensions
    produce scores with clip_scorer=None, CLIP-backed ones stay None."""
    vocab = load_vocab()
    flick = [p for p, _ in build_suite("temporal_flickering", vocab)][:2]
    dyn = [p for p, _ in build_suite("dynamic_degree", vocab)][:2]

    rng = np.random.default_rng(0)

    def vid(move):
        v = np.full((3, 6, 32, 32), -0.2, np.float32)
        for f in range(6):
            x0 = 2 + (3 * f if move else 0)
            v[:, f, 8:16, x0:x0 + 8] = 0.8
        return v + rng.normal(0, 0.01, v.shape).astype(np.float32)

    videos = [vid(False), vid(False), vid(True), vid(True)]
    texts = flick + dyn
    report = evaluate_suite(videos, texts, clip_scorer=None)
    assert report["temporal_flickering"]["n"] == 2
    assert report["dynamic_degree"]["n"] == 2
    assert report["temporal_flickering"]["score"] is not None
    assert report["dynamic_degree"]["score"] == 1.0  # both moving videos
    # CLIP-backed dimension with no scorer: counted, not scored
    assert report["object_class"]["n"] == 0
    assert report["_summary"]["samples_matched"] == 4
    # explicit sidecar dimension overrides suite membership
    report2 = evaluate_suite(
        videos[:1], ["not in any suite"], clip_scorer=None,
        meta=[{"dimension": "imaging_quality"}],
    )
    assert report2["imaging_quality"]["n"] == 1
    assert report2["imaging_quality"]["score"] is not None
