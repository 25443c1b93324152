"""New VBench dimensions (background consistency, dynamic degree, motion
smoothness, imaging quality) + the eval CLI driven end-to-end: synthetic
videos → save_sample mp4/png + prompt txts → scripts/eval.py subprocess →
JSON report with >= 6 VBench-style dimensions (VERDICT r2 item 8; the
reference tracks these externally, README.md:290-302)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from opensora_tpu.eval.vbench import (
    dynamic_degree,
    evaluate_videos,
    imaging_quality,
    motion_smoothness,
    temporal_consistency,
    temporal_flickering,
)

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _moving_video(t=8, h=48, w=64, dx=3, noise=0.0, seed=0):
    """A bright square translating dx px/frame on a grey background."""
    rng = np.random.default_rng(seed)
    v = np.full((3, t, h, w), -0.2, np.float32)
    for f in range(t):
        x0 = 4 + dx * f
        v[:, f, 12:28, x0:x0 + 16] = 0.8
    if noise:
        v += rng.normal(0, noise, v.shape).astype(np.float32)
    return np.clip(v, -1, 1)


def test_dynamic_degree_separates_static_from_moving():
    static = _moving_video(dx=0)
    moving = _moving_video(dx=4)
    assert not dynamic_degree(static)
    assert dynamic_degree(moving)


def test_motion_smoothness_orders_linear_vs_flicker():
    linear = _moving_video(dx=2)
    rng = np.random.default_rng(3)
    flicker = np.clip(
        rng.normal(0, 0.5, (3, 8, 48, 64)).astype(np.float32), -1, 1
    )
    assert motion_smoothness(linear) > motion_smoothness(flicker)
    assert motion_smoothness(np.zeros((3, 2, 8, 8), np.float32)) == 1.0


def test_imaging_quality_orders_sharp_vs_blurred_and_clipped():
    sharp = _moving_video(noise=0.05)
    # 5-tap box blur along H and W
    blurred = sharp.copy()
    for _ in range(3):
        blurred = (
            np.roll(blurred, 1, axis=2) + np.roll(blurred, -1, axis=2)
            + np.roll(blurred, 1, axis=3) + np.roll(blurred, -1, axis=3)
            + blurred
        ) / 5.0
    assert imaging_quality(sharp) > imaging_quality(blurred)
    clipped = np.sign(sharp).astype(np.float32)  # everything at the rails
    assert imaging_quality(clipped) < imaging_quality(sharp)


def test_evaluate_videos_reports_all_unscored_dimensions():
    vids = [_moving_video(), _moving_video(dx=0)]
    rep = evaluate_videos(vids, ["a", "b"], clip_scorer=None)
    for k in ("temporal_consistency", "motion_magnitude", "motion_smoothness",
              "dynamic_degree", "imaging_quality"):
        assert k in rep and np.isfinite(rep[k]), k
    assert rep["dynamic_degree"] == 0.5  # one of two is dynamic


def _tiny_clip_ckpt(dirname):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
    from transformers import (
        CLIPConfig,
        CLIPModel,
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    text_cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, eos_token_id=98, bos_token_id=97,
        hidden_act="quick_gelu", attention_dropout=0.0, projection_dim=16,
    )
    vis_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=16, hidden_act="quick_gelu", attention_dropout=0.0,
    )
    cfg = CLIPConfig.from_text_vision_configs(text_cfg, vis_cfg,
                                              projection_dim=16)
    torch.manual_seed(7)
    hf = CLIPModel(cfg).eval()
    os.makedirs(dirname, exist_ok=True)
    save_file(
        {k: v.contiguous() for k, v in hf.state_dict().items()},
        os.path.join(dirname, "model.safetensors"),
    )
    cfg.to_json_file(os.path.join(dirname, "config.json"))
    return dirname


def _tiny_aesthetic_ckpt(path, in_dim=16, seed=11):
    """A LAION-layout MLP state dict (nn.Sequential indices with dropouts
    at 1/3/5, like the published sac+logos+ava1 checkpoint) at tiny width."""
    torch = pytest.importorskip("torch")

    torch.manual_seed(seed)
    dims = [(in_dim, 24), (24, 8), (8, 4), (4, 2), (2, 1)]
    sd, seq_idx = {}, 0
    for i, (d_in, d_out) in enumerate(dims):
        sd[f"layers.{seq_idx}.weight"] = torch.randn(d_out, d_in) * 0.2
        sd[f"layers.{seq_idx}.bias"] = torch.randn(d_out) * 0.1
        seq_idx += 2 if i < 3 else 1  # dropouts occupy indices 1, 3, 5
    torch.save(sd, path)
    return path


def test_aesthetic_head_loads_and_scores(tmp_path):
    from opensora_tpu.eval.aesthetic import AestheticHead

    path = _tiny_aesthetic_ckpt(str(tmp_path / "aes.pth"))
    head = AestheticHead.from_pretrained(path)
    assert head.input_dim == 16
    emb = np.random.default_rng(0).standard_normal((5, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    scores = head(emb)
    assert scores.shape == (5,) and np.all(np.isfinite(scores))
    # numpy forward == the same affine stack in torch
    torch = pytest.importorskip("torch")
    x = torch.from_numpy(emb)
    sd = torch.load(path, weights_only=True)
    for i in sorted({int(k.split(".")[1]) for k in sd if k.endswith(".weight")}):
        x = x @ sd[f"layers.{i}.weight"].T + sd[f"layers.{i}.bias"]
    np.testing.assert_allclose(scores, x[:, 0].numpy(), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        head(np.zeros((2, 8), np.float32))  # wrong embedding width


def test_eval_cli_end_to_end(tmp_path):
    """scripts/eval.py over a real sample dir (mp4 via cv2 + a png + prompt
    txts + an orig/recn pair) with a tiny CLIP checkpoint: the CLI itself
    must produce >= 6 VBench-style dimensions plus reconstruction metrics."""
    from opensora_tpu.utils.inference import save_sample

    samples = tmp_path / "samples"
    samples.mkdir()
    for i, dx in enumerate((0, 3)):
        path = save_sample(
            _moving_video(dx=dx), str(samples / f"sample_{i:04d}"), fps=8
        )
        assert path.endswith(".mp4") and os.path.exists(path)
        prompt = ("a moving square, in the style of Van Gogh" if i == 1
                  else "a moving square")
        (samples / f"sample_{i:04d}.txt").write_text(prompt)
    # one still image goes through the png path
    save_sample(_moving_video(t=1), str(samples / "sample_0002"))
    # a reconstruction pair for the PSNR/SSIM branch
    v = _moving_video(seed=5)
    save_sample(v, str(samples / "pair_orig"), fps=8)
    save_sample(
        np.clip(v + 0.02, -1, 1), str(samples / "pair_recn"), fps=8
    )

    clip_dir = _tiny_clip_ckpt(str(tmp_path / "clip"))
    aes_path = _tiny_aesthetic_ckpt(str(tmp_path / "aes.pth"))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval.py"),
         "--samples", str(samples), "--clip", clip_dir,
         "--aesthetic", aes_path],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout)

    assert 0.0 <= report["aesthetic_quality"] <= 1.0
    # one prompt carries a style phrase → the CLIP-based appearance_style
    # dimension must be reported (over styled samples only)
    assert np.isfinite(report["appearance_style"])
    dims = {"clip_score", "subject_consistency", "background_consistency",
            "temporal_consistency", "motion_smoothness", "dynamic_degree",
            "imaging_quality", "motion_magnitude"}
    present = dims & set(report)
    assert len(present) >= 6, report
    for k in present:
        assert np.isfinite(report[k]), (k, report[k])
    assert report["num_samples"] == 5
    assert report["recon_psnr"] > 25.0
    assert 0.0 <= report["recon_ssim"] <= 1.0


def test_extract_style_phrase_both_conventions():
    from opensora_tpu.eval.vbench import extract_style_phrase

    assert (extract_style_phrase("a cat, in the style of Van Gogh")
            == "in the style of Van Gogh")
    assert (extract_style_phrase("a city street, oil painting style, 4k")
            == "oil painting style")
    assert extract_style_phrase("a plain prompt with no styling") is None
    assert extract_style_phrase("") is None


def test_temporal_consistency_static_is_one():
    assert temporal_consistency(_moving_video(dx=0)) > 0.999


def test_temporal_flickering_official_formula():
    """Static video scores exactly 1; motion strictly lowers it; the score
    equals 1 - MAE_uint8/255 by construction."""
    assert temporal_flickering(_moving_video(dx=0)) == 1.0
    moving = _moving_video(dx=3)
    score = temporal_flickering(moving)
    assert score < 1.0
    mae = np.abs(moving[:, 1:].astype(np.float64)
                 - moving[:, :-1].astype(np.float64)).mean() * 127.5
    np.testing.assert_allclose(score, 1.0 - mae / 255.0, rtol=1e-12)


# ---- detection-suite proxies (CLIP zero-shot voting, stub scorer) ----


class _StubScorer:
    """Deterministic CLIP stand-in: every text maps to a fixed random unit
    vector (seeded by the text); frames of a video embed as the vector of
    the concept the test declares the video to 'show'. Distinct random
    unit vectors at d=256 are near-orthogonal, so argmax votes are exact."""

    D = 256

    def __init__(self, shows: str):
        self._shows = shows

    def embed_text(self, text: str) -> np.ndarray:
        import hashlib

        digest = hashlib.sha256(text.strip().lower().encode()).digest()
        seed = int.from_bytes(digest[:4], "little")
        v = np.random.default_rng(seed).standard_normal(self.D)
        return (v / np.linalg.norm(v)).astype(np.float32)

    def embed_frames(self, video, max_frames: int = 8) -> np.ndarray:
        n = min(max_frames, video.shape[1])
        return np.stack([self.embed_text(self._shows)] * n)

    def __call__(self, video, text: str) -> float:
        emb = self.embed_frames(video)
        return float(emb.mean(axis=0) @ self.embed_text(text))


def test_detection_suite_extraction_templates():
    from opensora_tpu.eval import vbench as V

    assert V.extract_object_class("A photo of a dog") == "dog"
    assert V.extract_object_class("a video of an elephant.") == "elephant"
    # the two-object template belongs to multiple_objects, not object_class
    assert V.extract_object_class("a photo of a cat and a dog") is None
    assert V.extract_object_class("a dog runs through a field") is None
    assert V.extract_multiple_objects("a photo of a cat and a dog") == ("cat", "dog")
    assert V.extract_color_object("a red car") == ("red", "car")
    assert V.extract_color_object("a big car") is None
    assert V.extract_human_action("A person is playing guitar") == "playing guitar"
    assert V.extract_human_action("someone is running") is None
    assert V.extract_spatial_relationship("a cat on the left of a dog") == (
        "cat", "left", "dog"
    )
    assert V.extract_spatial_relationship("a cup is on the top of a table") == (
        "cup", "top", "table"
    )


def test_detection_suite_zero_shot_votes():
    from opensora_tpu.eval import vbench as V

    vid = np.zeros((3, 4, 8, 8), np.float32)
    dog = _StubScorer("a photo of a dog")
    assert V.object_class(vid, "dog", dog) == 1.0
    assert V.object_class(vid, "cat", dog) == 0.0
    # multiple objects: a frame showing only a dog fails the (cat AND dog) vote
    assert V.multiple_objects(vid, "dog", "cat", dog) == 0.0
    red_car = _StubScorer("a red car")
    assert V.color(vid, "red", "car", red_car) == 1.0
    assert V.color(vid, "blue", "car", red_car) == 0.0
    beach = _StubScorer("a photo of the beach")
    assert V.scene(vid, "beach", beach) == 1.0
    assert V.scene(vid, "forest", beach) == 0.0
    guitarist = _StubScorer("a person is playing guitar")
    assert V.human_action(vid, "playing guitar", guitarist) == 1.0
    assert V.human_action(vid, "swimming", guitarist) == 0.0
    left = _StubScorer("a cat on the left of a dog")
    assert V.spatial_relationship(vid, "cat", "left", "dog", left) == 1.0
    assert V.spatial_relationship(vid, "cat", "right", "dog", left) == 0.0


def test_evaluate_videos_detection_dims_and_meta_override():
    from opensora_tpu.eval import vbench as V

    vids = [np.zeros((3, 4, 8, 8), np.float32)] * 2
    texts = ["a photo of a dog", "wide shot of rolling waves"]
    rep = V.evaluate_videos(
        vids, texts, clip_scorer=_StubScorer("a photo of a dog"),
        meta=[None, {"scene": "beach"}],
    )
    # sample 1 parses as object_class; sample 2's meta names the scene slot
    assert rep["object_class"] == 1.0
    assert "scene" in rep
    assert rep["overall_consistency"] == rep["clip_score"]
