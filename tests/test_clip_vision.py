"""CLIP vision tower + CLIPScorer parity vs HuggingFace torch CLIP with
identical (random) weights — validates the ViT math, the converter, and the
projection-space scoring path without network access (mirrors
test_text_parity.py)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _hf_vision_cfg():
    from transformers import CLIPVisionConfig as HFVisionConfig

    return HFVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=16, hidden_act="quick_gelu", attention_dropout=0.0,
    )


def test_clip_vision_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionModel as HFCLIPVisionModel

    from opensora_tpu.models.text.clip import CLIPVisionConfig, CLIPVisionModel
    from opensora_tpu.utils.ckpt import convert_clip_vision_state_dict

    torch.manual_seed(0)
    hf = HFCLIPVisionModel(_hf_vision_cfg()).eval()
    px = np.random.default_rng(0).normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf(pixel_values=torch.tensor(px))
        ref_hidden = hf_out.last_hidden_state.numpy()
        ref_pooled = hf_out.pooler_output.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_vision_state_dict(sd)
    cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_layers=2, num_heads=2,
        image_size=28, patch_size=14, projection_dim=16,
    )
    hidden, pooled = CLIPVisionModel(cfg).apply({"params": params}, jnp.asarray(px))
    assert np.abs(np.asarray(hidden) - ref_hidden).max() < 2e-4
    assert np.abs(np.asarray(pooled) - ref_pooled).max() < 2e-4


def test_clip_scorer_matches_hf_clipmodel(tmp_path):
    """End-to-end: save a random HF CLIPModel, load through
    CLIPScorer.from_pretrained, compare the video-text score against torch
    CLIPModel's image/text embeds on the same frames/ids."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HFTextConfig

    text_cfg = HFTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, eos_token_id=98, bos_token_id=97,
        hidden_act="quick_gelu", attention_dropout=0.0, projection_dim=16,
    )
    cfg = CLIPConfig.from_text_vision_configs(
        text_cfg, _hf_vision_cfg(), projection_dim=16
    )
    torch.manual_seed(1)
    hf = CLIPModel(cfg).eval()
    ckpt_dir = tmp_path / "clip"
    ckpt_dir.mkdir()
    save_file(
        {k: v.contiguous() for k, v in hf.state_dict().items()},
        str(ckpt_dir / "model.safetensors"),
    )
    cfg.to_json_file(str(ckpt_dir / "config.json"))  # head counts live here

    from opensora_tpu.eval.clip_scorer import CLIPScorer, preprocess_frames

    scorer = CLIPScorer.from_pretrained(str(ckpt_dir))
    assert scorer.tokenizer is None  # no tokenizer files → byte fallback

    rng = np.random.default_rng(1)
    video = rng.uniform(-1, 1, (3, 4, 32, 40)).astype(np.float32)  # (C,T,H,W)
    score = scorer(video, "a red ball")
    assert np.isfinite(score) and -1.0 <= score <= 1.0

    # torch reference on identical preprocessed frames + token ids
    px = preprocess_frames(video, 28)
    ids = np.asarray(
        __import__(
            "opensora_tpu.models.text.conditioner", fromlist=["ByteFallbackTokenizer"]
        ).ByteFallbackTokenizer(99, 16, 98)(["a red ball"])
    )
    with torch.no_grad():
        img_emb = hf.get_image_features(pixel_values=torch.tensor(px)).numpy()
        txt_emb = hf.get_text_features(input_ids=torch.tensor(ids, dtype=torch.long)).numpy()
    img_emb = img_emb / np.linalg.norm(img_emb, axis=-1, keepdims=True)
    # CLIPScore: mean of per-frame cosines == mean(normalized frames) @ t̂
    v = img_emb.mean(axis=0)
    t = txt_emb[0] / np.linalg.norm(txt_emb[0])
    assert abs(score - float(v @ t)) < 2e-4


def test_subject_consistency_orders_static_vs_noise(tmp_path):
    """A static video must score higher subject consistency than per-frame
    independent noise, and sit near 1.0 (unit frame embeddings)."""
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HFTextConfig

    text_cfg = HFTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, eos_token_id=98, bos_token_id=97,
        hidden_act="quick_gelu", attention_dropout=0.0, projection_dim=16,
    )
    cfg = CLIPConfig.from_text_vision_configs(
        text_cfg, _hf_vision_cfg(), projection_dim=16
    )
    torch.manual_seed(2)
    hf = CLIPModel(cfg).eval()
    d = tmp_path / "clip"
    d.mkdir()
    save_file(
        {k: v.contiguous() for k, v in hf.state_dict().items()},
        str(d / "model.safetensors"),
    )
    cfg.to_json_file(str(d / "config.json"))

    from opensora_tpu.eval.clip_scorer import CLIPScorer
    from opensora_tpu.eval.vbench import subject_consistency

    scorer = CLIPScorer.from_pretrained(str(d))
    rng = np.random.default_rng(3)
    frame = rng.uniform(-1, 1, (3, 1, 32, 32)).astype(np.float32)
    static = np.repeat(frame, 6, axis=1)
    noise = rng.uniform(-1, 1, (3, 6, 32, 32)).astype(np.float32)
    s_static = subject_consistency(static, scorer)
    s_noise = subject_consistency(noise, scorer)
    assert s_static > 0.999
    assert s_static > s_noise
