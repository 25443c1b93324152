"""Numerical parity of our JAX T5/CLIP encoders vs HuggingFace torch
implementations with identical (random) weights — validates both the model
math and the checkpoint converters without network access."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_t5_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5EncoderModel

    from opensora_tpu.models.text.t5 import T5Config, T5Encoder
    from opensora_tpu.utils.ckpt import convert_t5_state_dict

    hf_cfg = HFT5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", is_encoder_decoder=False,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    ids = np.array([[3, 7, 1, 0, 0], [5, 2, 9, 4, 1]], np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long)).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_t5_state_dict(sd)
    cfg = T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dtype="fp32",
    )
    ours = T5Encoder(cfg).apply({"params": params}, jnp.asarray(ids))
    assert np.abs(np.asarray(ours) - ref).max() < 2e-4, np.abs(np.asarray(ours) - ref).max()


def test_clip_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFCLIPConfig, CLIPTextModel as HFCLIPTextModel

    from opensora_tpu.models.text.clip import CLIPTextConfig, CLIPTextModel
    from opensora_tpu.utils.ckpt import convert_clip_text_state_dict

    hf_cfg = HFCLIPConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=98, bos_token_id=97,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = HFCLIPTextModel(hf_cfg).eval()
    ids = np.array([[97, 5, 7, 98, 0, 0], [97, 3, 2, 9, 4, 98]], np.int32)
    with torch.no_grad():
        hf_out = hf(input_ids=torch.tensor(ids, dtype=torch.long))
        ref_hidden = hf_out.last_hidden_state.numpy()
        ref_pooled = hf_out.pooler_output.numpy()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text_state_dict(sd)
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, max_position_embeddings=16, eos_token_id=98, dtype="fp32",
    )
    hidden, pooled = CLIPTextModel(cfg).apply({"params": params}, jnp.asarray(ids))
    assert np.abs(np.asarray(hidden) - ref_hidden).max() < 2e-4
    assert np.abs(np.asarray(pooled) - ref_pooled).max() < 2e-4
