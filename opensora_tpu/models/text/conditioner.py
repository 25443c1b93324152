"""Text embedders: T5 (context tokens) and CLIP (pooled vector).

Behavioral reference: opensora/models/text/conditioner.py:9-74 (HFEmbedder).
Semantics preserved:
- T5 pads to max_length (512), then further pads so
  (added_tokens + txt_len) % seq_align == 0 — keeps the joint [txt, img]
  sequence divisible by the SP size (:41-47);
- CLIP truncates/pads to 77 and returns pooler_output (EOT hidden state).

The encoders are native JAX (models/text/t5.py, clip.py); HF tokenizers are
used when their assets are available locally, otherwise a deterministic
byte-fallback tokenizer keeps the pipeline runnable offline (tests, dev).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opensora_tpu.models.text.clip import CLIPTextConfig, CLIPTextModel, clip_l_config
from opensora_tpu.models.text.t5 import T5Config, T5Encoder, t5_xxl_config
from opensora_tpu.registry import MODELS


class ByteFallbackTokenizer:
    """Deterministic offline tokenizer: UTF-8 bytes shifted past specials.

    Token ids: 0 = pad, 1 = eos/eot; byte b → 2 + b. Clamped into the model
    vocab. This is NOT the T5/CLIP vocab — it exists so the full pipeline
    runs (and is reproducible) without HF tokenizer assets.
    """

    def __init__(self, vocab_size: int, max_length: int, eos_token_id: int = 1):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.pad_token_id = 0
        # clamp into vocab: an OOB id NaNs flax.nn.Embed via jnp.take's fill
        self.eos_token_id = min(eos_token_id, vocab_size - 1)

    def __call__(self, texts: List[str], max_length: Optional[int] = None) -> np.ndarray:
        max_length = max_length or self.max_length
        out = np.full((len(texts), max_length), self.pad_token_id, np.int32)
        for i, t in enumerate(texts):
            ids = [min(2 + b, self.vocab_size - 1) for b in t.encode("utf-8")]
            ids = ids[: max_length - 1] + [self.eos_token_id]
            out[i, : len(ids)] = ids
        return out


def _load_hf_tokenizer(from_pretrained: str, is_clip: bool, max_length: int):
    try:
        if is_clip:
            from transformers import CLIPTokenizer

            return CLIPTokenizer.from_pretrained(from_pretrained, max_length=max_length, local_files_only=True)
        from transformers import T5Tokenizer

        return T5Tokenizer.from_pretrained(from_pretrained, max_length=max_length, legacy=True, local_files_only=True)
    except Exception:
        return None


@MODELS.register_module("text_embedder")
class HFEmbedder:
    """Callable text → embeddings, mirroring reference HFEmbedder.forward."""

    def __init__(
        self,
        from_pretrained: str = "",
        max_length: int = 512,
        t5_config: Optional[T5Config] = None,
        clip_config: Optional[CLIPTextConfig] = None,
        params=None,
        rng_seed: int = 0,
        _tiny: bool = False,
        **_,
    ):
        self.is_clip = "openai" in from_pretrained or "clip" in from_pretrained.lower()
        self.max_length = max_length
        self.from_pretrained = from_pretrained

        if self.is_clip:
            from opensora_tpu.models.text.clip import clip_small_test_config

            self.config = clip_config or (clip_small_test_config() if _tiny else clip_l_config())
            self.module = CLIPTextModel(self.config)
            eos = self.config.eos_token_id
        else:
            from opensora_tpu.models.text.t5 import t5_small_test_config

            self.config = t5_config or (t5_small_test_config() if _tiny else t5_xxl_config())
            self.module = T5Encoder(self.config)
            eos = 1

        tok = _load_hf_tokenizer(from_pretrained, self.is_clip, max_length) if from_pretrained else None
        if tok is not None:
            self._hf_tokenizer = tok
            self.pad_token_id = tok.pad_token_id
        else:
            self._hf_tokenizer = None
            self._fallback = ByteFallbackTokenizer(self.config.vocab_size, max_length, eos)
            self.pad_token_id = 0

        if params is None:
            params = self._try_load_pretrained(from_pretrained)
        if params is None:
            dummy = jnp.zeros((1, 8), jnp.int32)
            params = self.module.init(jax.random.PRNGKey(rng_seed), dummy)
        self.params = params
        self._apply = jax.jit(lambda p, ids: self.module.apply(p, ids))

    def _try_load_pretrained(self, from_pretrained: str):
        """Load local HF torch weights through the converters in
        utils/ckpt.py (T5EncoderModel / CLIPTextModel layouts). Returns None
        when assets are unavailable (offline random-init fallback)."""
        if not from_pretrained:
            return None
        try:
            from opensora_tpu.utils.ckpt import (
                convert_clip_text_state_dict,
                convert_t5_state_dict,
            )

            if self.is_clip:
                from transformers import CLIPTextModel as HFModel
            else:
                from transformers import T5EncoderModel as HFModel

            hf = HFModel.from_pretrained(from_pretrained, local_files_only=True)
            sd = {k: v.numpy() for k, v in hf.state_dict().items()}
            conv = convert_clip_text_state_dict if self.is_clip else convert_t5_state_dict
            return {"params": conv(sd)}
        except Exception:
            return None

    def tokenize(self, text: List[str], max_length: Optional[int] = None) -> np.ndarray:
        max_length = max_length or self.max_length
        if self._hf_tokenizer is not None:
            enc = self._hf_tokenizer(
                text, truncation=True, max_length=max_length,
                padding="max_length", return_tensors="np",
            )
            return enc["input_ids"].astype(np.int32)
        return self._fallback(text, max_length)

    def __call__(self, text: List[str], added_tokens: int = 0, seq_align: int = 1) -> jnp.ndarray:
        if isinstance(text, str):
            text = [text]
        ids = self.tokenize(text)
        seq_len = ids.shape[1]
        if (added_tokens + seq_len) % seq_align != 0:
            num_pad = seq_align - (added_tokens + seq_len) % seq_align
            ids = np.pad(ids, ((0, 0), (0, num_pad)), constant_values=self.pad_token_id)
        out = self._apply(self.params, jnp.asarray(ids))
        if self.is_clip:
            return out[1]  # pooler_output
        return out  # last_hidden_state
