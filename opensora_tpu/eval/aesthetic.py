"""LAION aesthetic predictor head for the VBench 'aesthetic quality' dimension.

VBench scores aesthetic quality with the LAION improved-aesthetic-predictor:
an MLP head over the L2-normalized CLIP ViT-L/14 image embedding
(sac+logos+ava1 checkpoint). The head is architecturally trivial —
Linear(768,1024) → Linear(1024,128) → Linear(128,64) → Linear(64,16) →
Linear(16,1) with dropout between layers and NO activations (dropout is
identity at inference) — so it is implemented directly in numpy here and
loads the published torch state dict (`layers.N.weight/bias` keys).

Like clip_score (eval/clip_scorer.py), the dimension is gated on local
weights being present: a random head carries no signal.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class AestheticHead:
    """Callable (N, d) L2-normalized CLIP embeddings → (N,) raw scores
    (LAION scale, roughly 1–10; VBench divides by 10)."""

    def __init__(self, weights: list, biases: list):
        self.weights = [np.asarray(w, np.float32) for w in weights]
        self.biases = [np.asarray(b, np.float32) for b in biases]
        if not self.weights or len(self.weights) != len(self.biases):
            raise ValueError("aesthetic head: mismatched weight/bias lists")

    @property
    def input_dim(self) -> int:
        return self.weights[0].shape[1]

    @classmethod
    def from_pretrained(cls, path: str) -> "AestheticHead":
        """Load the LAION predictor's torch state dict (.pth/.pt/.safetensors).

        Accepts both the bare MLP state dict (`layers.0.weight`, ...) and a
        checkpoint wrapping it under `state_dict`."""
        from opensora_tpu.utils.ckpt import load_torch_state_dict

        sd = load_torch_state_dict(path)
        if "state_dict" in sd and not any(k.startswith("layers.") for k in sd):
            sd = sd["state_dict"]
        idx = sorted(
            {int(k.split(".")[1]) for k in sd
             if k.startswith("layers.") and k.endswith(".weight")}
        )
        if not idx:
            raise FileNotFoundError(
                f"{path} has no `layers.N.weight` keys — not a LAION "
                "aesthetic-predictor state dict"
            )
        weights = [np.asarray(sd[f"layers.{i}.weight"], np.float32) for i in idx]
        biases = [np.asarray(sd[f"layers.{i}.bias"], np.float32) for i in idx]
        return cls(weights, biases)

    def __call__(self, emb: np.ndarray) -> np.ndarray:
        x = np.asarray(emb, np.float32)
        if x.shape[-1] != self.input_dim:
            raise ValueError(
                f"aesthetic head expects {self.input_dim}-d CLIP embeddings, "
                f"got {x.shape[-1]} (use a ViT-L/14 CLIPModel for VBench parity)"
            )
        for w, b in zip(self.weights, self.biases):
            x = x @ w.T + b
        return x[..., 0]


def try_load_head(path: Optional[str]) -> Optional[AestheticHead]:
    """Best-effort builder for CLIs: None when no weights are on disk."""
    if not path or not os.path.exists(path):
        return None
    try:
        return AestheticHead.from_pretrained(path)
    except Exception as e:
        import logging

        logging.getLogger("opensora_tpu").warning(
            "aesthetic_quality disabled: %s", e
        )
        return None
