"""LPIPS perceptual loss (VGG16 features + learned linear heads).

Behavioral reference: opensora/models/vae/lpips.py (LPIPS over vgg16 relu
slices 1_2/2_2/3_3/4_3/5_3, unit-normalized features, 1x1 linear heads,
spatial mean). The reference downloads vgg_lpips torch weights; here the
backbone is a flax VGG16 whose params load from a torchvision/vgg_lpips
checkpoint via ``load_lpips_params`` when the file is available — otherwise
callers fall back to pixel-space losses (zero-egress environments)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

_VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
# feature taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAPS = (1, 3, 6, 9, 12)  # index in the conv-only sequence
_CHANNELS = (64, 128, 256, 512, 512)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        conv_idx = 0
        h = x
        for v in _VGG16_CFG:
            if v == "M":
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            else:
                h = nn.Conv(
                    v, (3, 3), padding=1, dtype=self.dtype, name=f"conv_{conv_idx}"
                )(h)
                h = nn.relu(h)
                if conv_idx in _TAPS:
                    feats.append(h)
                conv_idx += 1
        return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Callable (x, y) → per-sample perceptual distance (B, 1, 1, 1).

    Inputs are (B, C, H, W) in [-1, 1] like the reference."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        xin = (jnp.transpose(x, (0, 2, 3, 1)).astype(jnp.float32) - shift) / scale
        yin = (jnp.transpose(y, (0, 2, 3, 1)).astype(jnp.float32) - shift) / scale
        net = VGG16Features(self.dtype, name="vgg")
        fx = net(xin)
        fy = net(yin)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            diff = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            lin = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin_{i}"
            )(diff)
            total = total + jnp.mean(lin, axis=(1, 2), keepdims=True)
        return jnp.transpose(total, (0, 3, 1, 2))  # (B, 1, 1, 1)


def load_lpips_params(vgg_ckpt_path: str, lpips_ckpt_path: Optional[str] = None):
    """Map torchvision VGG16 + vgg_lpips linear-head torch weights into the
    flax LPIPS pytree. Conv weight (O, I, kH, kW) → (kH, kW, I, O)."""
    import torch

    sd = torch.load(vgg_ckpt_path, map_location="cpu", weights_only=True)
    params = {"vgg": {}}
    conv_keys = [k for k in sd if k.startswith("features") and k.endswith("weight") and sd[k].ndim == 4]
    conv_keys.sort(key=lambda k: int(k.split(".")[1]))
    for i, wk in enumerate(conv_keys):
        bk = wk.replace("weight", "bias")
        params["vgg"][f"conv_{i}"] = {
            "kernel": np.transpose(sd[wk].numpy(), (2, 3, 1, 0)),
            "bias": sd[bk].numpy(),
        }
    if lpips_ckpt_path:
        lp = torch.load(lpips_ckpt_path, map_location="cpu", weights_only=True)
        for i in range(5):
            w = lp[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
            params[f"lin_{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    else:
        for i, c in enumerate(_CHANNELS):
            params[f"lin_{i}"] = {"kernel": np.ones((1, 1, c, 1), np.float32) / c}
    return {"params": params}
