"""3D PatchGAN discriminator for VAE GAN training.

Behavioral reference: opensora/models/vae/discriminator.py:29-109
(NLayerDiscriminator3D: conv3d k=3, stride 2 then (1,2,2), BatchNorm3d,
LeakyReLU 0.2, dropout, 1-channel patch logits). Channels-last internally;
(B, C, T, H, W) at the boundary. GroupNorm replaces BatchNorm — batch-stat
sync across data-parallel shards is an anti-pattern on TPU (adds collectives
in the discriminator inner loop) and GAN discriminators tolerate it."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from opensora_tpu.ops.norms import group_norm
from opensora_tpu.registry import MODELS
from opensora_tpu.utils.misc import to_jax_dtype


class _Norm3D(nn.Module):
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return group_norm(x, min(32, c), scale, bias)


class NLayerDiscriminator3D(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 5
    dropout: float = 0.30
    dtype: str = "bf16"
    param_dtype: str = "fp32"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        dtype = to_jax_dtype(self.dtype)
        pdtype = to_jax_dtype(self.param_dtype)
        conv = dict(kernel_size=(3, 3, 3), padding=1, dtype=dtype, param_dtype=pdtype)

        h = jnp.transpose(x, (0, 2, 3, 4, 1))  # channels-last
        h = nn.Conv(self.ndf, strides=2, **conv, name="conv_0")(h)
        h = nn.leaky_relu(h, 0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            stride = 2 if n == 1 else (1, 2, 2)
            h = nn.Conv(
                self.ndf * nf_mult, strides=stride, use_bias=False, **conv,
                name=f"conv_{n}",
            )(h)
            h = _Norm3D(pdtype, name=f"norm_{n}")(h)
            h = nn.leaky_relu(h, 0.2)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(
            self.ndf * nf_mult, strides=1, use_bias=False, **conv,
            name=f"conv_{self.n_layers}",
        )(h)
        h = _Norm3D(pdtype, name=f"norm_{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(1, strides=1, **conv, name="conv_out")(h)
        return jnp.transpose(h, (0, 4, 1, 2, 3))


@MODELS.register_module("N_Layer_discriminator_3D")
def build_discriminator_3d(from_pretrained=None, **kwargs) -> NLayerDiscriminator3D:
    known = set(NLayerDiscriminator3D.__dataclass_fields__)  # type: ignore[attr-defined]
    return NLayerDiscriminator3D(**{k: v for k, v in kwargs.items() if k in known})
