from opensora_tpu.models.hunyuan_vae.model import (  # noqa: F401
    AutoEncoder3DConfig,
    AutoencoderKLCausal3D,
    CausalVAE3D_HUNYUAN,
    DiagonalGaussianDistribution,
)
