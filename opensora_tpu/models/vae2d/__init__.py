from opensora_tpu.models.vae2d.autoencoder_2d import (  # noqa: F401
    AutoEncoder2D,
    AutoEncoderConfig,
    AutoEncoderFlux,
)
