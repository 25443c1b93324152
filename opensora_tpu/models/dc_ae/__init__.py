from opensora_tpu.models.dc_ae.model import DCAE, DCAEConfig, DC_AE, dc_ae_f32  # noqa: F401
