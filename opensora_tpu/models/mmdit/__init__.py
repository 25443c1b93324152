from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel, Flux  # noqa: F401
