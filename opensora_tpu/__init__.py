"""opensora_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video generation framework.

Re-designed from scratch with the capabilities of hpcaitech/Open-Sora 2.0:
an MMDiT (Flux-style dual-stream + single-stream) rectified-flow diffusion
transformer, causal-3D / deep-compression video autoencoders, T5/CLIP text
conditioning, bucketized variable-shape data pipeline, and mesh-based
DP/FSDP/TP/SP parallelism over ICI.

The compute path is JAX + Pallas TPU kernels; runtime pieces (IO, config,
scheduling) are host code. See SURVEY.md for the reference blueprint.
"""

__version__ = "0.1.0"

from opensora_tpu.registry import MODELS, DATASETS, build_module  # noqa: F401
