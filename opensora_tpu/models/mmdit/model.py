"""MMDiT — the 11B Flux-derived dual/single-stream diffusion transformer.

Behavioral reference: opensora/models/mmdit/model.py:39-268 (MMDiTConfig,
MMDiTModel.prepare_block_inputs/forward) — re-designed TPU-first:

- blocks run under ``nn.scan`` (stacked parameters, one compiled block body)
  instead of Python loops over 19+38 modules — this cuts XLA compile time
  ~50x and enables clean per-block remat;
- gradient checkpointing is a remat policy on the scanned block
  (``grad_ckpt_settings`` of the reference maps to ``remat`` +
  ``remat_policy``);
- RoPE tables are cos/sin pairs computed once per call (EmbedND) and carried
  into the Pallas flash-attention kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from opensora_tpu.models.mmdit.layers import (
    DoubleStreamBlock,
    EmbedND,
    LastLayer,
    MLPEmbedder,
    SingleStreamBlock,
    timestep_embedding,
)
from opensora_tpu.registry import MODELS
from opensora_tpu.utils.misc import to_jax_dtype


@dataclass
class MMDiTConfig:
    model_type = "MMDiT"
    in_channels: int = 64
    vec_in_dim: int = 768
    context_in_dim: int = 4096
    hidden_size: int = 3072
    mlp_ratio: float = 4.0
    num_heads: int = 24
    depth: int = 19
    depth_single_blocks: int = 38
    axes_dim: Sequence[int] = field(default_factory=lambda: [16, 56, 56])
    theta: int = 10_000
    qkv_bias: bool = True
    guidance_embed: bool = True
    cond_embed: bool = False
    fused_qkv: bool = True
    patch_size: int = 2
    # TPU-specific knobs
    rope_convention: str = "split"  # "split" (fast) or "interleaved" (parity)
    # RoPE pairing the from_pretrained weights were trained with: the
    # published Open-Sora-v2 checkpoints use liger/rotate-half = "split"
    # (reference configs/diffusion/inference/256px.py:41 use_liger_rope);
    # original Flux checkpoints are "interleaved"
    ckpt_rope_convention: str = "split"
    attn_backend: Optional[str] = None  # None = auto (pallas on TPU)
    # >1: sequence-chunked block compute (models/mmdit/layers.py
    # _seq_chunked) — bounds per-block temp HBM to ~1/seq_chunks so the
    # 768px/129f 76k-token forward fits beside the int8 11B weights on one
    # 16 GiB chip. Serving knob; leave 1 for training (remat covers bwd).
    seq_chunks: int = 1
    remat: bool = False  # checkpoint each scanned block
    quantized: "bool | str" = False  # False | True/"w8" (weight-only) | "w8a8" (ops/quant.py)
    # remat policy ≙ reference grad_ckpt_settings + activation CPU offload
    # (opensora/acceleration/checkpoint.py): "full" recomputes everything,
    # "dots" saves matmul outputs, "offload" parks checkpoints in host RAM
    remat_policy: str = "full"
    dtype: str = "bf16"
    param_dtype: str = "fp32"
    from_pretrained: Optional[str] = None

    def get(self, name, default=None):
        return getattr(self, name, default)

    @property
    def pe_dim(self) -> int:
        return self.hidden_size // self.num_heads


class MMDiTModel(nn.Module):
    config: MMDiTConfig

    @property
    def dtype(self):
        return to_jax_dtype(self.config.dtype)

    @property
    def param_dtype(self):
        return to_jax_dtype(self.config.param_dtype)

    def setup(self):
        cfg = self.config
        if cfg.hidden_size % cfg.num_heads != 0:
            raise ValueError(
                f"hidden_size {cfg.hidden_size} not divisible by num_heads {cfg.num_heads}"
            )
        if sum(cfg.axes_dim) != cfg.pe_dim:
            raise ValueError(f"axes_dim {cfg.axes_dim} != pe dim {cfg.pe_dim}")

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        self.pe_embedder = EmbedND(axes_dim=cfg.axes_dim, theta=cfg.theta)
        # (block stacks built via the shared factory so the PP path
        # constructs byte-identical stage modules — see make_block_scan)
        self.img_in = nn.Dense(cfg.hidden_size, **common)
        self.time_in = MLPEmbedder(cfg.hidden_size, **common)
        self.vector_in = MLPEmbedder(cfg.hidden_size, **common)
        if cfg.guidance_embed:
            self.guidance_in = MLPEmbedder(cfg.hidden_size, **common)
        if cfg.cond_embed:
            self.cond_in = nn.Dense(
                cfg.hidden_size,
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                **common,
            )
        self.txt_in = nn.Dense(cfg.hidden_size, **common)

        self.double_blocks = make_block_scan(
            cfg, "double", cfg.depth, name="double_blocks"
        )
        self.single_blocks = make_block_scan(
            cfg, "single", cfg.depth_single_blocks, name="single_blocks"
        )

        self.final_layer = LastLayer(cfg.in_channels, **common)

    def prepare_block_inputs(
        self, img, img_ids, txt, txt_ids, timesteps, y_vec,
        cond=None, guidance=None,
    ):
        """Reference model.py:154-206: project streams, build vec and pe."""
        cfg = self.config
        if img.ndim != 3 or txt.ndim != 3:
            raise ValueError("img and txt must be (B, L, C)")

        img = self.img_in(img)
        if cfg.cond_embed:
            if cond is None:
                raise ValueError("cond_embed=True requires a cond input")
            img = img + self.cond_in(cond)

        vec = self.time_in(timestep_embedding(timesteps, 256).astype(self.dtype))
        if cfg.guidance_embed:
            if guidance is None:
                raise ValueError("guidance_embed=True requires a guidance input")
            vec = vec + self.guidance_in(
                timestep_embedding(guidance, 256).astype(self.dtype)
            )
        vec = vec + self.vector_in(y_vec)

        txt = self.txt_in(txt)

        ids = jnp.concatenate([txt_ids, img_ids], axis=1)
        pe = self.pe_embedder(ids)
        return img, txt, vec, pe

    def __call__(
        self, img, img_ids, txt, txt_ids, timesteps, y_vec,
        cond=None, guidance=None,
    ):
        from jax.sharding import PartitionSpec as P

        from opensora_tpu.parallel.mesh import DATA_AXIS, SP_AXIS
        from opensora_tpu.parallel.sharding import constrain

        img, txt, vec, pe = self.prepare_block_inputs(
            img, img_ids, txt, txt_ids, timesteps, y_vec, cond, guidance
        )
        # pin the canonical layouts so GSPMD never invents a resharding:
        # tokens (data, sp, ·), conditioning vector replicated over sp/tp
        img = constrain(img, P(DATA_AXIS, SP_AXIS, None))
        txt = constrain(txt, P(DATA_AXIS, SP_AXIS, None))
        vec = constrain(vec, P(DATA_AXIS, None))

        (img, txt), _ = self.double_blocks((img, txt), vec, pe)

        x = jnp.concatenate([txt, img], axis=1)
        x = constrain(x, P(DATA_AXIS, SP_AXIS, None))
        x, _ = self.single_blocks(x, vec, pe)
        img = x[:, txt.shape[1]:, ...]

        return self.final_layer(img, vec)


def make_block_scan(cfg: MMDiTConfig, kind: str, length: int, name=None):
    """nn.scan-stacked block module of ``length`` blocks — the building
    block of both the full model (setup) and the opt-in pipeline-parallel
    stage runner (training/pp.py), which must construct modules with
    identical param trees so a stage slice of the model's stacked params
    applies directly."""
    block_common = dict(
        hidden_size=cfg.hidden_size,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        fused_qkv=cfg.fused_qkv,
        rope_convention=cfg.rope_convention,
        attn_backend=cfg.attn_backend,
        quantized=cfg.quantized,
        seq_chunks=cfg.seq_chunks,
        dtype=to_jax_dtype(cfg.dtype),
        param_dtype=to_jax_dtype(cfg.param_dtype),
    )
    if kind == "double":
        cls = _ScannedDoubleStreamBlock
        block_common["qkv_bias"] = cfg.qkv_bias
    elif kind == "single":
        cls = _ScannedSingleStreamBlock
    else:
        raise ValueError(kind)
    if cfg.remat:
        policy = {
            "full": jax.checkpoint_policies.nothing_saveable,
            "dots": jax.checkpoint_policies.dots_saveable,
            "offload": jax.checkpoint_policies.save_and_offload_only_these_names(
                names_which_can_be_saved=[],
                names_which_can_be_offloaded=[],
                offload_src="device", offload_dst="pinned_host",
            ),
        }.get(cfg.remat_policy, jax.checkpoint_policies.nothing_saveable)
        cls = nn.remat(cls, prevent_cse=False, policy=policy)
    # scan over stacked blocks: carry = streams, broadcast = (vec, pe)
    return nn.scan(
        cls,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast, nn.broadcast),
        length=length,
        metadata_params={nn.meta.PARTITION_NAME: "layers"},
    )(**block_common, name=name)


class _ScannedDoubleStreamBlock(DoubleStreamBlock):
    """Scan-body adapter: carry = (img, txt), broadcast = (vec, pe)."""

    def __call__(self, carry, vec, pe):  # type: ignore[override]
        img, txt = carry
        img, txt = DoubleStreamBlock.__call__(self, img, txt, vec, pe)
        return (img, txt), None


class _ScannedSingleStreamBlock(SingleStreamBlock):
    """Scan-body adapter: carry = x, broadcast = (vec, pe)."""

    def __call__(self, x, vec, pe):  # type: ignore[override]
        return SingleStreamBlock.__call__(self, x, vec, pe), None


@MODELS.register_module("flux")
def Flux(from_pretrained: Optional[str] = None, dtype: str = "bf16", **kwargs) -> Tuple[MMDiTModel, dict]:
    """Factory mirroring the reference registry entry (model.py:271-303).

    Returns the flax module; parameters are initialized/loaded by the caller
    (see opensora_tpu/utils/ckpt.py for torch-safetensors interop).
    """
    known = {f.name for f in MMDiTConfig.__dataclass_fields__.values()}  # type: ignore[attr-defined]
    cfg_kwargs = {k: v for k, v in kwargs.items() if k in known}
    config = MMDiTConfig(from_pretrained=from_pretrained, dtype=dtype, **cfg_kwargs)
    return MMDiTModel(config)
