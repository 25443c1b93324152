"""Import the reference Open-Sora torch package as a NUMERICAL ORACLE.

The reference's GPU-only dependencies (flash_attn, liger_kernel,
colossalai, mmengine, tensornvme) are not in this image; this module
installs minimal CPU shims for exactly the symbols the reference's MMDiT
stack touches, then imports the reference modules from /root/reference so
parity tests can execute the reference's OWN model code on CPU.

Shim fidelity notes (each shim reproduces the documented semantics of the
kernel it replaces, at fp32 where the Triton/CUDA kernels internally use
fp32 accumulation):

- ``flash_attn.flash_attn_func(q, k, v)``: non-causal softmax attention
  over (B, L, H, D) inputs with 1/sqrt(D) scaling → torch SDPA
  (reference call site: opensora/models/mmdit/math.py:16-36).
- ``liger_kernel.ops.rms_norm.LigerRMSNormFunction.apply(x, w, eps,
  offset, "llama", in_place)``: identical math to the reference's own
  non-fused RMSNorm (opensora/models/mmdit/layers.py:102-123): fp32 rms,
  cast back, scale by (offset + w).
- ``liger_kernel.ops.rope.LigerRopeFunction.apply(q, k, cos, sin)``:
  rotate-half RoPE on (B, H, L, D) q/k with duplicated-half cos/sin
  tables from LigerEmbedND (layers.py:47-66). Validated in
  tests/test_ref_parity.py against the reference's own equivalence
  helpers rearrange_tensor/reverse_rearrange_tensor (math.py:68-117).
- ``colossalai`` / ``tensornvme`` / ``mmengine``: import-time plumbing
  only (registry, checkpoint IO, device helper) — never exercised by the
  forward pass under test.
"""

from __future__ import annotations

import os
import sys
import types

REF_ROOT = "/root/reference"


def _module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        # a sys.modules entry without __spec__ breaks importlib.util.
        # find_spec for OTHER libraries that probe availability (observed:
        # transformers probing liger_kernel raised "ValueError: __spec__
        # is None" in unrelated tests once the shims were installed)
        import importlib.machinery

        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = mod
        if "." in name:
            parent, _, child = name.rpartition(".")
            setattr(_module(parent), child, mod)
    return mod


def install_shims() -> None:
    if "flash_attn" in sys.modules:
        return
    # the reference torch.compile-decorates timestep_embedding
    # (layers.py:68); dynamo tracing is pointless for an oracle — force
    # eager before anything imports it
    os.environ.setdefault("TORCHDYNAMO_DISABLE", "1")
    import torch
    import torch.nn.functional as F

    # ---- flash_attn -------------------------------------------------
    fa = _module("flash_attn")

    def flash_attn_func(q, k, v, *args, **kwargs):
        out = F.scaled_dot_product_attention(
            q.transpose(1, 2).float(),
            k.transpose(1, 2).float(),
            v.transpose(1, 2).float(),
        )
        return out.transpose(1, 2).to(q.dtype)

    fa.flash_attn_func = flash_attn_func

    # ---- liger_kernel ----------------------------------------------
    rms_mod = _module("liger_kernel.ops.rms_norm")

    class LigerRMSNormFunction:
        @staticmethod
        def apply(x, weight, eps, offset, casting_mode="llama", in_place=False):
            x32 = x.float()
            rrms = torch.rsqrt(x32.pow(2).mean(-1, keepdim=True) + eps)
            return (x32 * rrms).to(x.dtype) * (offset + weight)

    rms_mod.LigerRMSNormFunction = LigerRMSNormFunction

    rope_mod = _module("liger_kernel.ops.rope")

    class LigerRopeFunction:
        @staticmethod
        def apply(q, k, cos, sin):
            # q/k: (B, H, L, D); cos/sin: (B, L, D) duplicated-half tables
            c = cos.float().unsqueeze(1)
            s = sin.float().unsqueeze(1)

            def rot_half(x):
                half = x.shape[-1] // 2
                return torch.cat((-x[..., half:], x[..., :half]), dim=-1)

            q32, k32 = q.float(), k.float()
            return (
                (q32 * c + rot_half(q32) * s).to(q.dtype),
                (k32 * c + rot_half(k32) * s).to(k.dtype),
            )

    rope_mod.LigerRopeFunction = LigerRopeFunction

    # ---- colossalai (import plumbing only) --------------------------
    cai = _module("colossalai")
    cai_utils = _module("colossalai.utils")
    cai_utils.get_current_device = lambda: torch.device("cpu")
    cai_utils_st = _module("colossalai.utils.safetensors")
    cai_utils_st.save = lambda *a, **k: None
    booster = _module("colossalai.booster")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("colossalai shim: not executable")

    booster.Booster = _Unavailable
    ckio = _module("colossalai.checkpoint_io")
    ckio.GeneralCheckpointIO = _Unavailable
    zero = _module("colossalai.zero.low_level")
    zero.LowLevelZeroOptimizer = _Unavailable

    # ---- tensornvme -------------------------------------------------
    nvme = _module("tensornvme.async_file_io")
    nvme.AsyncFileWriter = _Unavailable

    # ---- mmengine registry ------------------------------------------
    reg_mod = _module("mmengine.registry")

    class Registry:
        def __init__(self, name, locations=None):
            self.name = name
            self._store = {}

        def register_module(self, name=None, module=None, force=False):
            def _reg(cls):
                for key in [name] if name else [cls.__name__]:
                    self._store[key] = cls
                return cls

            return _reg(module) if module is not None else _reg

        def build(self, cfg):
            cfg = dict(cfg)
            cls = self._store[cfg.pop("type")]
            return cls(**cfg)

    reg_mod.Registry = Registry

    # ---- diffusers (real minimal implementations — the VAE oracle
    # executes group-norm attention through these) -------------------
    _install_diffusers_shim(torch, F)

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    # The reference package __init__s import the ENTIRE model zoo (and
    # with it xformers/torchvision/colossalai.shardformer internals we
    # don't shim). Pre-register the package nodes as namespace stubs so
    # leaf modules import directly without executing the __init__s.
    for pkg in (
        "opensora",
        "opensora.models",
        "opensora.models.mmdit",
        "opensora.models.hunyuan_vae",
        "opensora.utils",
        "opensora.acceleration",
        "opensora.datasets",
    ):
        if pkg in sys.modules:
            continue
        mod = types.ModuleType(pkg)
        mod.__path__ = [os.path.join(REF_ROOT, *pkg.split("."))]
        mod.__package__ = pkg
        sys.modules[pkg] = mod


def _install_diffusers_shim(torch, F):
    import torch.nn as nn

    utils = _module("diffusers.utils")

    class BaseOutput(dict):
        """Ordered-attribute output container (diffusers.utils.BaseOutput):
        subclasses are dataclasses; attribute and index access both work."""

        def __init_subclass__(cls, **kw):
            super().__init_subclass__(**kw)
            import dataclasses

            dataclasses.dataclass(cls)

        def __post_init__(self):
            import dataclasses

            for f in dataclasses.fields(self):
                self[f.name] = getattr(self, f.name)

        def __getitem__(self, k):
            if isinstance(k, str):
                return dict.__getitem__(self, k)
            return list(self.values())[k]

    utils.BaseOutput = BaseOutput

    class _Logging:
        @staticmethod
        def get_logger(name=None):
            import logging

            return logging.getLogger(name or "diffusers")

    utils.logging = _Logging()
    sys.modules["diffusers.utils.logging"] = utils.logging

    tu = _module("diffusers.utils.torch_utils")

    def randn_tensor(shape, generator=None, device=None, dtype=None, layout=None):
        return torch.randn(shape, generator=generator, device=device, dtype=dtype)

    tu.randn_tensor = randn_tensor
    utils.torch_utils = tu

    acc = _module("diffusers.utils.accelerate_utils")
    acc.apply_forward_hook = lambda fn: fn
    utils.accelerate_utils = acc

    cfg_mod = _module("diffusers.configuration_utils")

    class FrozenConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    class ConfigMixin:
        def register_to_config(self, **kwargs):
            cfg = getattr(self, "_internal_dict", FrozenConfig())
            cfg.update(kwargs)
            self._internal_dict = cfg

        @property
        def config(self):
            return getattr(self, "_internal_dict", FrozenConfig())

    def register_to_config(init):
        import functools
        import inspect

        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {
                k: v
                for k, v in bound.arguments.items()
                if k not in ("self",) and not k.startswith("_")
            }
            self.register_to_config(**cfg)
            init(self, *args, **kwargs)

        return wrapped

    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config

    mu = _module("diffusers.models.modeling_utils")

    class ModelMixin(nn.Module):
        @property
        def dtype(self):
            return next(self.parameters()).dtype

        @property
        def device(self):
            return next(self.parameters()).device

    mu.ModelMixin = ModelMixin

    act_mod = _module("diffusers.models.activations")

    def get_activation(name):
        return {
            "swish": nn.SiLU(),
            "silu": nn.SiLU(),
            "mish": nn.Mish(),
            "gelu": nn.GELU(),
            "relu": nn.ReLU(),
        }[name]

    act_mod.get_activation = get_activation

    ap = _module("diffusers.models.attention_processor")

    class Attention(nn.Module):
        """Faithful subset of diffusers.models.attention_processor.Attention
        for the configuration the reference VAE mid-block uses
        (unet_causal_3d_blocks.py:312-324): (B, L, C) input, group norm
        before the projections, additive (B, L, L) attention mask,
        residual connection, output rescale."""

        def __init__(
            self,
            query_dim,
            heads=8,
            dim_head=64,
            rescale_output_factor=1.0,
            eps=1e-5,
            norm_num_groups=None,
            spatial_norm_dim=None,
            residual_connection=False,
            bias=False,
            upcast_softmax=False,
            upcast_attention=False,
            dropout=0.0,
            _from_deprecated_attn_block=False,
            **unused,
        ):
            super().__init__()
            inner_dim = heads * dim_head
            self.heads = heads
            self.rescale_output_factor = rescale_output_factor
            self.residual_connection = residual_connection
            self.group_norm = (
                nn.GroupNorm(norm_num_groups, query_dim, eps=eps, affine=True)
                if norm_num_groups is not None
                else None
            )
            self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
            self.to_k = nn.Linear(query_dim, inner_dim, bias=bias)
            self.to_v = nn.Linear(query_dim, inner_dim, bias=bias)
            self.to_out = nn.ModuleList(
                [nn.Linear(inner_dim, query_dim, bias=True), nn.Dropout(dropout)]
            )
            self.processor = None

        def set_processor(self, processor):
            self.processor = processor

        def forward(self, hidden_states, attention_mask=None, **kwargs):
            residual = hidden_states
            h = hidden_states
            if self.group_norm is not None:
                h = self.group_norm(h.transpose(1, 2)).transpose(1, 2)
            B, L, _ = h.shape
            q = self.to_q(h).view(B, L, self.heads, -1).transpose(1, 2)
            k = self.to_k(h).view(B, L, self.heads, -1).transpose(1, 2)
            v = self.to_v(h).view(B, L, self.heads, -1).transpose(1, 2)
            mask = None
            if attention_mask is not None:
                mask = attention_mask.unsqueeze(1).float()  # (B, 1, L, L)
            out = F.scaled_dot_product_attention(
                q.float(), k.float(), v.float(), attn_mask=mask
            ).to(h.dtype)
            out = out.transpose(1, 2).reshape(B, L, -1)
            out = self.to_out[1](self.to_out[0](out))
            if self.residual_connection:
                out = out + residual
            return out / self.rescale_output_factor

    class AttnProcessor:
        pass

    class AttnAddedKVProcessor:
        pass

    ap.Attention = Attention
    ap.AttentionProcessor = AttnProcessor
    ap.AttnProcessor = AttnProcessor
    ap.AttnAddedKVProcessor = AttnAddedKVProcessor
    ap.ADDED_KV_ATTENTION_PROCESSORS = ()
    ap.CROSS_ATTENTION_PROCESSORS = ()

    loaders = _module("diffusers.loaders")

    class FromOriginalVAEMixin:
        pass

    loaders.FromOriginalVAEMixin = FromOriginalVAEMixin

    root = _module("diffusers")
    root.utils = utils
    root.__version__ = "0.0.0-shim"


def import_reference_mmdit():
    """Returns the reference's (model, layers, math) mmdit modules."""
    install_shims()
    import importlib

    model = importlib.import_module("opensora.models.mmdit.model")
    layers = importlib.import_module("opensora.models.mmdit.layers")
    math_mod = importlib.import_module("opensora.models.mmdit.math")
    return model, layers, math_mod


def import_reference_hunyuan_vae():
    """Returns the reference's autoencoder_kl_causal_3d module."""
    install_shims()
    import importlib

    return importlib.import_module(
        "opensora.models.hunyuan_vae.autoencoder_kl_causal_3d"
    )
