"""Rectified-flow sampling: options, schedule, denoisers, API assembly.

Behavioral reference: opensora/utils/sampling.py:28-726. TPU-first design:
the entire 50-step denoise loop runs inside one jit as ``lax.scan`` over
steps (static shapes per resolution bucket), with the 3-way CFG batch
(cond / uncond-text / uncond-all) laid out on the batch axis so the model is
invoked once per step.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from enum import Enum
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from einops import rearrange, repeat
from jax import lax

from opensora_tpu.datasets.aspect import get_image_size
from opensora_tpu.utils.config import ae_spatial_compression


class SamplingMethod(str, Enum):
    I2V = "i2v"
    DISTILLED = "distill"


@dataclass
class SamplingOption:
    """Mirrors reference sampling.py:28-117 field-for-field."""

    width: Optional[int] = None
    height: Optional[int] = None
    resolution: Optional[str] = None
    aspect_ratio: Optional[str] = None
    num_frames: int = 1
    num_steps: int = 50
    guidance: float = 4.0
    text_osci: bool = False
    guidance_img: Optional[float] = None
    image_osci: bool = False
    scale_temporal_osci: bool = False
    seed: Optional[int] = None
    shift: bool = True
    method: SamplingMethod | str = SamplingMethod.I2V
    temporal_reduction: int = 1
    is_causal_vae: bool = False
    flow_shift: Optional[float] = None
    # TPU single-chip knob (no reference equivalent — the reference offloads
    # to CPU instead): False runs the 3-way CFG as three sequential B=b model
    # passes per step. Required at 768px/129f on one 16 GiB chip, where the
    # CFG-tripled activations don't fit beside the int8 11B weights.
    cfg_batched: bool = True


def sanitize_sampling_option(opt: SamplingOption) -> SamplingOption:
    """Resolve resolution/aspect-ratio to 16-aligned (h, w)
    (reference sampling.py:81-117)."""
    if opt.resolution is not None or opt.aspect_ratio is not None:
        assert opt.resolution is not None and opt.aspect_ratio is not None, (
            "Both resolution and aspect ratio must be provided"
        )
        height, width = get_image_size(opt.resolution, opt.aspect_ratio, training=False)
    else:
        assert opt.height is not None and opt.width is not None, (
            "Both height and width must be provided"
        )
        height, width = opt.height, opt.width
    height = (height // 16 + (1 if height % 16 else 0)) * 16
    width = (width // 16 + (1 if width % 16 else 0)) * 16
    replace = dict(height=height, width=width)
    if isinstance(opt.method, str):
        replace["method"] = SamplingMethod(opt.method)
    return dataclasses.replace(opt, **replace)


def get_oscillation_gs(guidance_scale: float, i: int, force_num: int = 10) -> float:
    """Oscillating CFG (reference sampling.py:120-133)."""
    if i < force_num or (i >= force_num and i % 2 == 0):
        return guidance_scale
    return 1.0


# ======================================================
# Timesteps (rectified flow)
# ======================================================


def time_shift(alpha: float, t: jnp.ndarray) -> jnp.ndarray:
    return alpha * t / (1 + (alpha - 1) * t)


def get_res_lin_function(
    x1: float = 256, y1: float = 1, x2: float = 4096, y2: float = 3
) -> Callable[[float], float]:
    m = (y2 - y1) / (x2 - x1)
    b = y1 - m * x1
    return lambda x: m * x + b


def get_schedule(
    num_steps: int,
    image_seq_len: int,
    num_frames: int,
    shift_alpha: Optional[float] = None,
    base_shift: float = 1.0,
    max_shift: float = 3.0,
    shift: bool = True,
) -> jnp.ndarray:
    """Rectified-flow timestep schedule (reference sampling.py:295-332)."""
    timesteps = jnp.linspace(1.0, 0.0, num_steps + 1)
    if shift:
        if shift_alpha is None:
            shift_alpha = get_res_lin_function(y1=base_shift, y2=max_shift)(
                image_seq_len
            )
            shift_alpha *= math.sqrt(num_frames)
        timesteps = time_shift(shift_alpha, timesteps)
    return timesteps


def get_noise(
    rng: jax.Array,
    num_samples: int,
    height: int,
    width: int,
    num_frames: int,
    dtype=jnp.bfloat16,
    patch_size: int = 2,
    channel: int = 16,
) -> jnp.ndarray:
    """Seeded latent noise (reference sampling.py:335-372); jax PRNG replaces
    the torch generator, so streams differ from torch but are deterministic."""
    D = ae_spatial_compression()
    shape = (
        num_samples,
        channel,
        num_frames,
        patch_size * math.ceil(height / D),
        patch_size * math.ceil(width / D),
    )
    return jax.random.normal(rng, shape, jnp.float32).astype(dtype)


def pack(x: jnp.ndarray, patch_size: int = 2) -> jnp.ndarray:
    """b c t (h ph) (w pw) → b (t h w) (c ph pw) (reference sampling.py:375)."""
    return rearrange(
        x, "b c t (h ph) (w pw) -> b (t h w) (c ph pw)", ph=patch_size, pw=patch_size
    )


def unpack(
    x: jnp.ndarray, height: int, width: int, num_frames: int, patch_size: int = 2
) -> jnp.ndarray:
    D = ae_spatial_compression()
    return rearrange(
        x,
        "b (t h w) (c ph pw) -> b c t (h ph) (w pw)",
        h=math.ceil(height / D),
        w=math.ceil(width / D),
        t=num_frames,
        ph=patch_size,
        pw=patch_size,
    )


def build_img_ids(
    t: int, h: int, w: int, patch_size: int = 2, bs: int = 1
) -> jnp.ndarray:
    """3-axis (t, h, w) position grid for RoPE (reference sampling.py:439-445)."""
    hp, wp = h // patch_size, w // patch_size
    ids = jnp.stack(
        jnp.meshgrid(
            jnp.arange(t, dtype=jnp.float32),
            jnp.arange(hp, dtype=jnp.float32),
            jnp.arange(wp, dtype=jnp.float32),
            indexing="ij",
        ),
        axis=-1,
    )
    ids = ids.reshape(1, t * hp * wp, 3)
    return jnp.broadcast_to(ids, (bs, t * hp * wp, 3))


def prepare(
    t5,
    clip,
    img: jnp.ndarray,
    prompt,
    seq_align: int = 1,
    patch_size: int = 2,
) -> dict:
    """Pack latents + encode text (reference sampling.py:401-459).

    t5/clip are callables: list[str] → embeddings. ``seq_align`` pads the T5
    sequence so (txt_len + img_len) is divisible by the SP size.
    """
    bs, c, t, h, w = img.shape
    dtype = img.dtype
    if isinstance(prompt, str):
        prompt = [prompt]
    if bs != len(prompt):
        bs = len(prompt)

    img = pack(img, patch_size=patch_size)
    if img.shape[0] != bs:
        img = repeat(img, "b ... -> (repeat b) ...", repeat=bs // img.shape[0])

    img_ids = build_img_ids(t, h, w, patch_size, bs)

    txt = t5(prompt, added_tokens=img_ids.shape[1], seq_align=seq_align)
    if txt.shape[0] == 1 and bs > 1:
        txt = repeat(txt, "1 ... -> bs ...", bs=bs)
    txt_ids = jnp.zeros((bs, txt.shape[1], 3), dtype=jnp.float32)

    vec = clip(prompt)
    if vec.shape[0] == 1 and bs > 1:
        vec = repeat(vec, "1 ... -> bs ...", bs=bs)

    return {
        "img": img,
        "img_ids": img_ids,
        "txt": txt.astype(dtype),
        "txt_ids": txt_ids,
        "y_vec": vec.astype(dtype),
    }


def prepare_ids(img: jnp.ndarray, t5_embedding: jnp.ndarray, clip_embedding: jnp.ndarray) -> dict:
    """Cached-embedding variant (reference sampling.py:462-508)."""
    bs, c, t, h, w = img.shape
    dtype = img.dtype
    img = pack(img, patch_size=2)
    img_ids = build_img_ids(t, h, w, 2, bs)
    if t5_embedding.shape[0] == 1 and bs > 1:
        t5_embedding = repeat(t5_embedding, "1 ... -> bs ...", bs=bs)
    if clip_embedding.shape[0] == 1 and bs > 1:
        clip_embedding = repeat(clip_embedding, "1 ... -> bs ...", bs=bs)
    txt_ids = jnp.zeros((bs, t5_embedding.shape[1], 3), dtype=jnp.float32)
    return {
        "img": img,
        "img_ids": img_ids,
        "txt": t5_embedding.astype(dtype),
        "txt_ids": txt_ids,
        "y_vec": clip_embedding.astype(dtype),
    }


# ======================================================
# Denoisers
# ======================================================


class Denoiser:
    def denoise(self, model_fn, **kwargs):
        raise NotImplementedError

    def prepare_guidance(self, text, neg=None, guidance_img=None, **kwargs):
        raise NotImplementedError


class I2VDenoiser(Denoiser):
    """3-way CFG Euler sampler with oscillation + temporal image-guidance ramp
    (reference sampling.py:152-287). The step loop is a lax.scan inside jit."""

    def prepare_guidance(self, text, neg=None, guidance_img=None, **kwargs):
        ret = {"guidance_img": guidance_img}
        if neg is None:
            neg = [""] * len(text)
        text = list(text) + list(neg) + list(neg)
        return text, ret

    def denoise(
        self,
        model_fn: Callable,
        *,
        img: jnp.ndarray,
        timesteps: jnp.ndarray,
        guidance: float,
        guidance_img: float,
        masks: jnp.ndarray,
        masked_ref: jnp.ndarray,
        text_osci: bool = False,
        image_osci: bool = False,
        scale_temporal_osci: bool = False,
        patch_size: int = 2,
        cfg_batched: bool = True,
        **model_kwargs,
    ) -> jnp.ndarray:
        num_steps = timesteps.shape[0] - 1
        b3 = img.shape[0]
        assert b3 % 3 == 0, "I2V denoiser expects a 3-way CFG batch"
        b = b3 // 3
        bt, bc, bT, bh, bw = masked_ref.shape

        cond = pack(jnp.concatenate([masks, masked_ref], axis=1), patch_size=patch_size)
        cond3 = jnp.concatenate([cond, cond, jnp.zeros_like(cond)], axis=0)

        guidance_vec = jnp.full((b3,), guidance, dtype=img.dtype)

        # per-step guidance scalars (host-computed, shape (steps,))
        tg = jnp.asarray(
            [
                get_oscillation_gs(guidance, i) if text_osci else guidance
                for i in range(num_steps)
            ],
            dtype=jnp.float32,
        )
        ig_base = jnp.asarray(
            [
                get_oscillation_gs(guidance_img, i) if image_osci else guidance_img
                for i in range(num_steps)
            ],
            dtype=jnp.float32,
        )

        # temporal ramp (reference sampling.py:209-216): at step i the image
        # guidance ramps linearly 1 → linspace(ig, 1)[i] across latent frames.
        if scale_temporal_osci:
            step_upper = jnp.linspace(guidance_img, 1.0, num_steps + 1)[:-1]
            frame_ramp = jnp.linspace(0.0, 1.0, bT)  # (T,)
        else:
            step_upper = None
            frame_ramp = None

        def step(carry, inp):
            x = carry  # (b, L, C) — the cond slice only
            i, t_curr, t_prev = inp
            if cfg_batched:
                x3 = jnp.concatenate([x, x, x], axis=0)
                t_vec = jnp.full((b3,), t_curr, dtype=img.dtype)
                pred = model_fn(
                    img=x3, cond=cond3, timesteps=t_vec, guidance=guidance_vec,
                    **model_kwargs,
                )
                cond_p, uncond_p, uncond2_p = jnp.split(pred, 3, axis=0)
            else:
                # sequential CFG: three B=b passes sharing one compiled
                # executable (identical shapes), ~1/3 the activation memory
                t_vec = jnp.full((b,), t_curr, dtype=img.dtype)

                def one_pass(j):
                    kw = {
                        k: (
                            lax.slice_in_dim(v, j * b, (j + 1) * b, axis=0)
                            if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == b3
                            else v
                        )
                        for k, v in model_kwargs.items()
                    }
                    return model_fn(
                        img=x,
                        cond=lax.slice_in_dim(cond3, j * b, (j + 1) * b, axis=0),
                        timesteps=t_vec,
                        guidance=lax.slice_in_dim(guidance_vec, j * b, (j + 1) * b, axis=0),
                        **kw,
                    )

                cond_p, uncond_p, uncond2_p = one_pass(0), one_pass(1), one_pass(2)

            text_gs = tg[i]
            if scale_temporal_osci:
                upper = step_upper[i]
                img_gs_t = 1.0 + (upper - 1.0) * frame_ramp  # (T,)
                img_gs_full = jnp.broadcast_to(
                    img_gs_t[None, None, :, None, None], (b, bc, bT, bh, bw)
                )
                image_gs = pack(img_gs_full, patch_size=patch_size).astype(cond_p.dtype)
                # only apply ramp when base gs > 1 (reference condition)
                image_gs = jnp.where(ig_base[i] > 1.0, image_gs, ig_base[i])
            else:
                image_gs = ig_base[i].astype(cond_p.dtype)

            merged = (
                uncond2_p
                + image_gs * (uncond_p - uncond2_p)
                + text_gs * (cond_p - uncond_p)
            )
            # cast the fp32 Euler update back to the latent dtype: the fp32
            # step scalar would otherwise promote a bf16 carry and break the
            # scan's carry-type invariant (torch keeps the tensor dtype here)
            x = x + ((t_prev - t_curr) * merged).astype(x.dtype)
            return x, None

        x0 = img[:b]
        steps = (
            jnp.arange(num_steps),
            timesteps[:-1].astype(jnp.float32),
            timesteps[1:].astype(jnp.float32),
        )
        x_final, _ = jax.lax.scan(step, x0, steps)
        return x_final


class DistilledDenoiser(Denoiser):
    """Plain Euler loop with embedded guidance (reference sampling.py:240-287)."""

    def prepare_guidance(self, text, neg=None, guidance_img=None, **kwargs):
        return list(text), {}

    def denoise(
        self,
        model_fn: Callable,
        *,
        img: jnp.ndarray,
        timesteps: jnp.ndarray,
        guidance: float,
        **model_kwargs,
    ) -> jnp.ndarray:
        num_steps = timesteps.shape[0] - 1
        guidance_vec = jnp.full((img.shape[0],), guidance, dtype=img.dtype)
        for k in ("masks", "masked_ref", "text_osci", "image_osci",
                  "scale_temporal_osci", "patch_size", "guidance_img",
                  "sigma_min", "cfg_batched"):
            model_kwargs.pop(k, None)

        def step(x, inp):
            t_curr, t_prev = inp
            t_vec = jnp.full((x.shape[0],), t_curr, dtype=x.dtype)
            pred = model_fn(
                img=x, timesteps=t_vec, guidance=guidance_vec, **model_kwargs
            )
            return x + ((t_prev - t_curr) * pred).astype(x.dtype), None

        steps = (timesteps[:-1].astype(jnp.float32), timesteps[1:].astype(jnp.float32))
        x_final, _ = jax.lax.scan(step, img, steps)
        return x_final


SamplingMethodDict = {
    SamplingMethod.I2V: I2VDenoiser(),
    SamplingMethod.DISTILLED: DistilledDenoiser(),
}
