"""Model assembly + end-to-end generation API.

Behavioral reference: opensora/utils/sampling.py:511-726 (prepare_models,
prepare_api/api_fn). TPU design: the model bundle couples a flax module with
its params; the denoise loop is jitted once per (shape, steps, flags) key and
cached, so repeated calls at one resolution bucket reuse the compiled
executable.
"""

from __future__ import annotations

import logging
import random as pyrandom
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from opensora_tpu.registry import MODELS, build_module
from opensora_tpu.utils import sampling as S
from opensora_tpu.utils.inference import (
    collect_references_batch,
    prepare_inference_condition,
)


@dataclass
class ModelBundle:
    """A flax module + its variables (params)."""

    module: Any
    variables: Any

    def apply(self, *args, method=None, rngs=None, **kwargs):
        return self.module.apply(self.variables, *args, method=method, rngs=rngs, **kwargs)


def init_model_params(module, rng, *sample_args, **sample_kwargs):
    return module.init(rng, *sample_args, **sample_kwargs)


def offload_to_host(bundle: "ModelBundle") -> None:
    """Park a model's params in host RAM (the t2i2v offload dance,
    reference scripts/diffusion/inference.py:161-214 CPU⇄GPU swaps)."""
    if bundle.variables is None:
        return
    try:
        host = jax.devices("cpu")[0]
    except RuntimeError:
        return
    bundle.variables = jax.device_put(bundle.variables, host)


def load_to_device(bundle: "ModelBundle", device=None) -> None:
    if bundle.variables is None:
        return
    device = device or jax.devices()[0]
    bundle.variables = jax.device_put(bundle.variables, device)


def prepare_models(
    cfg,
    dtype: str = "bf16",
    rng: Optional[jax.Array] = None,
    init_params: bool = True,
):
    """Build (model, ae, t5, clip, optional_models) from config dicts.

    Mirrors reference prepare_models (sampling.py:511-559). Checkpoint
    loading happens via utils/ckpt.py when ``from_pretrained`` is set;
    otherwise params are randomly initialized (scaled/dev configs).
    """
    from opensora_tpu.utils.ckpt import load_model_bundle

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r_model, r_ae, r_misc = jax.random.split(rng, 3)

    model_module = build_module(dict(cfg.model), MODELS)
    ae_module = build_module(dict(cfg.ae), MODELS)
    t5 = build_module(dict(cfg.t5), MODELS)
    clip = build_module(dict(cfg.clip), MODELS)

    ae_kind = {"dc_ae": "dc_ae", "autoencoder_2d": "vae2d"}.get(
        cfg.ae.get("type"), "hunyuan_vae"
    )
    model = load_model_bundle(model_module, cfg.model, rng=r_model, init=init_params, kind="mmdit")
    ae = load_model_bundle(ae_module, cfg.ae, rng=r_ae, init=init_params, kind=ae_kind)

    def _ensure_initialized(bundle, module, kind, rng_k):
        """Random-init when no pretrained weights were loaded (dev configs)."""
        if bundle.variables is not None or not init_params:
            return bundle
        if kind == "mmdit":
            mcfg = module.config
            B, L, Lt = 1, 8, 4
            bundle.variables = module.init(
                rng_k,
                jnp.zeros((B, L, mcfg.in_channels), jnp.float32),
                jnp.zeros((B, L, 3)),
                jnp.zeros((B, Lt, mcfg.context_in_dim), jnp.float32),
                jnp.zeros((B, Lt, 3)),
                jnp.zeros((B,)),
                jnp.zeros((B, mcfg.vec_in_dim), jnp.float32),
                jnp.zeros((B, L, mcfg.in_channels + mcfg.patch_size**2), jnp.float32)
                if mcfg.cond_embed else None,
                jnp.zeros((B,)) if mcfg.guidance_embed else None,
            )
        else:
            acfg = module.config
            if kind == "vae2d":
                x0 = jnp.zeros((1, acfg.in_channels, 32, 32), jnp.float32)
            else:
                tcr = getattr(acfg, "time_compression_ratio", 4)
                scr = getattr(acfg, "spatial_compression_ratio", 8)
                x0 = jnp.zeros(
                    (1, acfg.in_channels, tcr + 1, scr * 2, scr * 2), jnp.float32
                )
            bundle.variables = module.init({"params": rng_k, "gaussian": rng_k}, x0)
        return bundle

    model = _ensure_initialized(model, model_module, "mmdit", r_model)
    ae = _ensure_initialized(ae, ae_module, ae_kind, r_ae)

    optional: Dict[str, Any] = {}
    if cfg.get("img_flux") is not None:
        img_flux_module = build_module(dict(cfg.img_flux), MODELS)
        img_flux_ae_module = build_module(dict(cfg.img_flux_ae), MODELS)
        optional["img_flux"] = _ensure_initialized(
            load_model_bundle(
                img_flux_module, cfg.img_flux, rng=r_misc, init=init_params, kind="mmdit"
            ),
            img_flux_module, "mmdit", r_misc,
        )
        optional["img_flux_ae"] = _ensure_initialized(
            load_model_bundle(
                img_flux_ae_module, cfg.img_flux_ae, rng=r_misc, init=init_params, kind="vae2d"
            ),
            img_flux_ae_module, "vae2d", r_misc,
        )
    return model, ae, t5, clip, optional


def prepare_api(
    model: ModelBundle,
    model_ae: ModelBundle,
    model_t5,
    model_clip,
    optional_models=None,
    mesh=None,
) -> Callable:
    """Returns api_fn(opt, cond_type, seed, text, neg, ...) → video array
    (B, C, T, H, W) in [-1, 1]. Mirrors reference prepare_api
    (sampling.py:562-726).

    ``mesh``: shard MMDiT params by the TP rules for multi-chip inference
    (the reference's hybrid-plugin boost, utils/cai.py:51-71); pair with
    attn_backend="ulysses"/"ring" in the model config for SP."""
    optional_models = optional_models or {}
    if mesh is not None and model.variables is not None:
        from opensora_tpu.parallel.context import set_mesh
        from opensora_tpu.parallel.sharding import make_shardings, mmdit_param_specs

        set_mesh(mesh)
        params = model.variables["params"]
        model.variables = {
            "params": jax.device_put(
                params, make_shardings(mesh, mmdit_param_specs(params, fsdp=False))
            )
        }
    denoise_cache: Dict[Any, Callable] = {}

    _ae_encode_jit = jax.jit(
        lambda x, rng: model_ae.apply(
            x, rngs={"gaussian": rng},
            method=type(model_ae.module).encode,
        )
    )
    _ae_decode_jit = jax.jit(
        lambda z: model_ae.apply(z, method=type(model_ae.module).decode)
    )

    # Large inputs on the 3D causal VAE must tile at HOST level: jitting the
    # whole tiled decode fuses every tile into one executable and OOMs HBM at
    # 768px (models/hunyuan_vae/tiled.py). Small shapes keep the single-graph
    # jitted path.
    _tiled_runner = None
    from opensora_tpu.models.hunyuan_vae.model import AutoencoderKLCausal3D

    if isinstance(model_ae.module, AutoencoderKLCausal3D):
        from opensora_tpu.models.hunyuan_vae.tiled import TiledVAERunner

        _tiled_runner = TiledVAERunner(model_ae.module, model_ae.variables)

    def ae_encode(x, rng):
        if _tiled_runner is not None and _tiled_runner.needs_tiling_sample(x.shape):
            logging.getLogger(__name__).info(
                "[ae] host-tiled encode for %s", x.shape
            )
            return _tiled_runner.encode(x, rng=rng, sample_posterior=True)
        return _ae_encode_jit(x, rng)

    def ae_decode(z):
        if _tiled_runner is not None and _tiled_runner.needs_tiling(z.shape):
            logging.getLogger(__name__).info(
                "[ae] host-tiled decode for %s", z.shape
            )
            return _tiled_runner.decode(z)
        return _ae_decode_jit(z)

    def _get_denoise_fn(denoiser, static_key, static_kwargs):
        if static_key not in denoise_cache:
            def run(variables, img, timesteps, model_kwargs, cond_kwargs):
                model_fn = lambda **kw: model.module.apply(variables, **kw)
                return denoiser.denoise(
                    model_fn, img=img, timesteps=timesteps,
                    **static_kwargs, **model_kwargs, **cond_kwargs,
                )

            denoise_cache[static_key] = jax.jit(run)
        return denoise_cache[static_key]

    def api_fn(
        opt: S.SamplingOption,
        cond_type: str = "t2v",
        seed: Optional[int] = None,
        sigma_min: float = 1e-5,
        text=None,
        neg=None,
        patch_size: int = 2,
        channel: int = 16,
        **kwargs,
    ):
        dtype = jax.tree.leaves(model.variables)[0].dtype
        compute_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32

        if seed is None:
            seed = opt.seed if opt.seed is not None else pyrandom.randint(0, 2**32 - 1)
        rng = jax.random.PRNGKey(seed)
        r_noise, r_ae = jax.random.split(rng)

        if opt.is_causal_vae:
            num_frames = 1 if opt.num_frames == 1 else (opt.num_frames - 1) // opt.temporal_reduction + 1
        else:
            num_frames = 1 if opt.num_frames == 1 else opt.num_frames // opt.temporal_reduction

        z = S.get_noise(
            r_noise, len(text), opt.height, opt.width, num_frames,
            dtype=compute_dtype, patch_size=patch_size, channel=channel // patch_size**2,
        )
        denoiser = S.SamplingMethodDict[opt.method]

        # reference conditioning
        references = [None] * len(text)
        if cond_type != "t2v" and "ref" in kwargs:
            references = collect_references_batch(
                kwargs.pop("ref"), cond_type,
                lambda x: ae_encode(jnp.asarray(x, compute_dtype), r_ae),
                (opt.height, opt.width), is_causal=opt.is_causal_vae,
            )
        elif cond_type != "t2v":
            cond_type = "t2v"

        timesteps = S.get_schedule(
            opt.num_steps,
            (z.shape[-1] * z.shape[-2]) // patch_size**2,
            num_frames,
            shift=opt.shift,
            shift_alpha=opt.flow_shift,
        )

        text, additional = denoiser.prepare_guidance(
            text=text, neg=neg, guidance_img=opt.guidance_img
        )
        inp = S.prepare(model_t5, model_clip, z, prompt=text, patch_size=patch_size)

        img = inp.pop("img")
        model_kwargs = {k: inp[k] for k in ("img_ids", "txt", "txt_ids", "y_vec")}

        cond_kwargs = {}
        if opt.method == S.SamplingMethod.I2V:
            masks, masked_ref = prepare_inference_condition(
                z, cond_type, ref_list=references if cond_type != "t2v" else None,
                causal=opt.is_causal_vae,
            )
            cond_kwargs = {"masks": masks, "masked_ref": masked_ref}

        static_kwargs = dict(
            guidance=opt.guidance,
            text_osci=opt.text_osci,
            image_osci=opt.image_osci,
            scale_temporal_osci=(opt.scale_temporal_osci and "i2v" in cond_type),
            patch_size=patch_size,
            cfg_batched=opt.cfg_batched,
        )
        if opt.method == S.SamplingMethod.I2V:
            static_kwargs["guidance_img"] = additional.get("guidance_img") or 1.0

        static_key = (
            opt.method, img.shape, opt.num_steps, cond_type,
            tuple(sorted(static_kwargs.items())),
        )
        run = _get_denoise_fn(denoiser, static_key, static_kwargs)
        x = run(model.variables, img, timesteps, model_kwargs, cond_kwargs)

        x = S.unpack(x.astype(jnp.float32), opt.height, opt.width, num_frames, patch_size=patch_size)

        # LATENT-space frame replacement for i2v, pre-decode
        # (reference sampling.py:698-707: x[0,:,:1] = encoded reference)
        if cond_type == "i2v_head" and references[0] is not None:
            x = x.at[0, :, :1].set(references[0][0].astype(x.dtype))
        elif cond_type == "i2v_tail" and references[0] is not None:
            x = x.at[0, :, -1:].set(references[0][0].astype(x.dtype))
        elif cond_type == "i2v_loop" and references[0] is not None:
            x = x.at[0, :, :1].set(references[0][0].astype(x.dtype))
            x = x.at[0, :, -1:].set(references[0][1].astype(x.dtype))

        x = ae_decode(x.astype(compute_dtype))
        x = x[:, :, : opt.num_frames]

        if not opt.is_causal_vae:
            pad_len = getattr(model_ae.module.config, "time_compression_ratio", 1) - 1
            if cond_type == "i2v_head":
                x = x[:, :, pad_len:]
            elif cond_type == "i2v_tail":
                x = x[:, :, :-pad_len]
            elif cond_type == "i2v_loop":
                x = x[:, :, pad_len:-pad_len]
        return x

    return api_fn
