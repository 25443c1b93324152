"""Export a trained orbax checkpoint to torch-layout safetensors.

Completes the interop loop: models trained here can be loaded by the
reference stack (and anything else reading the published flux /
HunyuanVideo-VAE key layouts). No reference equivalent — the reference
only consumes checkpoints in that layout.

Usage:
  python scripts/cnv/export.py CKPT_DIR OUT.safetensors \
      --config CONFIG.py [--source ema|params] [--kind mmdit|hunyuan_vae]

``CKPT_DIR`` is an epoch{e}-global_step{s} directory written by the
trainer (utils/ckpt.py::CheckpointIO).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("ckpt_dir", help="epoch*-global_step* directory (orbax)")
    p.add_argument("out", help="output .safetensors path")
    p.add_argument("--config", required=True, help="the training config (model geometry)")
    p.add_argument("--source", choices=("ema", "params"), default="ema")
    p.add_argument("--kind", choices=("mmdit", "hunyuan_vae"), default="mmdit")
    p.add_argument(
        "--layout", choices=("published", "flux", "native"), default="native",
        help="mmdit torch layout: 'published' = unfused q/k/v projections + "
             "liger RoPE pairing (what the reference's shipping configs "
             "load, fused_qkv=False use_liger_rope=True); 'flux' = fused "
             "qkv + interleaved RoPE (original Flux dumps); 'native' = "
             "keep the in-memory layout with liger pairing",
    )
    args = p.parse_args()

    import jax
    import numpy as np
    from safetensors.numpy import save_file

    from opensora_tpu.registry import MODELS, build_module
    from opensora_tpu.training.diffusion import TrainState
    from opensora_tpu.utils.ckpt import (
        CheckpointIO,
        export_hunyuan_vae_state_dict,
        export_mmdit_state_dict,
    )
    from opensora_tpu.utils.config import parse_configs
    from opensora_tpu.utils.optimizer import create_optimizer
    import opensora_tpu.models.mmdit  # noqa: F401 (register)
    import opensora_tpu.models.hunyuan_vae  # noqa: F401

    cfg = parse_configs([args.config])
    model_cfg = dict(cfg.model if args.kind == "mmdit" else cfg.ae)
    module = build_module(model_cfg, MODELS)

    # rebuild the TrainState template from the module's shapes, then restore
    import jax.numpy as jnp

    from opensora_tpu.utils.sampling import build_img_ids

    if args.kind == "mmdit":
        c = module.config
        B, lt, lh, lw, tl = 1, 2, 4, 4, 4
        L = lt * (lh // 2) * (lw // 2)
        sample_args = (
            jnp.zeros((B, L, c.in_channels)),
            build_img_ids(lt, lh, lw, 2, B),
            jnp.zeros((B, tl, c.context_in_dim)),
            jnp.zeros((B, tl, 3)),
            jnp.zeros((B,)),
            jnp.zeros((B, c.vec_in_dim)),
            jnp.zeros((B, L, c.in_channels + 4)) if c.cond_embed else None,
            jnp.full((B,), 4.0) if c.guidance_embed else None,
        )
        sample_args = tuple(a for a in sample_args if a is not None)
        shapes = jax.eval_shape(module.init, jax.random.PRNGKey(0), *sample_args)
    else:
        x0 = jnp.zeros((1, 3, 5, 32, 32))
        shapes = jax.eval_shape(
            lambda: module.init(
                {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}, x0
            )
        )
    template_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]
    tx = create_optimizer(lr=1e-4)
    template = TrainState.create(template_params, tx, ema=True)

    io = CheckpointIO()
    state, running, _ = io.load(args.ckpt_dir, template)
    params = state.ema_params if args.source == "ema" and state.ema_params is not None else state.params
    print(f"loaded {args.ckpt_dir} (global_step {running['global_step']}), source={args.source}")

    if args.kind == "mmdit":
        c = module.config
        dst_fused, dst_rope = {
            "published": (False, "split"),
            "flux": (True, "interleaved"),
            "native": (None, "split"),
        }[args.layout]
        sd = export_mmdit_state_dict(
            params, num_heads=c.num_heads, head_dim=c.hidden_size // c.num_heads,
            rope_convention=c.rope_convention,
            dst_fused=dst_fused, dst_rope_convention=dst_rope,
        )
    else:
        sd = export_hunyuan_vae_state_dict(params)
    sd = {k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in sd.items()}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_file(sd, args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
