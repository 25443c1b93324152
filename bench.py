"""Benchmark: MMDiT denoise-step throughput at 256px on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology
-----------
The reference's headline single-GPU number is T2V 256×256, 50 denoise steps
in 60 s on one H100 (BASELINE.md) → 0.833 denoise steps/s, where one step =
one MMDiT forward over a 3-way CFG batch (cond / uncond / uncond2).

The full 11B model (19 double + 38 single blocks, bf16 ≈ 22 GB) does not fit
a single v5e-8 chip's 16 GB HBM without weight streaming, so we measure the
flagship layer geometry (hidden 3072, 24 heads, head_dim 128, Pallas flash
attention, bf16) at reduced block count and scale the per-step time by the
analytic FLOPs ratio of the block stacks — blocks account for >99.5% of the
model FLOPs, and both block types are measured (the scaling is linear in
block count, not a model of anything else).

value = estimated 11B-equivalent denoise steps/s on this chip.
vs_baseline = value / 0.833  (>1 means faster than 1×H100 reference).
"""

import json
import math
import time


def block_flops(hidden: int, mlp_ratio: float, n_tokens: int, depth_double: int, depth_single: int) -> float:
    """Per-forward FLOPs of the block stacks for batch 1 (×2 for MACs)."""
    d = hidden
    mlp = int(hidden * mlp_ratio)
    # double block: img+txt each (qkv 3d² + proj d² + mlp 2·d·mlp) + joint attn
    lin_double = 2 * (3 * d * d + d * d + 2 * d * mlp)
    # single block: linear1 (3d²+d·mlp) + linear2 ((d+mlp)·d)
    lin_single = (3 * d * d + d * mlp) + (d + mlp) * d
    attn = 2 * n_tokens * d  # per token: qk^T + pv over full seq
    per_tok_double = 2 * (lin_double + attn)
    per_tok_single = 2 * (lin_single + attn)
    return n_tokens * (per_tok_double * depth_double + per_tok_single * depth_single)


def main():
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
    from opensora_tpu.utils.sampling import build_img_ids

    # 256px, 33 pixel frames → 9 latent frames, latent 32×32, patch 2
    latent_t, latent_h, latent_w, txt_len = 9, 32, 32, 512
    B = 3  # CFG triple
    depth, depth_single = 2, 4

    cfg = MMDiTConfig(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=depth, depth_single_blocks=depth_single,
        axes_dim=[16, 56, 56], qkv_bias=True, guidance_embed=True, cond_embed=True,
        dtype="bf16", param_dtype="bf16",
    )
    model = MMDiTModel(cfg)

    hp, wp = latent_h // 2, latent_w // 2
    L = latent_t * hp * wp
    n_tokens = L + txt_len
    dtype = jnp.bfloat16
    img = jnp.zeros((B, L, 64), dtype)
    img_ids = build_img_ids(latent_t, latent_h, latent_w, 2, B)
    txt = jnp.zeros((B, txt_len, 4096), dtype)
    txt_ids = jnp.zeros((B, txt_len, 3), jnp.float32)
    t = jnp.full((B,), 0.5, dtype)
    y_vec = jnp.zeros((B, 768), dtype)
    cond = jnp.zeros((B, L, 68), dtype)
    guidance = jnp.full((B,), 4.0, dtype)

    import sys

    args = (img, img_ids, txt, txt_ids, t, y_vec, cond, guidance)
    t0 = time.perf_counter()
    # zero-init via eval_shape: throughput does not depend on weight values,
    # and materializing ~1 GB of RNG on-device is wasted bench time
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    print(f"[bench] init {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    fwd = jax.jit(lambda v, *a: model.apply(v, *a))
    t0 = time.perf_counter()
    _ = jax.device_get(jnp.sum(fwd(variables, *args).astype(jnp.float32)))  # compile+sync
    print(f"[bench] compile {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def timed(n_iter):
        """Wall time of n_iter forwards + one host fetch. block_until_ready
        is a no-op on tunneled platforms, so sync via a scalar device_get;
        the differential below cancels the constant fetch latency."""
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iter):
            out = fwd(variables, *args)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0

    print(f"[bench] warm {timed(1):.2f}s", file=sys.stderr)
    n1, n2 = 2, 22
    t1, t2 = timed(n1), timed(n2)
    dt = (t2 - t1) / (n2 - n1)
    print(f"[bench] t({n1})={t1:.3f}s t({n2})={t2:.3f}s -> per-step {dt*1e3:.1f}ms", file=sys.stderr)

    flops_measured = B * block_flops(3072, 4.0, n_tokens, depth, depth_single)
    flops_full = B * block_flops(3072, 4.0, n_tokens, 19, 38)
    scale = flops_full / flops_measured
    est_step_time = dt * scale
    steps_per_sec = 1.0 / est_step_time

    baseline_steps_per_sec = 50.0 / 60.0  # 1×H100, README.md:281-288
    print(json.dumps({
        "metric": "mmdit_256px_denoise_steps_per_sec_11b_equiv",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 4),
        "detail": {
            "measured_step_time_s": round(dt, 4),
            "measured_blocks": [depth, depth_single],
            "flops_scale_to_11b": round(scale, 3),
            "measured_tflops_per_s": round(flops_measured / dt / 1e12, 2),
        },
    }))


if __name__ == "__main__":
    main()
