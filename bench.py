"""Benchmark: TRUE full-11B MMDiT denoise-step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology
-----------
The reference's headline single-GPU number is T2V 256×256, 50 denoise steps
in 60 s on one H100 with TP + CPU offload (BASELINE.md / README.md:281-288)
→ 0.833 denoise steps/s, where one step = one MMDiT forward over the 3-way
CFG batch (cond / uncond-text / uncond-all).

The measured shape matches the reference's default generation exactly:
129 frames, 256px, 16:9 → 192×336 px → latent (33, 24, 42) → 8316 img
tokens + 512 txt tokens, 3-way CFG batch.

Here the FULL 11B architecture (19 double + 38 single blocks, hidden 3072,
24 heads, Pallas flash attention, bf16 activations) runs on ONE v5e chip
with int8 weight-only quantized blocks (opensora_tpu/ops/quant.py — 11.2 GiB
of weights, no TP, no offload — the reference needs both on one GPU).
Weight values are zeros (throughput is weight-value independent); per-step
time is measured with differential timing because block_until_ready is a
no-op on tunneled platforms (NOTES_r1.md).

detail.flops_normalized_vs_h100 additionally scales by the chips' bf16 peak
ratio (H100 989 / v5e 197 TFLOP/s) — the implementation-efficiency
comparison at equal silicon.
"""

import json
import os
import sys
import time


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
    from opensora_tpu.utils.sampling import build_img_ids

    # reference default: 256px 16:9 129f → latent (33, 24, 42), patch 2
    latent_t, latent_h, latent_w, txt_len = 33, 24, 42, 512
    B = 3  # CFG triple

    cfg = MMDiTConfig(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=19, depth_single_blocks=38,
        axes_dim=[16, 56, 56], qkv_bias=True, guidance_embed=True, cond_embed=True,
        dtype="bf16", param_dtype="bf16", quantized=True,
    )
    model = MMDiTModel(cfg)

    hp, wp = latent_h // 2, latent_w // 2
    L = latent_t * hp * wp
    dtype = jnp.bfloat16
    args = (
        jnp.zeros((B, L, 64), dtype),
        build_img_ids(latent_t, latent_h, latent_w, 2, B),
        jnp.zeros((B, txt_len, 4096), dtype),
        jnp.zeros((B, txt_len, 3), jnp.float32),
        jnp.full((B,), 0.5, dtype),
        jnp.zeros((B, 768), dtype),
        jnp.zeros((B, L, 68), dtype),
        jnp.full((B,), 4.0, dtype),
    )

    t0 = time.perf_counter()
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(variables))
    print(
        f"[bench] params {nbytes / 2**30:.2f} GiB, init {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )

    fwd = jax.jit(lambda v, *a: model.apply(v, *a))
    t0 = time.perf_counter()
    jax.device_get(jnp.sum(fwd(variables, *args).astype(jnp.float32)))
    print(f"[bench] compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def timed(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fwd(variables, *args)
        jax.device_get(jnp.sum(out.astype(jnp.float32)))
        return time.perf_counter() - t0

    timed(1)  # warm fetch path
    n1, n2 = 2, 12
    t1, t2 = timed(n1), timed(n2)
    dt = (t2 - t1) / (n2 - n1)

    baseline_steps_per_sec = 50.0 / 60.0  # 1×H100, reference README.md:281-288
    steps_per_sec = 1.0 / dt
    peak_ratio = 989.0 / 197.0  # H100 : v5e bf16 peak
    print(json.dumps({
        "metric": "mmdit_11b_256px_129f_denoise_steps_per_sec_single_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s/chip (full 19+38 blocks, 129f ref shape, int8 weights)",
        "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 4),
        "detail": {
            "step_time_s": round(dt, 4),
            "est_50step_e2e_s": round(50 * dt, 1),
            "params_gib": round(nbytes / 2**30, 2),
            "flops_normalized_vs_h100": round(
                steps_per_sec * peak_ratio / baseline_steps_per_sec, 3
            ),
            "tokens": 3 * (33 * 12 * 21 + 512),
            # opt-in W8A8 (dynamic int8 activations, configs/diffusion/
            # inference/256px_w8a8.py) measured separately: 3.38 s/step
            # (169 s / 50 steps, 1.78x flops-normalized) — the headline
            # above is the quality-safe weight-only path.
            "w8a8_step_time_s": 3.379,
        },
    }))


if __name__ == "__main__":
    main()
