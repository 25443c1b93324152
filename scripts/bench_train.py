"""Training-step throughput at flagship layer geometry (reduced depth).

Times one jitted train step (fwd + bwd + AdamW + EMA) of the MMDiT with
Pallas flash attention fwd+bwd, and scales per-step time to the 19+38-block
11B stack by analytic FLOPs (same methodology as bench.py; training ≈ 3×
forward FLOPs). Prints one JSON line.
"""

import json
import sys
import time


def block_flops(hidden: int, mlp_ratio: float, n_tokens: int, depth_double: int, depth_single: int) -> float:
    """Per-forward FLOPs of the block stacks for batch 1 (x2 for MACs)."""
    d = hidden
    mlp = int(hidden * mlp_ratio)
    # double block: each token passes through exactly ONE stream's
    # qkv/proj/mlp (n_tokens already sums img+txt tokens, so a cross-stream
    # factor 2 here would double-count — fixed round 3)
    lin_double = 3 * d * d + d * d + 2 * d * mlp
    # single block: linear1 (3d^2+d*mlp) + linear2 ((d+mlp)*d)
    lin_single = (3 * d * d + d * mlp) + (d + mlp) * d
    attn = 2 * n_tokens * d  # per token: qk^T + pv over full seq
    per_tok_double = 2 * (lin_double + attn)
    per_tok_single = 2 * (lin_single + attn)
    return n_tokens * (per_tok_double * depth_double + per_tok_single * depth_single)




def main():
    import argparse

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
    from opensora_tpu.training.diffusion import TrainState, make_train_step
    from opensora_tpu.utils.optimizer import create_optimizer
    from opensora_tpu.utils.sampling import build_img_ids

    ap = argparse.ArgumentParser()
    # latent_t 9 = 33 frames (the stage-1 training shape); 33 = 129 frames
    # (stage-2 video shape — NOTES_r1: "dots" OOMs there, use offload/full)
    ap.add_argument("--latent_t", type=int, default=9)
    ap.add_argument("--remat_policy", default="dots",
                    choices=["dots", "full", "offload", "none"])
    args = ap.parse_args()

    latent_t, latent_h, latent_w, txt_len = args.latent_t, 32, 32, 512
    B = 1
    depth, depth_single = 2, 4

    cfg = MMDiTConfig(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=depth, depth_single_blocks=depth_single,
        axes_dim=[16, 56, 56], qkv_bias=True, guidance_embed=True, cond_embed=True,
        dtype="bf16", param_dtype="bf16",
        remat=args.remat_policy != "none", remat_policy=args.remat_policy,
    )
    model = MMDiTModel(cfg)

    hp, wp = latent_h // 2, latent_w // 2
    L = latent_t * hp * wp
    n_tokens = L + txt_len
    dtype = jnp.bfloat16
    batch = {
        "x0": jnp.zeros((B, L, 64), dtype),
        "img_ids": build_img_ids(latent_t, latent_h, latent_w, 2, B),
        "txt": jnp.zeros((B, txt_len, 4096), dtype),
        "txt_ids": jnp.zeros((B, txt_len, 3), jnp.float32),
        "y_vec": jnp.zeros((B, 768), dtype),
        "cond": jnp.zeros((B, L, 68), dtype),
        "guidance": jnp.full((B,), 4.0, dtype),
        "shift_alpha": jnp.ones((B,), jnp.float32),
        "null_txt": jnp.zeros((B, txt_len, 4096), dtype),
        "null_vec": jnp.zeros((B, 768), dtype),
    }

    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        batch["x0"], batch["img_ids"], batch["txt"], batch["txt_ids"],
        jnp.zeros((B,)), batch["y_vec"], batch["cond"], batch["guidance"],
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)["params"]

    tx = create_optimizer(lr=1e-4)
    state = TrainState.create(params, tx, ema=True)
    step_fn = jax.jit(
        make_train_step(model, tx, text_dropout_prob=0.1), donate_argnums=(0,)
    )

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    jax.device_get(metrics["loss"])
    print(f"[bench_train] compile {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    def timed(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        jax.device_get(metrics["loss"])
        return time.perf_counter() - t0

    timed(1)
    n1, n2 = 2, 12
    t1, t2 = timed(n1), timed(n2)
    dt = (t2 - t1) / (n2 - n1)

    fwd_flops = B * block_flops(3072, 4.0, n_tokens, depth, depth_single)
    train_flops = 3 * fwd_flops  # fwd + bwd ≈ 2× fwd (+remat recompute ≈ 1×)
    scale = block_flops(3072, 4.0, n_tokens, 19, 38) / block_flops(
        3072, 4.0, n_tokens, depth, depth_single
    )
    frames = 1 + 4 * (latent_t - 1)  # causal-VAE temporal compression
    print(json.dumps({
        "metric": "mmdit_256px_train_steps_per_sec_11b_equiv",
        "value": round(1.0 / (dt * scale), 4),
        "unit": f"steps/s/chip (bs=1, {frames}f 256px, remat={args.remat_policy})",
        "vs_baseline": None,
        "detail": {
            "measured_step_time_s": round(dt, 4),
            "measured_blocks": [depth, depth_single],
            "measured_train_tflops_per_s": round(train_flops / dt / 1e12, 2),
        },
    }))


if __name__ == "__main__":
    main()
