"""Microbenchmarks used for round-1 tuning, consolidated for re-measurement.

Run one suite on the real chip (serialize — one heavy job at a time):
  python scripts/microbench.py flash     # flash-attn block sweep @ 129f shape
  python scripts/microbench.py matmul    # bf16 / w8-dequant / w8a8 MLP shapes
  python scripts/microbench.py step      # full-11B int8 CFG step (w8 + w8a8)

Methodology notes (NOTES_r1.md): differential timing over jitted repeats
(block_until_ready is a no-op over the tunnel); RANDOM inputs (all-ones
matrices measure up to 2x faster on this chip); persistent compile cache.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _setup():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _bench(jax, fn, *args, flops, n2=22):
    import jax.numpy as jnp

    f = jax.jit(fn)
    jax.device_get(jnp.sum(f(*args).astype(jnp.float32)))

    def timed(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = f(*args)
        jax.device_get(jnp.sum(o.astype(jnp.float32)))
        return time.perf_counter() - t0

    timed(1)
    a, b = timed(2), timed(n2)
    dt = (b - a) / (n2 - 2)
    return dt, flops / dt / 1e12


def suite_flash():
    jax = _setup()
    import jax.numpy as jnp

    from opensora_tpu.ops.flash_attention import flash_attention

    B, H, L, D = 3, 24, 8828, 128  # 129f 256px reference shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.bfloat16) for kk in ks)
    flops = 4.0 * B * H * L * L * D
    for bq, bk in [(512, 1024), (512, 1536), (768, 1536), (1024, 1536)]:
        dt, tf = _bench(
            jax, lambda q, k, v, bq=bq, bk=bk: flash_attention(q, k, v, block_q=bq, block_k=bk),
            q, k, v, flops=flops,
        )
        print(f"flash ({bq},{bk}): {dt * 1e3:.1f} ms  {tf:.1f} TFLOP/s", flush=True)


def suite_matmul():
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    for M, K, N in [(26484, 3072, 12288), (8192, 3072, 3072)]:
        fl = 2.0 * M * K * N
        ab = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
        bb = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32)).astype(jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
        sa = jnp.full((M, 1), 0.01, jnp.float32)
        sw = jnp.full((1, N), 0.02, jnp.float32)

        def w8a8(a, b):
            acc = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sa * sw).astype(jnp.bfloat16)

        _, t_bf = _bench(jax, lambda a, b: a @ b, ab, bb, flops=fl)
        _, t_w8 = _bench(jax, lambda a, b: a @ (b.astype(jnp.bfloat16) * sw.astype(jnp.bfloat16)), ab, b8, flops=fl)
        _, t_88 = _bench(jax, w8a8, a8, b8, flops=fl)
        print(f"{M}x{K}x{N}: bf16 {t_bf:.1f} | w8-dequant {t_w8:.1f} | w8a8 {t_88:.1f} TFLOP/s-equiv", flush=True)


def suite_step():
    jax = _setup()
    import jax.numpy as jnp

    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
    from opensora_tpu.utils.sampling import build_img_ids

    for mode in (True, "w8a8"):
        cfg = MMDiTConfig(
            in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
            mlp_ratio=4.0, num_heads=24, depth=19, depth_single_blocks=38,
            axes_dim=[16, 56, 56], qkv_bias=True, guidance_embed=True, cond_embed=True,
            dtype="bf16", param_dtype="bf16", quantized=mode,
        )
        model = MMDiTModel(cfg)
        B, lt, lh, lw, tl = 3, 33, 24, 42, 512
        L = lt * (lh // 2) * (lw // 2)
        dt8 = jnp.bfloat16
        args = (
            jnp.zeros((B, L, 64), dt8), build_img_ids(lt, lh, lw, 2, B),
            jnp.zeros((B, tl, 4096), dt8), jnp.zeros((B, tl, 3), jnp.float32),
            jnp.full((B,), 0.5, dt8), jnp.zeros((B, 768), dt8),
            jnp.zeros((B, L, 68), dt8), jnp.full((B,), 4.0, dt8),
        )
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
        variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        dt, _ = _bench(
            jax, lambda v, *a: model.apply(v, *a), variables, *args,
            flops=1.0, n2=12,
        )
        print(f"11B step quantized={mode!r}: {dt:.3f} s", flush=True)


if __name__ == "__main__":
    {"flash": suite_flash, "matmul": suite_matmul, "step": suite_step}[sys.argv[1]]()
