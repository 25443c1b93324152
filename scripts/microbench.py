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


def _bench(jax, fn, *args, flops, n2=22, chain=False):
    import jax.numpy as jnp

    f = jax.jit(fn)
    jax.device_get(jnp.sum(f(*args).astype(jnp.float32)))

    if chain:
        # Dependency-chained repeats: the output feeds the next call's
        # first arg (requires matching shape/dtype, true for attention).
        # Identical repeated executions can short-circuit through the
        # axon tunnel (NOTES_r4: a stashed re-run "measured" 36,000
        # TFLOP/s) — chaining forces real sequential execution.
        def timed(n):
            o = args[0]
            t0 = time.perf_counter()
            for _ in range(n):
                o = f(o, *args[1:])
            jax.device_get(o[(0,) * (o.ndim - 1)])
            return time.perf_counter() - t0
    else:
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

    for mode, attn in ((True, None), ("w8a8", None), ("w8a8", "int8_qk8")):
        cfg = MMDiTConfig(
            in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
            mlp_ratio=4.0, num_heads=24, depth=19, depth_single_blocks=38,
            axes_dim=[16, 56, 56], qkv_bias=True, guidance_embed=True, cond_embed=True,
            dtype="bf16", param_dtype="bf16", quantized=mode,
            **({"attn_backend": attn} if attn else {}),
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
        print(f"11B step quantized={mode!r} attn={attn or 'pallas'}: {dt:.3f} s",
              flush=True)
        del variables
        # barrier: params must actually free before the next mode allocates
        # (buffers alloc at enqueue time; the host races ahead otherwise)
        jax.device_get(jnp.zeros(()) + 1.0)


def suite_w8a8_breakdown():
    """Where does the 3.38 s W8A8 step go? Times the in-model components at
    the exact 129f/256px serving shapes: flash attention at L_tot = 9340
    (8828 img + 512 txt, every one of the 57 blocks attends over the concat)
    and every QuantDense shape through the real w8a8 path (activation
    row-max quant preamble + int8 dot + fp32 rescale epilogue)."""
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    from opensora_tpu.ops.flash_attention import flash_attention
    from opensora_tpu.ops.quant import QuantDense

    B, H, L, D = 3, 24, 9340, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.bfloat16) for kk in ks)
    fl = 4.0 * B * H * L * L * D
    dt_att, tf = _bench(jax, lambda q, k, v: flash_attention(q, k, v), q, k, v, flops=fl)
    print(f"flash @ (3,24,{L},128): {dt_att * 1e3:.1f} ms {tf:.1f} TFLOP/s "
          f"-> x57 = {57 * dt_att:.2f} s/step", flush=True)

    # (count per step, M, K, N) for every quantized dense in the model
    M_img, M_txt, M_all = 3 * 8828, 3 * 512, 3 * 9340
    shapes = [
        ("dbl img qkv", 19, M_img, 3072, 9216),
        ("dbl img proj", 19, M_img, 3072, 3072),
        ("dbl img mlp0", 19, M_img, 3072, 12288),
        ("dbl img mlp2", 19, M_img, 12288, 3072),
        ("dbl txt qkv", 19, M_txt, 3072, 9216),
        ("dbl txt proj", 19, M_txt, 3072, 3072),
        ("dbl txt mlp0", 19, M_txt, 3072, 12288),
        ("dbl txt mlp2", 19, M_txt, 12288, 3072),
        ("sgl linear1", 38, M_all, 3072, 21504),
        ("sgl linear2", 38, M_all, 15360, 3072),
    ]
    rng = np.random.default_rng(0)
    total_dense = 0.0
    for name, count, M, K, N in shapes:
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
        layer = QuantDense(N, use_bias=True, mode="w8a8")
        params = {
            "kernel_q": jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8),
            "kernel_scale": jnp.full((N,), 0.01, jnp.float32),
            "bias": jnp.zeros((N,), jnp.float32),
        }
        dt, tops = _bench(
            jax, lambda p, xx: layer.apply({"params": p}, xx), params, x,
            flops=2.0 * M * K * N, n2=12,
        )
        total_dense += count * dt
        print(f"{name}: {dt * 1e3:.2f} ms {tops:.0f} TOPS-equiv "
              f"-> x{count} = {count * dt * 1e3:.0f} ms", flush=True)
    print(f"dense total {total_dense:.2f} s + attention {57 * dt_att:.2f} s "
          f"= {total_dense + 57 * dt_att:.2f} s (measured step 3.38 s)", flush=True)


def suite_int8_flash():
    """bf16 flash vs int8 flash (full / qk8) at the 129f serving shape,
    over candidate block sizes. Also prints on-chip error vs the bf16
    kernel at a smaller shape (the interpret-mode bounds live in
    tests/test_int8_flash.py; this confirms real-MXU int8 behaves)."""
    jax = _setup()
    import jax.numpy as jnp
    import numpy as np

    from opensora_tpu.ops.flash_attention import flash_attention
    from opensora_tpu.ops.int8_flash import int8_flash_attention

    B, H, L, D = 3, 24, 9340, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.bfloat16) for kk in ks)
    fl = 4.0 * B * H * L * L * D

    dt, tf = _bench(jax, lambda q, k, v: flash_attention(q, k, v), q, k, v,
                    flops=fl, chain=True)
    print(f"bf16 flash: {dt * 1e3:.1f} ms {tf:.1f} TFLOP/s", flush=True)
    for pv_int8 in (True, False):
        for bq, bk in [(768, 1536), (1024, 1536), (512, 1024)]:
            dt, tf = _bench(
                jax,
                lambda q, k, v, bq=bq, bk=bk, p=pv_int8: int8_flash_attention(
                    q, k, v, block_q=bq, block_k=bk, pv_int8=p
                ),
                q, k, v, flops=fl, chain=True,
            )
            tag = "full" if pv_int8 else "qk8"
            print(f"int8 {tag} ({bq},{bk}): {dt * 1e3:.1f} ms {tf:.1f} TFLOP/s-equiv",
                  flush=True)

    # on-chip error check vs f32-accum xla at a small shape
    from opensora_tpu.ops.attention import xla_attention

    Bs, Hs, Ls = 2, 4, 1024
    ks2 = jax.random.split(jax.random.PRNGKey(1), 3)
    qs, ks_, vs = (jax.random.normal(kk, (Bs, Hs, Ls, D), jnp.bfloat16) for kk in ks2)
    ref = np.asarray(xla_attention(qs.astype(jnp.float32), ks_.astype(jnp.float32),
                                   vs.astype(jnp.float32)))
    for pv_int8 in (True, False):
        got = np.asarray(int8_flash_attention(qs, ks_, vs, pv_int8=pv_int8),
                         np.float32)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        print(f"on-chip rel-L2 ({'full' if pv_int8 else 'qk8'}): {rel:.4f}", flush=True)


def suite_flash768():
    """bf16 vs int8 flash attention at the 768px/129f serving shape
    (B=1, 76544 tokens): attention is ~72 TFLOP per call here (quadratic),
    the dominant cost of the 768px step — the shape where int8 attention's
    kernel win actually moves the e2e number."""
    jax = _setup()
    import jax.numpy as jnp

    from opensora_tpu.ops.flash_attention import flash_attention
    from opensora_tpu.ops.int8_flash import int8_flash_attention

    B, H, L, D = 1, 24, 76544, 128  # 33x48x48 img + 512 txt tokens
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, L, D), jnp.bfloat16) for kk in ks)
    fl = 4.0 * B * H * L * L * D

    dt, tf = _bench(jax, lambda q, k, v: flash_attention(q, k, v), q, k, v,
                    flops=fl, n2=6, chain=True)
    print(f"bf16 flash 768px: {dt * 1e3:.1f} ms {tf:.1f} TFLOP/s", flush=True)
    for pv_int8, tag in ((False, "qk8"), (True, "full")):
        dt, tf = _bench(
            jax,
            lambda q, k, v, p=pv_int8: int8_flash_attention(q, k, v, pv_int8=p),
            q, k, v, flops=fl, n2=6, chain=True,
        )
        print(f"int8 {tag} 768px: {dt * 1e3:.1f} ms {tf:.1f} TFLOP/s-equiv",
              flush=True)


def suite_flashbwd():
    """Backward flash kernels (dkv + dq) block sweep — the bwd analogue of
    the round-4 forward sweep. Run after the round-5 per-logit rewrite
    (LSE-anchored exp2 FMA + pre-scale masking + hoisted sm_scale) to pick
    bwd-specific blocks. FLOPs convention: the two bwd kernels execute 7
    tile matmuls per (bq, bk) pair = 14·L²·D·B·H — actual MXU work
    including the s/dp recomputes, so the TFLOP/s is hardware utilization,
    not "useful-flops"."""
    jax = _setup()
    import jax.numpy as jnp

    from opensora_tpu.ops.flash_attention import (
        _flash_backward_impl,
        flash_attention_with_lse,
        pick_blocks,
    )

    # train shape (33f 256px: 2304 img + 512 txt) and serving 129f shape
    shapes = [(3, 24, 2816, 128), (3, 24, 9340, 128)]
    if len(sys.argv) > 2 and sys.argv[2] == "768":
        shapes = [(1, 24, 76544, 128)]
    for B, H, L, D in shapes:
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q, k, v, do = (
            jax.random.normal(kk, (B, H, L, D), jnp.bfloat16) for kk in ks
        )
        out, lse = jax.jit(flash_attention_with_lse)(q, k, v)
        delta = jnp.sum(
            do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
        )
        fl = 14.0 * B * H * float(L) * L * D
        cands = [(256, 512), (512, 512), (512, 1024), (512, 1536),
                 (768, 1536), (1024, 1536)]
        if L % 1664 == 0:
            cands += [(512, 1664), (1024, 1664)]
        auto = pick_blocks(L, L, D)
        print(f"bwd sweep @ ({B},{H},{L},{D}); fwd-heuristic blocks {auto}",
              flush=True)
        for bq, bk in cands:
            try:
                # lse/do/delta ride as jit ARGUMENTS: closed-over arrays
                # become module constants, and at the 768px shape the
                # 470 MiB `do` constant trips the tunnel's request-size
                # limit (HTTP 413) before the compiler even runs
                dt, tf = _bench(
                    jax,
                    lambda q, k, v, lse, do, delta, bq=bq, bk=bk:
                    _flash_backward_impl(
                        q, k, v, lse, do, delta,
                        sm_scale=D ** -0.5, block_q=bq, block_k=bk,
                        causal_block=None,
                    )[0],
                    q, k, v, lse, do, delta, flops=fl, n2=6,
                )
            except Exception as e:  # noqa: BLE001 — VMEM overflows expected
                print(f"bwd ({bq},{bk}): FAILED {type(e).__name__}", flush=True)
                continue
            print(f"bwd ({bq},{bk}): {dt * 1e3:.1f} ms  {tf:.1f} TFLOP/s",
                  flush=True)


def suite_vaebatch():
    """TiledVAERunner spatial_batch sweep at the 768px/129f latent: does
    stacking same-shape spatial tiles along batch beat per-tile dispatch?
    (NOTES_r3: 3x(9+3+3+1) dispatches -> 3x(3+1+1+1) at spatial_batch=3.)"""
    jax = _setup()
    import jax.numpy as jnp

    from opensora_tpu.models.hunyuan_vae.model import (
        AutoEncoder3DConfig,
        AutoencoderKLCausal3D,
    )
    from opensora_tpu.models.hunyuan_vae.tiled import TiledVAERunner

    cfg = AutoEncoder3DConfig(use_temporal_tiling=True, use_spatial_tiling=True)
    vae = AutoencoderKLCausal3D(cfg)
    shapes = jax.eval_shape(
        lambda: vae.init(
            {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
            jnp.zeros((1, 3, 5, 64, 64), jnp.bfloat16),
        )
    )
    variables = jax.tree.map(
        lambda s: (jax.random.normal(jax.random.PRNGKey(1), s.shape, jnp.float32)
                   * 0.02).astype(s.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating) else jnp.zeros(s.shape, s.dtype),
        shapes,
    )
    z = jax.random.normal(jax.random.PRNGKey(9), (1, 16, 33, 96, 96), jnp.bfloat16)

    def timed(runner):
        fetch = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))
        fetch(runner.decode(z))  # warm + compile
        t0 = time.perf_counter()
        fetch(runner.decode(z))
        t1 = time.perf_counter()
        fetch(runner.decode(z))
        fetch(runner.decode(z))
        return ((time.perf_counter() - t1) - (t1 - t0)) / 1.0

    for sb in (1, 2, 3):
        runner = TiledVAERunner(vae, variables, spatial_batch=sb)
        print(f"768px decode spatial_batch={sb}: {timed(runner):.2f} s",
              flush=True)


if __name__ == "__main__":
    {
        "flash": suite_flash,
        "matmul": suite_matmul,
        "step": suite_step,
        "w8a8b": suite_w8a8_breakdown,
        "int8flash": suite_int8_flash,
        "flash768": suite_flash768,
        "flashbwd": suite_flashbwd,
        "vaebatch": suite_vaebatch,
    }[sys.argv[1]]()
