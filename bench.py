"""Benchmark: TRUE full-11B T2V end-to-end latency on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology
-----------
The reference's headline single-GPU number is T2V 256x256, 50 denoise steps
in 60 s END-TO-END on one H100 with TP + CPU offload (BASELINE.md /
README.md:281-288). That 60 s includes T5-XXL/CLIP text encoding, the
50-step denoise loop, and the VAE decode — so this bench measures the same
three phases and reports their sum:

  e2e = t_text(T5-XXL 512tok + CLIP-L 77tok, 3-way CFG batch)
      + 50 x t_step(full 11B MMDiT fwd, 3-way CFG batch)
      + t_decode(HunyuanVideo causal-3D VAE, 129f 256px)

The measured shape matches the reference's default generation exactly:
129 frames, 256px, 16:9 -> 192x336 px -> latent (33, 24, 42) -> 8316 img
tokens + 512 txt tokens.

The denoise phase runs the FULL 11B architecture (19 double + 38 single
blocks, hidden 3072, 24 heads, Pallas flash attention, bf16 activations)
on ONE v5e chip with **W8A8 dynamic-int8 serving** (the int8 MXU doubles
MAC rate; output quality bounded by tests/test_quant.py::
test_w8a8_output_quality_bound_realistic_width — 1.3% rel L2 vs fp at
realistic statistics). Weight-only int8 is reported in detail. The
reference needs TP + CPU offload for this model on one GPU; here it fits
outright (11.2 GiB int8 weights).

Phases run sequentially with weights freed in between (T5-XXL bf16 9.4 GiB
and the 11B int8 MMDiT cannot coexist in 16 GiB — the reference offloads
for the same reason). Weights are random (not zeros: all-equal data
measures ~2x too fast on this chip, NOTES_r1.md). Timing is differential
host-fetch (block_until_ready is a no-op on tunneled platforms).

detail.flops_normalized_vs_h100 additionally scales by the chips' bf16 peak
ratio (H100 989 / v5e 197 TFLOP/s) — the implementation-efficiency
comparison at equal silicon.
"""

import json
import os
import sys
import time


def _timed(fn, fetch, n1=1, n2=4):
    """Differential timing: warm+sync, then (t(n2)-t(n1))/(n2-n1)."""
    fetch(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n1):
        out = fn()
    fetch(out)
    t1 = time.perf_counter()
    for _ in range(n2):
        out = fn()
    fetch(out)
    t2 = time.perf_counter()
    # differential noise can push sub-ms phases negative; clamp
    return max(((t2 - t1) - (t1 - t0)) / (n2 - n1), 0.0)


def _sync():
    """Barrier: TPU streams execute in order, so fetching a freshly enqueued
    op waits for everything before it. Needed because buffer ALLOCATION
    happens at host enqueue time — without a barrier the host races ahead
    and allocates the next phase's buffers while the previous phase's
    temporaries are still live (observed OOM at 11B geometry)."""
    import jax
    import jax.numpy as jnp

    jax.device_get(jnp.zeros(()) + 1.0)


def _rand_like(shapes, key, scale=0.02):
    """Random params for throughput measurement (zeros/constants measure ~2x
    too fast on this chip). Float leaves are forced to bf16 — fp32 masters
    don't fit next to the serving working set, and serving runs bf16.
    Generated directly in the target dtype: fp32 temporaries at 11B geometry
    are 150 MB each and pile up under async dispatch."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(shapes)

    def draw(k, shape, dtype):
        if dtype == jnp.int8:
            # reinterpreted 8-bit draws; threefry still materializes ~8x
            # the output bytes in uint32 temporaries
            return jax.lax.bitcast_convert_type(
                jax.random.bits(k, shape, jnp.uint8), jnp.int8
            )
        dt = jnp.bfloat16 if dtype == jnp.float32 else dtype
        return jax.random.normal(k, shape, dt) * jnp.asarray(scale, dt)

    out, pending = [], 0
    for i, s in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        is_rand = s.dtype == jnp.int8 or jnp.issubdtype(s.dtype, jnp.floating)
        nbytes = s.size * s.dtype.itemsize
        if not is_rand:
            arr = jnp.zeros(s.shape, s.dtype)
        elif nbytes > (192 << 20) and s.ndim >= 2 and s.shape[0] > 1:
            # huge scan-stacked leaf (e.g. the 2.5 GiB single-stream kernel
            # stack): one threefry call would OOM on its temporaries, so
            # scan per-layer draws — only one slice of temps is ever live
            arr = jax.lax.map(
                lambda kk: draw(kk, s.shape[1:], s.dtype),
                jax.random.split(k, s.shape[0]),
            )
        else:
            arr = draw(k, s.shape, s.dtype)
        out.append(arr)
        pending += nbytes
        if pending > (256 << 20):
            _sync()  # free RNG temporaries before enqueuing more draws
            pending = 0
    tree = jax.tree.unflatten(treedef, out)
    _sync()
    return tree


def bench_text(log):
    """T5-XXL (512 tok) + CLIP-L (77 tok) encode, 3-way CFG batch."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.text.clip import CLIPTextModel, clip_l_config
    from opensora_tpu.models.text.t5 import T5Encoder, t5_xxl_config

    t5 = T5Encoder(t5_xxl_config())
    ids = jnp.zeros((3, 512), jnp.int32)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(t5.init, jax.random.PRNGKey(0), ids)
    t5_vars = _rand_like(shapes, jax.random.PRNGKey(1))
    f5 = jax.jit(lambda v, i: t5.apply(v, i))
    fetch = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))
    t_t5 = _timed(lambda: f5(t5_vars, ids), fetch)
    log(f"t5-xxl encode {t_t5:.3f}s (setup {time.perf_counter() - t0:.0f}s)")
    del t5_vars, f5
    _sync()

    clip = CLIPTextModel(clip_l_config())
    cids = jnp.zeros((3, 77), jnp.int32)
    cvars = _rand_like(jax.eval_shape(clip.init, jax.random.PRNGKey(0), cids),
                       jax.random.PRNGKey(2))
    fc = jax.jit(lambda v, i: clip.apply(v, i))
    fetch_c = lambda o: jax.device_get(jnp.sum(o[0].astype(jnp.float32))
                                       if isinstance(o, tuple) else
                                       jnp.sum(o.astype(jnp.float32)))
    t_clip = _timed(lambda: fc(cvars, cids), fetch_c)
    log(f"clip-l encode {t_clip:.3f}s")
    del cvars
    return t_t5 + t_clip


def bench_denoise(log):
    """Full-11B MMDiT denoise step (3-way CFG batch) — W8A8 + weight-only."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
    from opensora_tpu.utils.sampling import build_img_ids

    latent_t, latent_h, latent_w, txt_len = 33, 24, 42, 512
    B = 3  # CFG triple

    base = dict(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=19, depth_single_blocks=38,
        axes_dim=[16, 56, 56], qkv_bias=True, guidance_embed=True,
        cond_embed=True, dtype="bf16", param_dtype="bf16",
    )
    hp, wp = latent_h // 2, latent_w // 2
    L = latent_t * hp * wp
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    args = (
        jax.random.normal(key, (B, L, 64), dtype),
        build_img_ids(latent_t, latent_h, latent_w, 2, B),
        jax.random.normal(jax.random.PRNGKey(3), (B, txt_len, 4096), dtype),
        jnp.zeros((B, txt_len, 3), jnp.float32),
        jnp.full((B,), 0.5, dtype),
        jax.random.normal(jax.random.PRNGKey(4), (B, 768), dtype),
        jax.random.normal(jax.random.PRNGKey(5), (B, L, 68), dtype),
        jnp.full((B,), 4.0, dtype),
    )
    fetch = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))

    times = {}
    nbytes = 0
    for mode in ("w8a8", "w8"):
        model = MMDiTModel(MMDiTConfig(**base, quantized=mode))
        t0 = time.perf_counter()
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
        variables = _rand_like(shapes, jax.random.PRNGKey(6))
        nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(variables))
        fwd = jax.jit(lambda v, *a: model.apply(v, *a))
        times[mode] = _timed(lambda: fwd(variables, *args), fetch, n1=2, n2=8)
        log(
            f"mmdit {mode} step {times[mode]:.3f}s "
            f"({nbytes / 2**30:.2f} GiB, setup {time.perf_counter() - t0:.0f}s)"
        )
        del variables, fwd
        _sync()  # old params must actually free before the next mode allocates
    return times, nbytes


def bench_vae_decode(log):
    """HunyuanVideo causal 3D VAE decode: latent (33, 24, 42) -> 129f 256px."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.hunyuan_vae.model import (
        AutoEncoder3DConfig,
        AutoencoderKLCausal3D,
    )

    cfg = AutoEncoder3DConfig(use_temporal_tiling=True, use_spatial_tiling=True)
    vae = AutoencoderKLCausal3D(cfg)
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 33, 24, 42), jnp.bfloat16)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        lambda: vae.init(
            {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
            jnp.zeros((1, 3, 5, 64, 64), jnp.bfloat16),
        )
    )
    variables = _rand_like(shapes, jax.random.PRNGKey(8))
    dec = jax.jit(lambda v, z: vae.apply(v, z, method=AutoencoderKLCausal3D.decode))
    fetch = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))
    t_dec = _timed(lambda: dec(variables, z), fetch)
    log(f"vae decode {t_dec:.3f}s (setup {time.perf_counter() - t0:.0f}s)")
    del variables
    return t_dec


def _setup_jax():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr)


def _run_phase(phase: str) -> dict:
    """Each phase runs in its own process: T5-XXL (9.4 GiB), the 11B int8
    MMDiT (11.2 GiB) and the VAE cannot coexist in 16 GiB HBM, and process
    exit is the only guaranteed full release on the tunneled backend."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", phase],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=7200,
    )
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        raise RuntimeError(f"bench phase {phase} failed rc={proc.returncode}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def phase_main(phase: str):
    _setup_jax()
    if phase == "text":
        print(json.dumps({"t_text": bench_text(_log)}))
    elif phase == "denoise":
        times, nbytes = bench_denoise(_log)
        print(json.dumps({"times": times, "nbytes": nbytes}))
    elif phase == "vae":
        print(json.dumps({"t_dec": bench_vae_decode(_log)}))
    else:
        raise ValueError(phase)


def main():
    log = _log
    t_text = _run_phase("text")["t_text"]
    den = _run_phase("denoise")
    step_times, nbytes = den["times"], den["nbytes"]
    t_dec = _run_phase("vae")["t_dec"]

    t_step = step_times["w8a8"]
    e2e = t_text + 50.0 * t_step + t_dec
    baseline_e2e = 60.0  # 1xH100 (TP + offload), reference README.md:281-288
    peak_ratio = 989.0 / 197.0  # H100 : v5e bf16 peak
    print(json.dumps({
        "metric": "t2v_11b_256px_129f_50step_e2e_seconds_single_chip",
        "value": round(e2e, 1),
        "unit": "s (T5+CLIP encode + 50-step W8A8 denoise + VAE decode, full 19+38 blocks)",
        "vs_baseline": round(baseline_e2e / e2e, 4),
        "detail": {
            "text_encode_s": round(t_text, 3),
            "step_time_w8a8_s": round(t_step, 4),
            "step_time_w8_s": round(step_times["w8"], 4),
            "denoise_steps_per_sec": round(1.0 / t_step, 4),
            "vae_decode_s": round(t_dec, 3),
            "params_gib": round(nbytes / 2**30, 2),
            "flops_normalized_vs_h100": round(
                (baseline_e2e / e2e) * peak_ratio, 3
            ),
            "tokens": 3 * (33 * 12 * 21 + 512),
            "w8a8_quality": "1.3% rel L2 vs fp32 at realistic stats "
                            "(tests/test_quant.py), headline promoted round 2",
            # opt-in int8-MXU attention (configs/diffusion/inference/
            # 256px_int8attn.py, ops/int8_flash.py): measured 3.312 s/step
            # (scripts/microbench.py step), ~0.9% extra rel L2 per
            # attention call — not the headline until validated on real
            # weights
            "attn_int8_qk8_step_s": 3.312,
        },
    }))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        phase_main(sys.argv[2])
    else:
        main()
