"""Benchmark: TRUE full-11B T2V end-to-end latency on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

Methodology
-----------
The reference's headline single-GPU numbers are T2V 50-step end-to-end on
one H100 with TP + CPU offload (BASELINE.md / README.md:281-288):
  256px/129f: 60 s      768px/129f: 1656 s

This bench measures the same phases on ONE v5e chip and reports:

  e2e_256 = t_text(T5-XXL 512tok + CLIP-L, 3-way CFG)
          + 50 x t_step_256(full 11B MMDiT W8A8, CFG triple, 8316 img tok)
          + t_decode_256(HunyuanVideo VAE, 129f 256px)
  e2e_768 = t_text + 50 x t_step_768 + t_decode_768      (detail row)

plus ``e2e_measured_flow_s``: the SAME 256px pipeline run once as ONE
process — T5/CLIP encode -> free T5 -> 50-step jitted denoise (the real
I2VDenoiser lax.scan, utils/sampling.py) -> free MMDiT -> host-tiled VAE
decode — so the synthesized sum's composition error is bounded by a
measured number (VERDICT r3 item 4).

768px (latent 33x96x96 = 76032 img tokens) runs W8A8 with the Pallas
fused int8 matmul (``w8a8_pallas`` — int32 accumulators stay in VMEM;
the XLA int8 path's HBM int32 buffers don't fit at this shape) and
SEQUENTIAL 3-pass CFG (the CFG triple exceeds 16 GiB here; the reference
offloads at this shape for the same reason).

Weights are generated ON DEVICE from small uploaded random pools with
BOUNDED peak memory (values vary at fine grain — all-equal data measures
~2x fast on this chip, NOTES_r1.md; the tunneled link moved full trees
at 0.02 GiB/s, so bulk upload is off the setup path). Model-swap costs —
what a real one-chip serving flow pays per request, since
T5 -> MMDiT -> VAE cannot coexist in 16 GiB — are ANALYTIC projections
(fields carry an ``_analytic`` suffix): weight bytes over the MEASURED
host->device bandwidth, probed both as one contiguous 128 MiB device_put
and as a many-leaf pytree transfer (per-leaf overhead included; the
multi-leaf number feeds the swap rows). The reference's 60 s anchor
likewise includes its CPU-offload swap traffic.

A "train" phase times one jitted train step (fwd+bwd+AdamW+EMA,
remat=dots) at flagship layer geometry / reduced depth and reports
measured model TFLOP/s plus the ANALYTIC 11B-equivalent step time
(a full 11B train step does not fit one chip; labeled as analytic).

Phases run sequentially in separate processes (process exit is the only
guaranteed full HBM release on the tunneled backend). Timing is
differential host-fetch (block_until_ready is a no-op on this platform).

``python bench.py --smoke`` runs every phase through the same code paths
at toy geometry (~seconds) — the pre-flight gate that round 3 lacked.

detail.flops_normalized_vs_h100 scales by the chips' bf16 peak ratio
(H100 989 / v5e 197 TFLOP/s) — implementation efficiency at equal silicon.
"""

import json
import os
import sys
import time

SMOKE = os.environ.get("BENCH_SMOKE") == "1"


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


_LINK_BW = {}


def _probe_link_bw(log):
    """Measured host->device bandwidth (GiB/s), two ways:
      contig    — one 128 MiB device_put (the round-2/3 probe)
      multileaf — a 256-leaf pytree totalling 128 MiB, so per-leaf
                  dispatch overhead is priced in (a real model swap moves
                  thousands of leaves; ADVICE r3). Swap rows use this one.
    Each transfer is bounded by fetching a slice OF THE TRANSFERRED
    buffer (device_get of x[-8:] orders after the upload on the stream),
    not by a separate sync op whose enqueue order is not guaranteed.
    (Here the chip sits behind a network tunnel measuring ~0.02 GiB/s;
    production v5e host DMA is O(10 GiB/s). The bandwidth is reported so
    the swap rows stay interpretable either way.)"""
    import numpy as np
    import jax

    if "contig" not in _LINK_BW:
        n = 1 << (21 if SMOKE else 25)  # 8 MiB smoke / 128 MiB real
        buf = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        t0 = time.perf_counter()
        x = jax.device_put(buf)
        jax.device_get(x[-8:])
        _LINK_BW["contig"] = buf.nbytes / 2**30 / (time.perf_counter() - t0)
        del x

        leaves = [buf[i::256].copy() for i in range(256)]
        t0 = time.perf_counter()
        dev = jax.device_put(leaves)
        jax.device_get(dev[-1][-8:])
        _LINK_BW["multileaf"] = buf.nbytes / 2**30 / (time.perf_counter() - t0)
        del dev
        log(
            f"link bandwidth probe: contig {_LINK_BW['contig']:.3f} GiB/s, "
            f"256-leaf {_LINK_BW['multileaf']:.3f} GiB/s"
        )
    return _LINK_BW


_GEN_FN = {}


def _leaf_gen_fn():
    """Jitted per-leaf pool expander with BOUNDED temporaries.

    A leaf of n entries is filled by a fori_loop of 1M-entry window copies
    (dynamic_slice from a doubled pool + dynamic_update_slice into the
    output — XLA aliases the accumulator in place), so generating a leaf
    allocates exactly the leaf plus one window. Round 3's single
    jit(expand) materialized jnp.tile temporaries next to the 11.15 GiB
    MMDiT tree and OOMed the chip (BENCH_r03 rc=1; VERDICT r3 item 1).
    Window start offsets advance by 61 per rep so values never repeat
    with a short period. Executables are cached per (n, shape) by jax.jit;
    offsets are traced, so all leaves of one shape share a compile."""
    if "fn" in _GEN_FN:
        return _GEN_FN["fn"]
    from functools import partial

    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("n", "shape"))
    def gen(pool2, off, n, shape):
        P = pool2.shape[0] // 2
        if n <= P:
            return jax.lax.dynamic_slice(pool2, (off,), (n,)).reshape(shape)
        rest = 1
        for s in shape[1:]:
            rest *= s
        if len(shape) >= 2 and rest >= P:
            # 2D fill for giant leaves (nn.scan-stacked weights reach 2.5G
            # entries — a flat index would overflow the int32 scalar args
            # jax traces): every per-dimension index stays < 2^31
            d0, wpr = shape[0], -(-rest // P)

            def body2(kk, acc):
                r, w = kk // wpr, kk % wpr
                src = (off + kk * 61) % P
                win = jax.lax.dynamic_slice(pool2, (src,), (P,))
                dst_c = jnp.minimum(w * P, rest - P)
                return jax.lax.dynamic_update_slice(acc, win[None, :], (r, dst_c))

            acc = jax.lax.fori_loop(
                0, d0 * wpr, body2, jnp.zeros((d0, rest), pool2.dtype)
            )
            return acc.reshape(shape)
        assert n < 2**31 - P, f"flat path would overflow int32: {shape}"
        reps = -(-n // P)

        def body(j, acc):
            src = (off + j * 61) % P
            win = jax.lax.dynamic_slice(pool2, (src,), (P,))
            dst = jnp.minimum(j * P, n - P)
            return jax.lax.dynamic_update_slice(acc, win, (dst,))

        flat = jax.lax.fori_loop(0, reps, body, jnp.zeros((n,), pool2.dtype))
        return flat.reshape(shape)

    _GEN_FN["fn"] = gen
    return gen


def _device_rand_tree(shapes, seed, log, name, scale=0.02):
    """Random weight tree generated ON DEVICE: upload three 1M-entry pools
    (~12 MiB doubled) and fill leaves ONE AT A TIME via the bounded-peak
    window-copy expander (_leaf_gen_fn) with a sync barrier every ~1 GiB
    so finished temporaries free before the host enqueues further
    allocations. HBM peak = final tree + one leaf's window, never
    tree + whole-tree temporaries (the round-3 OOM).

    Replaces the full-tree host upload: the tunneled link moved the
    11.15 GiB MMDiT tree at 0.02 GiB/s = 633 s of setup (round-3 run).
    The model-swap cost a real one-chip serving flow pays per request is
    reported analytically as nbytes / measured multi-leaf link bandwidth
    (fields carry an _analytic suffix).

    Dtype policy (matches the retired host generator bit-for-bit):
    int8 leaves from an int8 pool; fp32 vectors/scalars (quant scales,
    norm gains) from a small-positive fp32 pool; every other float leaf is
    emitted bf16 even when the init shape says fp32 — serving runs bf16
    and an fp32 T5-XXL tree is 18.8 GiB, which OOMed the chip on upload."""
    import ml_dtypes
    import numpy as np
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    P = 1 << 20
    rng = np.random.default_rng(seed)
    pool_f = (rng.standard_normal(P).astype(np.float32) * scale).astype(
        ml_dtypes.bfloat16
    )
    pool_i = rng.integers(-127, 128, P, dtype=np.int64).astype(np.int8)
    pool_s = rng.uniform(0.002, 0.02, P).astype(np.float32)
    # doubled pools: any P-length window starting in [0, P) is contiguous
    pools = {
        k: jax.device_put(np.concatenate([p, p]))
        for k, p in (("f", pool_f), ("i", pool_i), ("s", pool_s))
    }

    leaves, treedef = jax.tree.flatten(shapes)
    gen = _leaf_gen_fn()
    outs = []
    enqueued = 0
    for i, s in enumerate(leaves):
        n = int(np.prod(s.shape)) if s.shape else 1
        off = (i * 997) % (P >> 1)
        if s.dtype == np.int8:
            cls = "i"
        elif str(s.dtype) == "float32" and s.ndim <= 1:
            cls = "s"
        elif s.dtype in (np.float32, ml_dtypes.bfloat16):
            cls = "f"
        else:
            outs.append(jnp.zeros(s.shape, s.dtype))
            continue
        out = gen(pools[cls], off, n=n, shape=tuple(s.shape))
        outs.append(out)
        enqueued += out.nbytes
        if enqueued >= 1 << 30:
            _sync()
            enqueued = 0
    _sync()
    nbytes = sum(x.nbytes for x in outs)
    bw = _probe_link_bw(log)["multileaf"]
    swap_s = nbytes / 2**30 / bw
    log(f"{name} on-device gen {nbytes / 2**30:.2f} GiB in "
        f"{time.perf_counter() - t0:.1f}s; swap cost {swap_s:.0f}s analytic "
        f"at the measured {bw:.3f} GiB/s multi-leaf link")
    return jax.tree.unflatten(treedef, outs), swap_s, nbytes


def _t5_cfg():
    from opensora_tpu.models.text.t5 import t5_small_test_config, t5_xxl_config

    return t5_small_test_config() if SMOKE else t5_xxl_config()


def _clip_cfg():
    from opensora_tpu.models.text.clip import clip_l_config, clip_small_test_config

    return clip_small_test_config() if SMOKE else clip_l_config()


def bench_text(log):
    """T5-XXL (512 tok) + CLIP-L (77 tok) encode, 3-way CFG batch."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.text.clip import CLIPTextModel
    from opensora_tpu.models.text.t5 import T5Encoder

    t5 = T5Encoder(_t5_cfg())
    ids = jnp.zeros((3, 64 if SMOKE else 512), jnp.int32)
    t0 = time.perf_counter()
    shapes = jax.eval_shape(t5.init, jax.random.PRNGKey(0), ids)
    t5_vars, t_swap_t5, _ = _device_rand_tree(shapes, 1, log, "t5-xxl")
    f5 = jax.jit(lambda v, i: t5.apply(v, i))
    fetch = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))
    t_t5 = _timed(lambda: f5(t5_vars, ids), fetch)
    log(f"t5-xxl encode {t_t5:.3f}s (setup {time.perf_counter() - t0:.0f}s)")
    del t5_vars, f5
    _sync()

    clip_cfg = _clip_cfg()
    clip = CLIPTextModel(clip_cfg)
    cids = jnp.zeros((3, min(77, clip_cfg.max_position_embeddings)), jnp.int32)
    cvars, t_swap_clip, _ = _device_rand_tree(
        jax.eval_shape(clip.init, jax.random.PRNGKey(0), cids), 2, log, "clip-l"
    )
    fc = jax.jit(lambda v, i: clip.apply(v, i))
    fetch_c = lambda o: jax.device_get(jnp.sum(o[0].astype(jnp.float32))
                                       if isinstance(o, tuple) else
                                       jnp.sum(o.astype(jnp.float32)))
    t_clip = _timed(lambda: fc(cvars, cids), fetch_c)
    log(f"clip-l encode {t_clip:.3f}s")
    del cvars
    return {
        "t_text": t_t5 + t_clip,
        "t_swap_text": t_swap_t5 + t_swap_clip,
        "link_bw": dict(_LINK_BW),
    }


def _mmdit_base():
    if SMOKE:
        return dict(
            in_channels=64, vec_in_dim=768, context_in_dim=4096,
            hidden_size=1024, mlp_ratio=4.0, num_heads=8, depth=2,
            depth_single_blocks=2, axes_dim=[16, 56, 56], qkv_bias=True,
            guidance_embed=True, cond_embed=True, dtype="bf16",
            param_dtype="bf16",
        )
    return dict(
        in_channels=64, vec_in_dim=768, context_in_dim=4096, hidden_size=3072,
        mlp_ratio=4.0, num_heads=24, depth=19, depth_single_blocks=38,
        axes_dim=[16, 56, 56], qkv_bias=True, guidance_embed=True,
        cond_embed=True, dtype="bf16", param_dtype="bf16",
    )


# (latent_t, latent_h, latent_w): 256px serving shape (129f) and the 768px
# flagship shape; smoke keeps the same code path at toy geometry
LATENT_256 = (5, 8, 12) if SMOKE else (33, 24, 42)
LATENT_768 = (5, 16, 16) if SMOKE else (33, 96, 96)
TXT_LEN = 64 if SMOKE else 512
SEQ_CHUNKS_768 = 4 if SMOKE else 16
NUM_STEPS = 4 if SMOKE else 50


def _mmdit_args(latent_t, latent_h, latent_w, txt_len, B, seed=0):
    import jax
    import jax.numpy as jnp

    from opensora_tpu.utils.sampling import build_img_ids

    hp, wp = latent_h // 2, latent_w // 2
    L = latent_t * hp * wp
    dtype = jnp.bfloat16
    return (
        jax.random.normal(jax.random.PRNGKey(seed), (B, L, 64), dtype),
        build_img_ids(latent_t, latent_h, latent_w, 2, B),
        jax.random.normal(jax.random.PRNGKey(seed + 1), (B, txt_len, 4096), dtype),
        jnp.zeros((B, txt_len, 3), jnp.float32),
        jnp.full((B,), 0.5, dtype),
        jax.random.normal(jax.random.PRNGKey(seed + 2), (B, 768), dtype),
        jax.random.normal(jax.random.PRNGKey(seed + 3), (B, L, 68), dtype),
        jnp.full((B,), 4.0, dtype),
    )


def bench_denoise(log):
    """Full-11B MMDiT denoise steps on ONE resident weight tree (the
    QuantDense param layout is identical across all modes):
      256px: W8A8 CFG-triple, W8A8 + int8-qk8 Pallas attention (measured
      here every run — VERDICT r3 item 2 banned the pasted constant),
      and weight-only W8; 768px: w8a8_pallas, sequential CFG."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel

    base = _mmdit_base()
    fetch = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))

    t0 = time.perf_counter()
    args256 = _mmdit_args(*LATENT_256, TXT_LEN, B=3)
    model_w8a8 = MMDiTModel(MMDiTConfig(**base, quantized="w8a8"))
    shapes = jax.eval_shape(model_w8a8.init, jax.random.PRNGKey(0), *args256)
    variables, t_swap, nbytes = _device_rand_tree(shapes, 6, log, "mmdit-int8")

    times = {}
    fwd = jax.jit(lambda v, *a: model_w8a8.apply(v, *a))
    times["w8a8"] = _timed(lambda: fwd(variables, *args256), fetch, n1=2, n2=8)
    log(f"mmdit w8a8 step(256px) {times['w8a8']:.3f}s "
        f"({nbytes / 2**30:.2f} GiB, setup {time.perf_counter() - t0:.0f}s)")
    del fwd
    _sync()

    # opt-in int8-MXU attention (ops/int8_flash.py, qk8 = P.V stays bf16):
    # measured fresh each run on the same weight tree; stays off the
    # headline until the real-weights criterion in docs/inference.md passes
    model_qk8 = MMDiTModel(
        MMDiTConfig(**base, quantized="w8a8", attn_backend="int8_qk8")
    )
    fwd = jax.jit(lambda v, *a: model_qk8.apply(v, *a))
    times["w8a8_qk8attn"] = _timed(
        lambda: fwd(variables, *args256), fetch, n1=2, n2=8
    )
    log(f"mmdit w8a8+int8qk8-attn step(256px) {times['w8a8_qk8attn']:.3f}s")
    del fwd
    _sync()

    model_w8 = MMDiTModel(MMDiTConfig(**base, quantized="w8"))
    fwd = jax.jit(lambda v, *a: model_w8.apply(v, *a))
    times["w8"] = _timed(lambda: fwd(variables, *args256), fetch, n1=2, n2=8)
    log(f"mmdit w8 step(256px) {times['w8']:.3f}s")
    del fwd, args256
    _sync()

    # 768px: latent (33, 96, 96) -> 76032 img + 512 txt tokens. Sequential
    # CFG (B=1, x3 passes per denoise step); Pallas int8 dense keeps the
    # int32 accumulators out of HBM (ops/int8_matmul.py).
    t0 = time.perf_counter()
    # seq_chunks=16: sequence-chunked block compute (one MLP chunk's
    # temporaries live at a time) — the unchunked 768px forward OOMs by
    # 3.4 GiB (linear1's 3.07 GiB output + two 1.75 GiB gelu buffers next
    # to 11.2 GiB of weights, round-3 run 2)
    args768 = _mmdit_args(*LATENT_768, TXT_LEN, B=1, seed=20)
    model_768 = MMDiTModel(
        MMDiTConfig(**base, quantized="w8a8_pallas", seq_chunks=SEQ_CHUNKS_768)
    )
    fwd = jax.jit(lambda v, *a: model_768.apply(v, *a))
    t_fwd = _timed(lambda: fwd(variables, *args768), fetch, n1=1, n2=2)
    times["w8a8_768_fwd"] = t_fwd
    times["w8a8_768_step"] = 3.0 * t_fwd  # CFG triple, sequential
    log(f"mmdit w8a8_pallas fwd(768px, B=1) {t_fwd:.3f}s -> "
        f"step {3 * t_fwd:.3f}s (setup {time.perf_counter() - t0:.0f}s)")
    del fwd
    _sync()

    # opt-in int8-qk8 attention at 768px: attention dominates at 76k
    # tokens and the anchored int8-qk8 kernel at block_k=1664 measured
    # 1.19x the bf16 kernel there (round-4 sweep) — reported every run,
    # headline stays bf16 per the docs/inference.md promotion criterion
    model_768q = MMDiTModel(
        MMDiTConfig(**base, quantized="w8a8_pallas",
                    attn_backend="int8_qk8", seq_chunks=SEQ_CHUNKS_768)
    )
    fwd = jax.jit(lambda v, *a: model_768q.apply(v, *a))
    t_fwd_q = _timed(lambda: fwd(variables, *args768), fetch, n1=1, n2=2)
    times["w8a8_768_qk8_fwd"] = t_fwd_q
    times["w8a8_768_qk8_step"] = 3.0 * t_fwd_q
    log(f"mmdit w8a8_pallas+int8qk8 fwd(768px, B=1) {t_fwd_q:.3f}s -> "
        f"step {3 * t_fwd_q:.3f}s")
    del variables, fwd
    return {"times": times, "nbytes": nbytes, "t_swap_mmdit": t_swap}


def _vae_cfg():
    from opensora_tpu.models.hunyuan_vae.model import AutoEncoder3DConfig

    if SMOKE:
        return AutoEncoder3DConfig(
            block_out_channels=(32, 32, 64, 64), layers_per_block=1,
            norm_num_groups=8, sample_size=32, sample_tsize=8,
            use_temporal_tiling=True, use_spatial_tiling=True,
        )
    return AutoEncoder3DConfig(use_temporal_tiling=True, use_spatial_tiling=True)


def bench_vae_decode(log):
    """HunyuanVideo causal 3D VAE decode at 256px AND 768px latents."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.hunyuan_vae.model import AutoencoderKLCausal3D
    from opensora_tpu.models.hunyuan_vae.tiled import TiledVAERunner

    vae = AutoencoderKLCausal3D(_vae_cfg())
    t0 = time.perf_counter()
    shapes = jax.eval_shape(
        lambda: vae.init(
            {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
            jnp.zeros((1, 3, 5, 64, 64), jnp.bfloat16),
        )
    )
    variables, t_swap, _ = _device_rand_tree(shapes, 8, log, "hunyuan-vae")
    # production decode path (utils/api.py): host-loop tiles around jitted
    # per-tile cores — jitting the whole 768px decode as one graph keeps
    # every tile's activations live and OOMs 16 GiB (tiled.py docstring)
    runner = TiledVAERunner(vae, variables)
    fetch = lambda o: jax.device_get(jnp.sum(o.astype(jnp.float32)))

    t256, t768 = LATENT_256[0], LATENT_768[0]
    z256 = jax.random.normal(
        jax.random.PRNGKey(7), (1, 16, t256, LATENT_256[1], LATENT_256[2]),
        jnp.bfloat16,
    )
    t_dec = _timed(lambda: runner.decode(z256), fetch)
    log(f"vae decode 256px {t_dec:.3f}s (setup {time.perf_counter() - t0:.0f}s)")

    z768 = jax.random.normal(
        jax.random.PRNGKey(9), (1, 16, t768, LATENT_768[1], LATENT_768[2]),
        jnp.bfloat16,
    )
    t_dec768 = _timed(lambda: runner.decode(z768), fetch, n1=1, n2=2)
    log(f"vae decode 768px {t_dec768:.3f}s")
    del variables
    return {"t_dec": t_dec, "t_dec_768": t_dec768, "t_swap_vae": t_swap}


def bench_flow(log):
    """MEASURED single-process serving flow at the 256px/129f shape
    (VERDICT r3 item 4): T5+CLIP encode (embeddings stay in HBM) -> free
    T5 -> the REAL I2VDenoiser 50-step lax.scan (utils/sampling.py, same
    path utils/api.py jits) -> free MMDiT -> host-tiled VAE decode.
    Each stage is compiled first, then timed once; the weight generation
    between stages stands in for the swap uploads a real one-chip flow
    pays (reported separately as the analytic swap rows). HBM release
    between stages is del + sync in ONE process — the thing the
    phase-per-process design never exercised."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.hunyuan_vae.model import AutoencoderKLCausal3D
    from opensora_tpu.models.hunyuan_vae.tiled import TiledVAERunner
    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
    from opensora_tpu.models.text.clip import CLIPTextModel
    from opensora_tpu.models.text.t5 import T5Encoder
    from opensora_tpu.utils import sampling as S
    from opensora_tpu.utils.inference import prepare_inference_condition

    lt, lh, lw = LATENT_256
    B, b3 = 1, 3
    total = {}

    # ---- stage 1: text encode (T5-XXL 3x512 + CLIP-L) ----
    t5 = T5Encoder(_t5_cfg())
    ids = jnp.zeros((b3, TXT_LEN), jnp.int32)
    t5_vars, _, _ = _device_rand_tree(
        jax.eval_shape(t5.init, jax.random.PRNGKey(0), ids), 1, log, "flow-t5"
    )
    f5 = jax.jit(lambda v, i: t5.apply(v, i))
    f5c = f5.lower(t5_vars, ids).compile()

    clip_cfg = _clip_cfg()
    clip = CLIPTextModel(clip_cfg)
    cids = jnp.zeros((b3, min(77, clip_cfg.max_position_embeddings)), jnp.int32)
    cvars, _, _ = _device_rand_tree(
        jax.eval_shape(clip.init, jax.random.PRNGKey(0), cids), 2, log, "flow-clip"
    )
    fcl = jax.jit(lambda v, i: clip.apply(v, i))
    fclc = fcl.lower(cvars, cids).compile()
    # warm both programs once: the FIRST execution of a freshly compiled
    # executable pays one-time program load/initialization on this backend
    # (observed 64 s for the 9.4 GiB T5 program vs 0.1 s warm) — the flow
    # row measures a steady-state request, same semantics as the
    # synthesized sum it is meant to bound
    _w = f5c(t5_vars, ids)
    _w2 = fclc(cvars, cids)
    del _w, _w2
    _sync()

    t0 = time.perf_counter()
    txt = f5c(t5_vars, ids)
    y = fclc(cvars, cids)
    y_vec = y[0] if isinstance(y, tuple) else y
    jax.device_get(jnp.sum(txt[:, 0, 0].astype(jnp.float32))
                   + jnp.sum(y_vec[:, 0].astype(jnp.float32)))
    total["t_text"] = time.perf_counter() - t0
    log(f"flow text {total['t_text']:.3f}s")
    # project to MMDiT conditioning dims when smoke shrinks the encoders
    mcfg_d = _mmdit_base()
    if txt.shape[-1] != mcfg_d["context_in_dim"]:
        txt = jnp.zeros((b3, TXT_LEN, mcfg_d["context_in_dim"]), jnp.bfloat16) + txt[..., :1]
    if y_vec.ndim != 2 or y_vec.shape[-1] != mcfg_d["vec_in_dim"]:
        y_vec = jnp.zeros((b3, mcfg_d["vec_in_dim"]), jnp.bfloat16)
    txt = txt.astype(jnp.bfloat16)
    y_vec = y_vec.astype(jnp.bfloat16)
    del t5_vars, cvars, f5, f5c, fcl, fclc
    _sync()

    # ---- stage 2: 50-step denoise (real I2VDenoiser scan) ----
    # channel=64//4: get_noise's channel is token_channels/patch^2, so z is
    # the plain 16-ch latent (B, 16, T, h, w) and pack() yields 64-ch tokens
    z = S.get_noise(
        jax.random.PRNGKey(42), B, lh * 8, lw * 8, lt,
        dtype=jnp.bfloat16, patch_size=2, channel=64 // 4,
    )
    timesteps = S.get_schedule(
        NUM_STEPS, (z.shape[-1] * z.shape[-2]) // 4, lt, shift=True
    )
    img1 = S.pack(z, patch_size=2)
    img = jnp.concatenate([img1] * 3, axis=0)
    img_ids = S.build_img_ids(lt, lh, lw, 2, b3)
    masks, masked_ref = prepare_inference_condition(z, "t2v", causal=True)
    model_kwargs = dict(
        img_ids=img_ids, txt=txt, txt_ids=jnp.zeros((b3, TXT_LEN, 3), jnp.float32),
        y_vec=y_vec,
    )

    model = MMDiTModel(MMDiTConfig(**mcfg_d, quantized="w8a8"))
    args = _mmdit_args(lt, lh, lw, TXT_LEN, B=3)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
    del args
    variables, _, _ = _device_rand_tree(shapes, 6, log, "flow-mmdit")
    denoiser = S.I2VDenoiser()

    def run(v, img, timesteps, mkw, masks, masked_ref):
        model_fn = lambda **kw: model.apply(v, *(
            kw[k] for k in ("img", "img_ids", "txt", "txt_ids", "timesteps",
                            "y_vec", "cond", "guidance")
        ))
        return denoiser.denoise(
            model_fn, img=img, timesteps=timesteps, guidance=7.5,
            guidance_img=1.0, masks=masks, masked_ref=masked_ref,
            patch_size=2, cfg_batched=True, **mkw,
        )

    # The scan runs in CHUNK-step segments (one compiled executable reused
    # across segments; the shared boundary timestep keeps the Euler chain
    # exact, and with oscillation off the per-step guidance is constant, so
    # chunking is numerically identical to one 50-step scan). One monolithic
    # 50-step execution is ~170 s of device time — the round-4 on-chip run
    # crashed the tunneled TPU worker mid-execution at exactly that point,
    # while every ≤40 s execution in the other phases passed. A tiny fetch
    # between segments bounds each RPC at ~CHUNK * t_step.
    CHUNK = 2 if SMOKE else 10
    assert NUM_STEPS % CHUNK == 0
    seg0 = timesteps[: CHUNK + 1]
    runj = jax.jit(run)
    runc = runj.lower(variables, img, seg0, model_kwargs, masks, masked_ref).compile()
    _sync()
    t0 = time.perf_counter()
    x = img
    for k in range(0, NUM_STEPS, CHUNK):
        seg = jax.lax.slice_in_dim(timesteps, k, k + CHUNK + 1, axis=0)
        x_b = runc(variables, x, seg, model_kwargs, masks, masked_ref)
        jax.device_get(x_b[0, 0, 0])  # bound the per-RPC execution span
        x = jnp.concatenate([x_b, x_b, x_b], axis=0)
    x = x[:B]
    jax.device_get(jnp.sum(x[:, 0, 0].astype(jnp.float32)))
    total["t_denoise"] = time.perf_counter() - t0
    log(f"flow denoise {NUM_STEPS} steps ({CHUNK}/segment) "
        f"{total['t_denoise']:.3f}s")
    del variables, runj, runc
    _sync()

    # ---- stage 3: VAE decode (host-tiled) ----
    x = S.unpack(x.astype(jnp.float32), lh * 8, lw * 8, lt, patch_size=2)
    vae = AutoencoderKLCausal3D(_vae_cfg())
    vshapes = jax.eval_shape(
        lambda: vae.init(
            {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
            jnp.zeros((1, 3, 5, 64, 64), jnp.bfloat16),
        )
    )
    vvars, _, _ = _device_rand_tree(vshapes, 8, log, "flow-vae")
    runner = TiledVAERunner(vae, vvars)
    xw = runner.decode(jnp.zeros_like(x).astype(jnp.bfloat16))  # compile tiles
    jax.device_get(jnp.sum(xw[:, 0, 0, 0].astype(jnp.float32)))
    del xw
    t0 = time.perf_counter()
    video = runner.decode(x.astype(jnp.bfloat16))
    jax.device_get(jnp.sum(video[:, :, 0].astype(jnp.float32)))
    total["t_dec"] = time.perf_counter() - t0
    log(f"flow vae decode {total['t_dec']:.3f}s")
    del vvars, runner

    total["e2e_measured"] = total["t_text"] + total["t_denoise"] + total["t_dec"]
    log(f"flow e2e MEASURED (one process, {NUM_STEPS} steps) "
        f"{total['e2e_measured']:.1f}s")
    return total


def bench_train(log):
    """One jitted train step (fwd+bwd+AdamW+EMA, remat=dots) at flagship
    layer geometry, depth 2+4 (the 11B stack's optimizer state does not
    fit one chip), stage-1-like bucket shape (256px, 33f, B=1). Reports
    measured model TFLOP/s and the ANALYTIC 11B-equivalent step time."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
    from opensora_tpu.training.diffusion import TrainState, make_train_step
    from opensora_tpu.utils.optimizer import create_optimizer
    from opensora_tpu.utils.sampling import build_img_ids

    if SMOKE:
        latent_t, latent_h, latent_w, txt_len = 3, 8, 8, 64
        B, depth, depth_single = 1, 1, 2
    else:
        latent_t, latent_h, latent_w, txt_len = 9, 32, 32, 512
        B, depth, depth_single = 1, 2, 4
    cfg = MMDiTConfig(
        **{**_mmdit_base(), "depth": depth, "depth_single_blocks": depth_single},
        remat=True, remat_policy="dots",
    )
    model = MMDiTModel(cfg)
    hp, wp = latent_h // 2, latent_w // 2
    L = latent_t * hp * wp
    dtype = jnp.bfloat16
    t0 = time.perf_counter()
    inc, ctx, vec = cfg.in_channels, cfg.context_in_dim, cfg.vec_in_dim
    batch = {
        "x0": jax.random.normal(jax.random.PRNGKey(0), (B, L, inc), dtype),
        "img_ids": build_img_ids(latent_t, latent_h, latent_w, 2, B),
        "txt": jax.random.normal(jax.random.PRNGKey(1), (B, txt_len, ctx), dtype),
        "txt_ids": jnp.zeros((B, txt_len, 3), jnp.float32),
        "y_vec": jax.random.normal(jax.random.PRNGKey(2), (B, vec), dtype),
        "cond": jax.random.normal(jax.random.PRNGKey(3), (B, L, inc + 4), dtype),
        "guidance": jnp.full((B,), 4.0, dtype),
        "shift_alpha": jnp.ones((B,), jnp.float32),
        "null_txt": jnp.zeros((B, txt_len, ctx), dtype),
        "null_vec": jnp.zeros((B, vec), dtype),
    }
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        batch["x0"], batch["img_ids"], batch["txt"], batch["txt_ids"],
        jnp.zeros((B,)), batch["y_vec"], batch["cond"], batch["guidance"],
    )
    params, _, _ = _device_rand_tree(shapes, 11, log, f"mmdit-train({depth}+{depth_single})")
    params = params["params"]
    tx = create_optimizer(lr=1e-4)
    state = TrainState.create(params, tx, ema=True)
    step_fn = jax.jit(
        make_train_step(model, tx, text_dropout_prob=0.1), donate_argnums=(0,)
    )

    holder = {"state": state}

    def one_step():
        holder["state"], metrics = step_fn(
            holder["state"], batch, jax.random.PRNGKey(1)
        )
        return metrics["loss"]

    t_step = _timed(one_step, lambda o: jax.device_get(o), n1=2, n2=8)
    n_tokens = L + txt_len

    def block_flops(dd, ds):
        # per-token MACs x (2 flops/MAC) x n_tokens. Each token passes
        # through exactly ONE stream's qkv/proj/mlp in a double block
        # (n_tokens already sums img+txt), so no cross-stream factor.
        d = cfg.hidden_size
        mlp = int(d * cfg.mlp_ratio)
        lin_double = 3 * d * d + d * d + 2 * d * mlp
        lin_single = (3 * d * d + d * mlp) + (d + mlp) * d
        attn = 2 * n_tokens * d
        return 2 * n_tokens * ((lin_double + attn) * dd + (lin_single + attn) * ds)

    fwd_flops = B * block_flops(depth, depth_single)
    train_flops = 3.0 * fwd_flops  # fwd + bwd ~= 3x fwd (remat adds ~1 fwd -> 4x; report both)
    tflops = train_flops / t_step / 1e12
    t_step_11b = t_step * block_flops(19, 38) / block_flops(depth, depth_single)
    log(f"train step({depth}+{depth_single} blocks, {n_tokens} tok) {t_step:.3f}s = "
        f"{tflops:.0f} model TFLOP/s (3x-fwd convention) -> 11B analytic "
        f"{t_step_11b:.2f}s/step")
    return {
        "t_train_step": t_step,
        "train_model_tflops": tflops,
        "t_train_step_11b_analytic": t_step_11b,
        "train_tokens": n_tokens,
    }


def _setup_jax():
    from opensora_tpu.utils.config import apply_jax_platform_env

    apply_jax_platform_env()  # honor JAX_PLATFORMS=cpu (smoke/CI) under axon
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr)


# Per-phase wall-clock bounds, ~2x the slowest observed run at this env's
# tunnel speed (weight-gen dominates; a wedged RPC otherwise burns hours)
_PHASE_TIMEOUT_S = {
    "text": 1800, "denoise": 5400, "vae": 2400, "train": 2400, "flow": 5400,
}


def _run_phase(phase: str) -> dict:
    """Each phase runs in its own process: T5-XXL (9.4 GiB), the 11B int8
    MMDiT (11.2 GiB) and the VAE cannot coexist in 16 GiB HBM, and process
    exit is the only guaranteed full release on the tunneled backend.

    One retry per phase: the tunneled TPU worker can wedge mid-RPC
    (observed round 3 and round 4 — a vae phase froze at 24 s of CPU for
    40+ min with the tunnel itself healthy). A fresh process reconnects
    cleanly; a second identical failure is real and propagates. Phase
    stderr streams through live (stdout carries the result JSON)."""
    import subprocess

    env = dict(os.environ)
    if SMOKE:
        env["BENCH_SMOKE"] = "1"
    timeout = 7200 if SMOKE else _PHASE_TIMEOUT_S[phase]
    last_err = None
    for attempt in (1, 2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", phase],
                stdout=subprocess.PIPE, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=timeout, env=env,
            )
        except subprocess.TimeoutExpired:
            last_err = f"phase {phase} timed out after {timeout}s"
            _log(f"{last_err} (attempt {attempt})")
            continue
        if proc.returncode == 0:
            return json.loads(proc.stdout.strip().splitlines()[-1])
        last_err = f"bench phase {phase} failed rc={proc.returncode}"
        _log(f"{last_err} (attempt {attempt})")
    raise RuntimeError(last_err)


def phase_main(phase: str):
    _setup_jax()
    if phase == "text":
        print(json.dumps(bench_text(_log)))
    elif phase == "denoise":
        print(json.dumps(bench_denoise(_log)))
    elif phase == "vae":
        print(json.dumps(bench_vae_decode(_log)))
    elif phase == "train":
        print(json.dumps(bench_train(_log)))
    elif phase == "flow":
        print(json.dumps(bench_flow(_log)))
    else:
        raise ValueError(phase)


def main():
    text = _run_phase("text")
    den = _run_phase("denoise")
    vae = _run_phase("vae")
    train = _run_phase("train")
    # the measured one-process flow is informative, not load-bearing: a
    # failure (e.g. in-process HBM release quirks on the tunneled backend)
    # must not take down the whole artifact again (VERDICT r3 item 1)
    try:
        flow = _run_phase("flow")
    except Exception as e:  # noqa: BLE001
        _log(f"flow phase failed (non-fatal): {e}")
        flow = None

    t_text = text["t_text"]
    step_times, nbytes = den["times"], den["nbytes"]
    t_step = step_times["w8a8"]
    t_dec = vae["t_dec"]

    e2e = t_text + 50.0 * t_step + t_dec
    e2e_768 = t_text + 50.0 * step_times["w8a8_768_step"] + vae["t_dec_768"]
    swaps = text["t_swap_text"] + den["t_swap_mmdit"] + vae["t_swap_vae"]
    baseline_e2e = 60.0      # 1xH100 256px (TP + offload), README.md:281-288
    baseline_768 = 1656.0    # 1xH100 768px
    peak_ratio = 989.0 / 197.0  # H100 : v5e bf16 peak
    detail = {
        "text_encode_s": round(t_text, 3),
        "step_time_w8a8_s": round(t_step, 4),
        "step_time_w8_s": round(step_times["w8"], 4),
        "denoise_steps_per_sec": round(1.0 / t_step, 4),
        "vae_decode_s": round(t_dec, 3),
        "params_gib": round(nbytes / 2**30, 2),
        "flops_normalized_vs_h100": round((baseline_e2e / e2e) * peak_ratio, 3),
        "tokens": 3 * (LATENT_256[0] * LATENT_256[1] * LATENT_256[2] // 4 + TXT_LEN),
        # opt-in int8-MXU attention (configs/diffusion/inference/
        # 256px_int8attn.py, ops/int8_flash.py): MEASURED this run on the
        # same weight tree; stays off the headline until the real-weights
        # promotion criterion (docs/inference.md) can be evaluated
        "step_time_w8a8_int8qk8_attn_s": round(step_times["w8a8_qk8attn"], 4),
        # --- 768px flagship shape (VERDICT r2 item 2) ---
        "e2e_768px_s": round(e2e_768, 1),
        "vs_baseline_768px": round(baseline_768 / e2e_768, 4),
        "flops_normalized_vs_h100_768px": round(
            (baseline_768 / e2e_768) * peak_ratio, 3
        ),
        "step_time_768px_s": round(step_times["w8a8_768_step"], 3),
        "fwd_768px_B1_s": round(step_times["w8a8_768_fwd"], 3),
        "vae_decode_768px_s": round(vae["t_dec_768"], 3),
        "cfg_mode_768px": "sequential 3-pass (CFG triple exceeds 16 GiB)",
        # opt-in anchored int8-qk8 attention at 768px (attention dominates
        # at 76k tokens): measured this run; headline stays bf16 until the
        # real-weights promotion criterion (docs/inference.md) is met
        "step_time_768px_int8qk8_s": round(step_times["w8a8_768_qk8_step"], 3),
        "e2e_768px_int8attn_s": round(
            t_text + 50.0 * step_times["w8a8_768_qk8_step"] + vae["t_dec_768"], 1
        ),
        # --- serving swap accounting (VERDICT r2 item 5) ---
        # ANALYTIC rows (suffix says so): weight bytes / measured
        # multi-leaf host->device bandwidth (per-leaf overhead priced in;
        # this env's tunnel link — production v5e DMA is O(10 GiB/s))
        "model_swaps_s_analytic": round(swaps, 1),
        "e2e_with_swaps_s_analytic": round(e2e + swaps, 1),
        "e2e_768px_with_swaps_s_analytic": round(e2e_768 + swaps, 1),
        "swap_note": "analytic: nbytes / measured multi-leaf link bandwidth",
        # same bytes at a production-typical 10 GiB/s host->TPU DMA: this
        # env reaches the chip over a ~0.02 GiB/s network tunnel, so the
        # rows above price the DEV link, not what a v5e host pays. The
        # reference's 60 s anchor pays its swaps over H100 PCIe.
        "model_swaps_s_analytic_prod10gibps": round(
            swaps * text["link_bw"]["multileaf"] / 10.0, 1
        ),
        "e2e_with_swaps_s_analytic_prod10gibps": round(
            e2e + swaps * text["link_bw"]["multileaf"] / 10.0, 1
        ),
        # measured host->device bandwidth behind the swap rows (this env
        # tunnels the chip over a network link; production v5e host DMA is
        # O(10 GiB/s) — divide the swap rows accordingly)
        "link_bw_contig_gibps": round(text["link_bw"]["contig"], 4),
        "link_bw_multileaf_gibps": round(text["link_bw"]["multileaf"], 4),
        # --- training throughput (VERDICT r2 item 3) ---
        "train_step_s_2x4_blocks": round(train["t_train_step"], 4),
        "train_model_tflops": round(train["train_model_tflops"], 1),
        "train_step_11b_s_analytic": round(
            train["t_train_step_11b_analytic"], 2
        ),
        "train_note": "measured at depth 2+4 (11B optimizer state "
                      "exceeds one chip); 11B row is analytic FLOPs "
                      "scale-up at the same tokens/step",
        "w8a8_quality": "1.3% rel L2 vs fp32 at realistic stats "
                        "(tests/test_quant.py), headline promoted round 2",
    }
    if flow is not None:
        # measured one-process flow (VERDICT r3 item 4): bounds the
        # composition error of summing per-process phases
        detail["e2e_measured_flow_s"] = round(flow["e2e_measured"], 1)
        detail["flow_text_s"] = round(flow["t_text"], 3)
        detail["flow_denoise_s"] = round(flow["t_denoise"], 2)
        detail["flow_vae_decode_s"] = round(flow["t_dec"], 3)
    else:
        detail["e2e_measured_flow_s"] = None
        detail["flow_note"] = "flow phase failed this run; see stderr"
    print(json.dumps({
        "metric": "t2v_11b_256px_129f_50step_e2e_seconds_single_chip",
        "value": round(e2e, 1),
        "unit": "s (T5+CLIP encode + 50-step W8A8 denoise + VAE decode, full 19+38 blocks)",
        "vs_baseline": round(baseline_e2e / e2e, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        os.environ["BENCH_SMOKE"] = "1"
        SMOKE = True
        sys.argv = [a for a in sys.argv if a != "--smoke"]
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        phase_main(sys.argv[2])
    else:
        main()
