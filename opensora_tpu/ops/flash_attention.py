"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the reference's flash-attn CUDA dependency
(reference call sites: opensora/models/mmdit/math.py:16-36 and the fwd/bwd
primitives re-exported for ring attention in
opensora/models/mmdit/distributed.py:115-217).

Design notes
------------
- Layout (B, H, L, D), D = head_dim (128 for MMDiT). fp32 accumulation, MXU
  matmuls via dot_general with preferred_element_type=f32.
- Online softmax with running (m, l) scratch carried across the innermost
  (sequential) kv-block grid dimension; the log-sum-exp is exposed so ring
  attention can rescale partial outputs across ppermute steps (the
  `_rescale_out_lse` semantics of reference distributed.py:305-373).
- Optional ``causal_block``: frame-causal masking at a granularity of
  ``causal_block`` tokens (tokens of frame i attend to frames <= i). This is
  the mask the HunyuanVideo VAE mid-block attention needs (reference
  opensora/models/hunyuan_vae/unet_causal_3d_blocks.py:52-60) — computed
  in-kernel from indices instead of materializing an O(L^2) bias.
- Backward = two kernels (dkv over kv-major grid, dq over q-major grid),
  recomputing p from the stored LSE, flash-attention-v2 style.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # 1/ln(2)
LN2 = 0.6931471805599453

# Fixed-anchor fast path dispatches only when the Cauchy-Schwarz bound on
# |scaled logits| is below this (log2 domain). Worst-case row gap is then
# 2*40 = 80 log2 units — comfortably inside fp32/bf16 normal range
# (2^-126), so exp2(s*c - A) can neither overflow nor fully underflow.
ANCHOR_MAX_LOG2 = 40.0

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024

# Calibrated ceiling for _vmem_proxy_bytes (NOT real bytes — see there).
# Anchors, measured on-chip: every validated pick sits below it — the
# largest is the wide-head (768, 1536, 512) at 17.3M proxy units (runs:
# the VAE mid-block) — and the one known-bad pick (1024, 1536, 512),
# which Mosaic rejected at 16.87M real scoped bytes, lands at 21.0M
# proxy units. The ceiling splits the two with margin on both sides.
_VMEM_PROXY_BUDGET = 19 << 20


def _vmem_proxy_bytes(block_q: int, block_k: int, dim: int) -> int:
    """Proxy for a flash tile set's scoped-VMEM footprint.

    Naive accounting — double-buffered bf16 q/k/v input tiles plus two
    fp32 (bq, bk) score-sized intermediates — calibrated as an ORDERING
    proxy, not an absolute byte count (Mosaic's allocator packs tighter;
    the one measured overflow reported 16.87M real vs 21.0M proxy). Keeps
    pick_blocks' accreting per-shape special cases safe: any new candidate
    must come in under the ceiling the validated picks satisfy."""
    in_tiles = 2 * (block_q * dim + 2 * block_k * dim) * 2
    scores = 2 * block_q * block_k * 4
    return in_tiles + scores


def _check_vmem(bq: int, bk: int, dim: int) -> tuple[int, int]:
    assert _vmem_proxy_bytes(bq, bk, dim) <= _VMEM_PROXY_BUDGET, (
        f"block pick ({bq}, {bk}) at dim {dim} exceeds the calibrated "
        f"VMEM proxy budget ({_vmem_proxy_bytes(bq, bk, dim)} > "
        f"{_VMEM_PROXY_BUDGET}); re-sweep on-chip before raising the "
        "ceiling (see pick_blocks docstring for the measured anchors)"
    )
    return bq, bk


def pick_blocks(q_len: int, kv_len: int, dim: int = 128) -> tuple[int, int]:
    """Static block-size heuristic, measured on v5e (NOTES_r1.md sweep +
    round-2 re-sweep): bk=1536 beats 1024 at every length tried (L=2816:
    91 vs 84 TFLOP/s; L=8828: 112 vs 92); bq=1024 edges out 768 at long
    sequences (114.3 vs 112.3 at L=8828) but ONLY at head_dim 128 — at the
    VAE mid-block's head_dim 512 the (1024, 1536) tile set overflows the
    16 MB scoped VMEM budget (observed: 16.87M at L=13056), so wide heads
    stay at 768. block_k=2048 hangs the Mosaic compiler >1h — never use
    it. Shorter sequences shrink blocks so the grid still has parallelism.

    When a candidate block_k EXACTLY divides kv_len, the kernels' per-tile
    tail-mask select disappears (``need_tail`` is False) — worth 1.5% to
    the bf16 anchored kernel and 10% to the VPU-bound int8-qk8 kernel at
    the 768px serving length 76544 = 46 * 1664 (round-4 on-chip sweep,
    NOTES_r4.md). Checked at dim <= 128 only: 1664 adds ~8% VMEM over
    1536, unverified against the wide-head budget."""
    if q_len >= 8192:
        bq = 1024 if dim <= 128 else 768
    elif q_len >= 1024:
        bq = 512
    else:
        bq = 256
    if kv_len >= 2560:
        bk = 1536
        if dim <= 128 and kv_len % 1536 != 0 and kv_len % 1664 == 0:
            bk = 1664  # the only alternative measured; don't guess others
    elif kv_len >= 2048:
        bk = 1024
    else:
        bk = 512
    return _check_vmem(min(bq, q_len), min(bk, kv_len), dim)


def pick_blocks_bwd(q_len: int, kv_len: int, dim: int = 128) -> tuple[int, int]:
    """Backward-grid block heuristic, measured separately from the forward
    (round-5 on-chip sweeps, ``scripts/microbench.py flashbwd``): the bwd
    kernels favor bq=768 at dim 128 for train-scale lengths — (768, 1536)
    beats the fwd heuristic's (512, 1536) by 1.28x at the train shape
    L=2816 (2.9 vs 3.7 ms) and is best-in-sweep at L=9340 (34.6 ms, vs
    35.0 for the fwd pick (1024, 1536)). At the 768px serving-scale
    length L=76544 the ordering flips: (1024, 1664) is best-in-sweep
    (573.4 ms / 439.5 TFLOP/s-equiv, 5% over (768, 1536)) — hence the
    16384 threshold (between the two measured regimes). Wide heads keep
    the fwd heuristic: its VMEM reasoning applies unchanged and the bwd
    was never measured there."""
    if dim > 128:
        return pick_blocks(q_len, kv_len, dim)
    bq = 256 if q_len < 1024 else (768 if q_len < 16384 else 1024)
    if kv_len >= 2560:
        bk = 1536
        if kv_len % 1536 != 0 and kv_len % 1664 == 0:
            bk = 1664  # exact division kills the per-tile tail selects
    elif kv_len >= 2048:
        bk = 1024
    else:
        bk = 512
    return _check_vmem(min(bq, q_len), min(bk, kv_len), dim)


def _zero_tail_rows(x, blk_idx, block, valid_len):
    """Zero rows of a loaded tile that lie beyond ``valid_len``.

    Out-of-bounds tail blocks are backed by unspecified memory; any NaN/inf
    there poisons MXU contractions (0 * NaN = NaN), so garbage rows must be
    zeroed in the data itself, not just masked in the scores.
    """
    rows = blk_idx * block + lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(rows < valid_len, x, jnp.zeros_like(x))

def _mask_scores(s, qi, ki, block_q, block_k, q_len, kv_len, causal_block,
                 mask_val=NEG_INF):
    """Apply tail-padding + frame-causal masks to a (bq, bk) score tile.

    ``mask_val``: pass NEG_INF / sm_scale when masking PRE-scale scores so
    the post-scale value is exactly NEG_INF (see _fwd_kernel).

    The masking runs unconditionally on every tile. Two cheaper schemes
    were tried and rejected on-chip (round 4): (a) an in-kernel lax.cond
    that masks only the tail tile triples the score tile's scoped-VMEM
    footprint (operand + both branch buffers = 18.3M > the 16M limit at
    the serving block sizes 1024x1536); (b) a closed-form
    pad*exp2(-anchor) denominator correction cancels catastrophically in
    fp32 when a row's real logits all sit far below the zero-scoring
    pads."""
    bq, bk = s.shape
    need_tail = kv_len % block_k != 0
    if need_tail or causal_block is not None:
        col = ki * block_k + lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if need_tail:
        s = jnp.where(col < kv_len, s, mask_val)
    if causal_block is not None:
        row = qi * block_q + lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        s = jnp.where(col // causal_block <= row // causal_block, s, mask_val)
    return s


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale, block_q, block_k, q_len, kv_len, causal_block,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    if kv_len % block_k != 0:
        k = _zero_tail_rows(k, ki, block_k, kv_len)
        v = _zero_tail_rows(v, ki, block_k, kv_len)

    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # The whole softmax bookkeeping runs in the exp2 domain: the VPU's
    # exponential is exp2, so exp(x) costs a hidden per-logit multiply by
    # log2(e). Folding sm_scale*log2e into ONE compile-time constant makes
    # the per-logit work exactly one FMA + exp2 (this kernel is VPU-bound,
    # ~6 vector ops per logit against a half-idle MXU — per-logit ops are
    # the whole game). m/l scratch therefore hold log2-domain values; the
    # natural-log LSE is reconstructed once per row at finalize. Masking
    # happens pre-scale with NEG_INF/c so every threshold stays unchanged.
    c = sm_scale * LOG2E
    s = _mask_scores(s, qi, ki, block_q, block_k, q_len, kv_len, causal_block,
                     mask_val=NEG_INF / c)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True) * c
    m_new = jnp.maximum(m_prev, m_cur)
    # guard fully-masked tiles: exp2(NEG_INF - NEG_INF) would be 1,
    # poisoning l/acc; anchor the exponent at 0 when the whole row is
    # still masked.
    m_safe = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
    p = jnp.exp2(s * c - m_safe)
    correction = jnp.exp2(m_prev - m_safe)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)

    pv = lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * correction + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        # m is log2-domain: natural lse = m*ln2 + log(l)
        lse_ref[0, 0, :, 0] = (
            m_scr[:, 0] * LN2 + jnp.log(l_safe[:, 0])
        ).astype(lse_ref.dtype)


def _fwd_kernel_anchored(
    a2_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
    l_scr, acc_scr,
    *, sm_scale, block_q, block_k, q_len, kv_len,
):
    """Fixed-anchor forward: softmax anchored at a precomputed upper bound
    on the scaled logits instead of a running max.

    With QK-RMSNormed inputs the Cauchy-Schwarz bound
    ``A = sm_scale * max_row(|q|) * max_row(|k|)`` is small (~16-25 in the
    log2 domain), so ``exp2(s*c - A)`` never overflows and — dispatched only
    when A < ANCHOR_MAX_LOG2 — never fully underflows either (worst-case
    row gap is 2A < 80 log2 units, inside fp32 normal range). This kills
    the per-tile max reduction, the m scratch, and both rescaling
    multiplies: per-logit work is exactly FMA + exp2 + sum + cast. Exact
    (not approximate): softmax is anchor-invariant.

    Bidirectional only. KV tail padding is masked to exactly p=0 with an
    unconditional per-tile select — NOT via a closed-form pad*exp2(-A)
    subtraction from the denominator (catastrophic cancellation) and NOT
    via a tail-tile-only lax.cond (3x scoped-VMEM on the score tile; see
    _mask_scores docstring for both on-chip rulings).
    """
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    if kv_len % block_k != 0:
        # p for pad columns is masked to exactly 0 below (garbage K rows
        # only ever reach pad columns, so K needs no zeroing), but
        # 0 * NaN = NaN in the PV contraction, so garbage V tail rows must
        # be zeroed in the data.
        v = _zero_tail_rows(v, ki, block_k, kv_len)

    # Per-(b,h) log2-domain anchor, >= all s*c by Cauchy-Schwarz. Shaped
    # (B, H, 1, 1) with a (1,1,1,1) block: trailing dims span the array,
    # so Mosaic's (8,128)-divisible-or-full rule is satisfied (the
    # (B,H)-shaped variant with a (1,1) block is NOT lowerable — same
    # class as the int8 K-scale bug caught on-chip this round).
    a2 = a2_ref[0, 0, 0, 0]
    c = sm_scale * LOG2E
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp2(s * c - a2)
    if kv_len % block_k != 0:
        col = ki * block_k + lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(col < kv_len, p, 0.0)
    l_scr[...] += jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
    )
    acc_scr[...] += lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)
        lse_ref[0, 0, :, 0] = (a2 * LN2 + jnp.log(l_safe[:, 0])).astype(
            lse_ref.dtype
        )


def _flash_forward(
    q, k, v, *, sm_scale, block_q, block_k, causal_block, debug=False, interpret=False
):
    batch, heads, q_len, dim = q.shape
    kv_len = k.shape[2]
    block_q = min(block_q, q_len)
    block_k = min(block_k, kv_len)
    nq = pl.cdiv(q_len, block_q)
    nk = pl.cdiv(kv_len, block_k)

    grid = (batch, heads, nq, nk)
    qkv_specs = [
        pl.BlockSpec((1, 1, block_q, dim), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, dim), lambda b, h, qi, ki: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, block_k, dim), lambda b, h, qi, ki: (b, h, ki, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, dim), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((batch, heads, q_len, 1), jnp.float32),
    ]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )

    def _run_standard(q, k, v):
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel,
                sm_scale=sm_scale,
                block_q=block_q,
                block_k=block_k,
                q_len=q_len,
                kv_len=kv_len,
                causal_block=causal_block,
            ),
            grid=grid,
            in_specs=qkv_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, dim), jnp.float32),
            ],
            compiler_params=compiler_params,
            debug=debug,
            interpret=interpret,
        )(q, k, v)

    if causal_block is not None:
        out, lse = _run_standard(q, k, v)
        return out, lse[..., 0]

    # Bidirectional (MMDiT) case: runtime-dispatch the fixed-anchor fast
    # path when the Cauchy-Schwarz logit bound is small (always true for
    # QK-RMSNormed streams; see _fwd_kernel_anchored). The bound costs one
    # extra read of q and k (~2% of kernel time at serving lengths); the
    # anchored kernel removes the per-tile max reduction and rescaling.
    def _run_anchored(ops):
        a2v, q, k, v = ops
        return pl.pallas_call(
            functools.partial(
                _fwd_kernel_anchored,
                sm_scale=sm_scale,
                block_q=block_q,
                block_k=block_k,
                q_len=q_len,
                kv_len=kv_len,
            ),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1), lambda b, h, qi, ki: (b, h, 0, 0)),
                *qkv_specs,
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, dim), jnp.float32),
            ],
            compiler_params=compiler_params,
            debug=debug,
            interpret=interpret,
        )(a2v, q, k, v)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    qn = jnp.max(jnp.sqrt(jnp.sum(qf * qf, axis=-1)), axis=-1)  # (B, H)
    kn = jnp.max(jnp.sqrt(jnp.sum(kf * kf, axis=-1)), axis=-1)  # (B, H)
    a2 = (sm_scale * LOG2E) * qn * kn
    # NaN-safe dispatch: NaN < bound is False, so poisoned inputs fall to
    # the running-max kernel rather than silently anchoring at NaN.
    out, lse = lax.cond(
        jnp.max(a2) < ANCHOR_MAX_LOG2,
        _run_anchored,
        lambda ops: _run_standard(*ops[1:]),
        (a2.reshape(batch, heads, 1, 1), q, k, v),
    )
    return out, lse[..., 0]


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, sm_scale, block_q, block_k, q_len, kv_len, causal_block,
):
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0, 0]        # (bq, d)
    k = k_ref[0, 0]        # (bk, d)
    v = v_ref[0, 0]        # (bk, d)
    do = do_ref[0, 0]      # (bq, d)
    lse = lse_ref[0, 0, :, 0]    # (bq,)
    delta = delta_ref[0, 0, :, 0]  # (bq,)
    if q_len % block_q != 0:
        q = _zero_tail_rows(q, qi, block_q, q_len)
        do = _zero_tail_rows(do, qi, block_q, q_len)
        # lse/delta tail entries are unspecified (NaN in interpret mode);
        # 0 * NaN = NaN would poison the dk/dv contractions.
        lse = _zero_tail_rows(lse_ref[0, 0], qi, block_q, q_len)[:, 0]
        delta = _zero_tail_rows(delta_ref[0, 0], qi, block_q, q_len)[:, 0]
    if kv_len % block_k != 0:
        k = _zero_tail_rows(k, ki, block_k, kv_len)
        v = _zero_tail_rows(v, ki, block_k, kv_len)

    # LSE-anchored exp2-domain recompute (see _fwd_kernel): the global LSE
    # from the forward IS the anchor, so p costs exactly one FMA + exp2 per
    # logit — mask pre-scale (like the forward) so the scale multiply fuses
    # into the FMA, and per-tile selects vanish entirely on exact-division
    # shapes (the 768px serving length with bk=1664).
    c = sm_scale * LOG2E
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = _mask_scores(s, qi, ki, block_q, block_k, q_len, kv_len, causal_block,
                     mask_val=NEG_INF / c)
    lse_safe = jnp.where(lse <= NEG_INF * 0.5, 0.0, lse) * LOG2E
    p = jnp.exp2(s * c - lse_safe[:, None])  # (bq, bk)
    if q_len % block_q != 0:
        p = _zero_tail_rows(p, qi, block_q, q_len)

    # dv += p^T @ do
    dv_scr[...] += lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # dp = do @ v^T
    dp = lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # sm_scale is a scalar: hoist it out of the per-logit ds (bq*bk mul)
    # into the per-output finalize (bk*dim mul, once per (b,h,ki))
    ds = p * (dp - delta[:, None])
    # dk += ds^T @ q
    dk_scr[...] += lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_scr[...] * sm_scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_scr,
    *, sm_scale, block_q, block_k, q_len, kv_len, causal_block,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0, :, 0]
    delta = delta_ref[0, 0, :, 0]
    if q_len % block_q != 0:
        lse = _zero_tail_rows(lse_ref[0, 0], qi, block_q, q_len)[:, 0]
        delta = _zero_tail_rows(delta_ref[0, 0], qi, block_q, q_len)[:, 0]
    if kv_len % block_k != 0:
        k = _zero_tail_rows(k, ki, block_k, kv_len)
        v = _zero_tail_rows(v, ki, block_k, kv_len)

    # LSE-anchored exp2 recompute + pre-scale masking + hoisted sm_scale,
    # mirroring _dkv_kernel (see its comments)
    c = sm_scale * LOG2E
    s = lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = _mask_scores(s, qi, ki, block_q, block_k, q_len, kv_len, causal_block,
                     mask_val=NEG_INF / c)
    lse_safe = jnp.where(lse <= NEG_INF * 0.5, 0.0, lse) * LOG2E
    p = jnp.exp2(s * c - lse_safe[:, None])
    if q_len % block_q != 0:
        p = _zero_tail_rows(p, qi, block_q, q_len)
    dp = lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta[:, None])
    dq_scr[...] += lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_scr[...] * sm_scale).astype(dq_ref.dtype)


def partial_flash_backward(
    q, k, v, do, lse, delta,
    *, sm_scale=None, block_q=None, block_k=None, causal_block=None,
    interpret=False,
):
    """(dq, dk, dv) partials given an externally-computed global LSE and
    delta = rowsum(do·out). This is the ring-attention building block: each
    ring step calls it with the local q/do and the visiting kv shard
    (reference bwd ring, distributed.py:316-373)."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    auto_bq, auto_bk = pick_blocks_bwd(q.shape[2], k.shape[2], q.shape[-1])
    return _flash_backward_impl(
        q, k, v, lse, do, delta,
        sm_scale=sm_scale, block_q=block_q or auto_bq,
        block_k=block_k or auto_bk, causal_block=causal_block,
        interpret=interpret,
    )


def _flash_backward(
    q, k, v, out, lse, do,
    *, sm_scale, block_q, block_k, causal_block, interpret=False,
):
    # delta = rowsum(do * o) — cheap, let XLA fuse it.
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    return _flash_backward_impl(
        q, k, v, lse, do, delta,
        sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        causal_block=causal_block, interpret=interpret,
    )


def _flash_backward_impl(
    q, k, v, lse, do, delta,
    *, sm_scale, block_q, block_k, causal_block, interpret=False,
):
    batch, heads, q_len, dim = q.shape
    kv_len = k.shape[2]
    block_q = min(block_q, q_len)
    block_k = min(block_k, kv_len)
    nq = pl.cdiv(q_len, block_q)
    nk = pl.cdiv(kv_len, block_k)

    lse4 = lse[..., None]
    delta4 = delta[..., None]

    common = dict(
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        q_len=q_len,
        kv_len=kv_len,
        causal_block=causal_block,
    )

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **common),
        grid=(batch, heads, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dim), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, dim), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, dim), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_q, dim), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ki, qi: (b, h, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_k, dim), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, dim), lambda b, h, ki, qi: (b, h, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dim), jnp.float32),
            pltpu.VMEM((block_k, dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse4, delta4)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **common),
        grid=(batch, heads, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dim), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, dim), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, dim), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_q, dim), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, dim), lambda b, h, qi, ki: (b, h, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse4, delta4)

    return dq, dk, dv


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _flash_attention(
    q, k, v, sm_scale, block_q, block_k, causal_block, interpret
):
    # block_q/block_k may be None (auto): the fwd and bwd grids want
    # DIFFERENT blocks (pick_blocks vs pick_blocks_bwd), so auto resolution
    # happens per-rule rather than at the API boundary.
    auto_bq, auto_bk = pick_blocks(q.shape[2], k.shape[2], q.shape[-1])
    out, _ = _flash_forward(
        q, k, v,
        sm_scale=sm_scale, block_q=block_q or auto_bq,
        block_k=block_k or auto_bk,
        causal_block=causal_block, interpret=interpret,
    )
    return out


def _flash_fwd_rule(q, k, v, sm_scale, block_q, block_k, causal_block, interpret):
    auto_bq, auto_bk = pick_blocks(q.shape[2], k.shape[2], q.shape[-1])
    out, lse = _flash_forward(
        q, k, v,
        sm_scale=sm_scale, block_q=block_q or auto_bq,
        block_k=block_k or auto_bk,
        causal_block=causal_block, interpret=interpret,
    )
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(sm_scale, block_q, block_k, causal_block, interpret, res, g):
    q, k, v, out, lse = res
    auto_bq, auto_bk = pick_blocks_bwd(q.shape[2], k.shape[2], q.shape[-1])
    dq, dk, dv = _flash_backward(
        q, k, v, out, lse, g,
        sm_scale=sm_scale, block_q=block_q or auto_bq,
        block_k=block_k or auto_bk,
        causal_block=causal_block, interpret=interpret,
    )
    return dq, dk, dv


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    causal_block: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over (B, H, L, D) tensors. Differentiable.

    ``causal_block``: frame-causal mask granularity (see module docstring);
    None = full bidirectional attention (the MMDiT case). Block sizes
    default to the measured per-shape heuristic (pick_blocks).
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    # None = auto, resolved per-rule: pick_blocks for the fwd grid,
    # pick_blocks_bwd for the bwd grid (they measure differently; see
    # pick_blocks_bwd). Explicit block args pin BOTH grids.
    return _flash_attention(
        q, k, v, sm_scale, block_q, block_k, causal_block, interpret,
    )


def flash_attention_with_lse(
    q, k, v, *,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    causal_block: Optional[int] = None,
    interpret: bool = False,
):
    """Forward-only variant returning (out, lse) for ring-attention merging."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    auto_bq, auto_bk = pick_blocks(q.shape[2], k.shape[2], q.shape[-1])
    return _flash_forward(
        q, k, v,
        sm_scale=sm_scale, block_q=block_q or auto_bq, block_k=block_k or auto_bk,
        causal_block=causal_block, interpret=interpret,
    )
