"""Pallas TPU int8 flash attention (forward-only, serving path).

Attention is ~55% of the W8A8 11B serving step (scripts/microbench.py
w8a8b: 1.86 s of 3.38 s at the 129f/256px shape) and the bf16 flash kernel
runs at ~50% of bf16 MXU peak — the MXU int8 mode (2x MAC rate on v5e) is
the remaining headroom. This kernel runs BOTH attention matmuls on the
int8 MXU, SageAttention-style (Zhang et al., arXiv:2410.02367 — technique
reference only):

- **K smoothing**: per-(B, H) mean of K is subtracted before quantization.
  q . k_mean^T is constant along each query row, and softmax is invariant
  to per-row constants, so dropping it is EXACT — and it removes the
  outlier channel mass that otherwise dominates int8 K scales.
- **QK^T in int8**: Q gets per-token scales; K gets ONE scale per
  block_k tile (SageAttention's per-block K). A per-tile K scale is
  constant across a score tile's columns, so the whole dequant collapses
  into one per-row vector ``sq_i * sk_tile * sm_scale * log2(e)`` — ONE
  VPU multiply per logit instead of two, and the softmax runs directly
  in the exp2 domain (same m/l-in-log2 bookkeeping as the bf16 kernel in
  ops/flash_attention.py). Mean-centered N(0,1)-like K rows have nearly
  equal norms, so the per-tile coarsening costs little accuracy
  (bounds re-measured in tests/test_int8_flash.py).
- **P.V in int8**: the probability tile is quantized per-row against its
  own max (p_scale = rowmax(p) <= 1, so the int8 grid always spans the
  tile's dynamic range — blocks far from the running max are not crushed
  to zero), V per-channel (sv). The int32 PV product dequantizes as
  pv32 * p_scale_i * sv_d / 127 into the f32 accumulator.
- The softmax denominator uses the EXACT f32 p-sum (not the quantized p),
  so normalization error does not compound with L.

Forward-only by design: serving uses no attention gradient, and training
keeps the bf16 kernel (grad through int8 rounding is meaningless).
Quality bounds: tests/test_int8_flash.py (vs f32 attention, random +
adversarial outlier-key distributions); end-to-end denoise-trajectory
bound in tests/test_quant.py drives the promotion decision.

No reference-repo equivalent (the reference serves bf16 attention).
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

from opensora_tpu.ops.flash_attention import (
    ANCHOR_MAX_LOG2,
    LOG2E,
    NEG_INF,
    _mask_scores,
    _zero_tail_rows,
    pick_blocks,
)


def _int8_fwd_kernel(
    q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, sm_scale, block_q, block_k, q_len, kv_len, pv_int8,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q8 = q_ref[0, 0]          # (bq, d) int8
    k8 = k_ref[0, 0]          # (bk, d) int8
    v8 = v_ref[0, 0]          # (bk, d) int8 (bf16 in qk8 mode)
    sq = sq_ref[0, 0]         # (bq, 1) f32 — pre-multiplied by sm_scale*log2e
    # ONE scale for this whole K tile. The ref carries ALL nk tile scales
    # (full-array block: Mosaic only lowers blocks whose trailing dims are
    # (8, 128)-divisible OR span the array — a (1,1,1,1) block over the
    # (B, H, nk, 1) scale tensor fails that check on real hardware; caught
    # on first non-interpret compile, round 4) and the kernel picks its
    # tile's scale with a dynamic sublane index.
    sk = sk_ref[0, 0, ki, 0]  # () f32
    sv = sv_ref[0, 0]         # (1, d)  f32
    if not pv_int8 and kv_len % block_k != 0:
        # bf16 tail garbage can be NaN (0 * NaN poisons the PV matmul);
        # int8 garbage cannot, so only the qk8 mode needs the zeroing
        v8 = _zero_tail_rows(v8, ki, block_k, kv_len)

    s32 = lax.dot_general(
        q8, k8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    # Per-tile K scale: the full dequant (sq_i * sk_tile * sm_scale * log2e)
    # collapses to one per-ROW vector, so dequantizing costs exactly one
    # VPU multiply per logit and lands directly in the exp2 domain. (int8
    # garbage in kv tail blocks cannot NaN — integer arithmetic — and is
    # replaced, not propagated, by the select in _mask_scores.)
    scale_row = sq * sk                          # (bq, 1)
    s = s32.astype(jnp.float32) * scale_row      # log2-domain logits
    s = _mask_scores(s, qi, ki, block_q, block_k, q_len, kv_len, None)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    m_safe = jnp.where(m_new <= NEG_INF * 0.5, 0.0, m_new)
    p = jnp.exp2(s - m_safe)                     # (bq, bk) in [0, 1]
    correction = jnp.exp2(m_prev - m_safe)
    # exact f32 denominator (quantized p only touches the numerator)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)

    if pv_int8:
        # per-row-per-tile P quantization: the grid spans this tile's range
        p_scale = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-8)
        p8 = jnp.round(p * (127.0 / p_scale)).astype(jnp.int8)
        pv32 = lax.dot_general(
            p8, v8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        pv = pv32.astype(jnp.float32) * (p_scale * (1.0 / 127.0)) * sv
    else:
        # "qk8" mode: bf16 P.V — P quantization dominates the error budget
        # (decomposition in tests/test_int8_flash.py docstring) and the VPU
        # cost of quantizing P can eat the int8 PV gain; this trades half
        # the MXU speedup back for accuracy.
        pv = lax.dot_general(
            p.astype(v8.dtype), v8, (((1,), (0,)), ((), ())),
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


def _int8_fwd_kernel_anchored(
    a2_ref, q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref, o_ref,
    l_scr, acc_scr,
    *, sm_scale, block_q, block_k, q_len, kv_len, pv_int8,
):
    """Fixed-anchor int8 forward: the running-max bookkeeping of
    _int8_fwd_kernel (per-tile max, m scratch, two rescaling multiplies)
    is replaced by one precomputed per-(B,H) anchor, exactly as in the
    bf16 _fwd_kernel_anchored (ops/flash_attention.py, round 4; 1.29x
    there). The anchor is the Cauchy-Schwarz bound on the CENTERED-K
    logits; int8 quantization noise can push a dequantized logit a hair
    past the bound, which is harmless — softmax is anchor-invariant, and
    correctness only needs (s - A) inside fp32 exponent range, with 2A <
    80 log2 units of slack. Dispatched only when max(A) < ANCHOR_MAX_LOG2
    (always true for QK-RMSNormed MMDiT streams).

    qk8 mode (pv_int8=False) sheds ALL per-logit work beyond
    dequant-FMA + exp2 + sum + cast; pv_int8 mode still pays the per-tile
    row-max for P's quantization grid (the anchor bound can be loose by
    several log2 units, so a fixed p-scale of 1.0 would crush whole tiles
    to zero — the grid must span the TILE's range, same ruling as the
    running-max kernel) but sheds the m scratch and both corrections.
    """
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q8 = q_ref[0, 0]
    k8 = k_ref[0, 0]
    v8 = v_ref[0, 0]
    sq = sq_ref[0, 0]
    sk = sk_ref[0, 0, ki, 0]
    sv = sv_ref[0, 0]
    a2 = a2_ref[0, 0, 0, 0]
    if not pv_int8 and kv_len % block_k != 0:
        # bf16 V tail garbage can be NaN and 0 * NaN = NaN in the PV
        # contraction; int8 pad columns of p are exactly 0 against int8 V.
        v8 = _zero_tail_rows(v8, ki, block_k, kv_len)

    s32 = lax.dot_general(
        q8, k8, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    p = jnp.exp2(s32.astype(jnp.float32) * (sq * sk) - a2)
    if kv_len % block_k != 0:
        col = ki * block_k + lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(col < kv_len, p, 0.0)
    l_scr[...] += jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
    )

    if pv_int8:
        p_scale = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-8)
        p8 = jnp.round(p * (127.0 / p_scale)).astype(jnp.int8)
        pv32 = lax.dot_general(
            p8, v8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        pv = pv32.astype(jnp.float32) * (p_scale * (1.0 / 127.0)) * sv
    else:
        pv = lax.dot_general(
            p.astype(v8.dtype), v8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc_scr[...] += pv

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l <= 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def _quantize_rows(x, axis=-1):
    """(x8, scale): per-row symmetric int8 with f32 scales."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=axis, keepdims=True), 1e-8) / 127.0
    x8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x8, scale


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_q", "block_k", "pv_int8", "interpret")
)
def int8_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    pv_int8: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Int8-MXU attention over (B, H, L, D); returns (B, H, Lq, D) in q.dtype.

    ``pv_int8=False`` is the "qk8" mode: only QK^T runs int8, P.V stays
    bf16 (half the MXU saving, noticeably tighter error). Bidirectional
    only (the MMDiT serving case); for frame-causal VAE attention use the
    bf16 kernel. The quantization preamble (K/V smoothing + per-token/
    channel scales) runs in XLA and is bandwidth-trivial next to the
    O(L^2) kernel.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    auto_bq, auto_bk = pick_blocks(q.shape[2], k.shape[2], q.shape[-1])
    block_q = block_q or auto_bq
    block_k = block_k or auto_bk

    batch, heads, q_len, dim = q.shape
    kv_len = k.shape[2]
    block_q = min(block_q, q_len)
    block_k = min(block_k, kv_len)

    # K smoothing: softmax-invariant (per-query-row constant) — exact.
    # V smoothing: out = softmax(s) @ (v - v_mean) + v_mean, exact because
    # softmax rows sum to one; shrinks the per-channel V scales.
    k_mean = jnp.mean(k.astype(jnp.float32), axis=2, keepdims=True)
    q8, sq = _quantize_rows(q)
    # fold sm_scale and the exp2-domain conversion into the Q scales once
    sq = sq * (sm_scale * LOG2E)
    # K: ONE scale per block_k tile (see module docstring). Zero-pad to a
    # whole number of tiles — zeros never raise the tile max.
    nk = pl.cdiv(kv_len, block_k)
    kf = k.astype(jnp.float32) - k_mean
    kp = jnp.pad(kf, ((0, 0), (0, 0), (0, nk * block_k - kv_len), (0, 0)))
    tiles = kp.reshape(batch, heads, nk, block_k * dim)
    sk_tile = jnp.maximum(
        jnp.max(jnp.abs(tiles), axis=-1, keepdims=True), 1e-8
    ) / 127.0                                    # (B, H, nk, 1)
    k8 = (
        jnp.clip(jnp.round(tiles / sk_tile), -127, 127)
        .astype(jnp.int8)
        .reshape(batch, heads, nk * block_k, dim)[:, :, :kv_len]
    )
    if pv_int8:
        v_mean = jnp.mean(v.astype(jnp.float32), axis=2, keepdims=True)
        v_in, sv = _quantize_rows(v.astype(jnp.float32) - v_mean, axis=2)
    else:
        v_mean = None
        v_in = v.astype(q.dtype)
        sv = jnp.ones((batch, heads, 1, dim), jnp.float32)

    grid = (batch, heads, pl.cdiv(q_len, block_q), pl.cdiv(kv_len, block_k))
    in_specs = [
        pl.BlockSpec((1, 1, block_q, dim), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, dim), lambda b, h, qi, ki: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, block_k, dim), lambda b, h, qi, ki: (b, h, ki, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, nk, 1), lambda b, h, qi, ki: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, 1, dim), lambda b, h, qi, ki: (b, h, 0, 0)),
    ]
    out_spec = pl.BlockSpec(
        (1, 1, block_q, dim), lambda b, h, qi, ki: (b, h, qi, 0)
    )
    common = dict(
        sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        q_len=q_len, kv_len=kv_len, pv_int8=pv_int8,
    )
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
    )

    def _run_standard(ops):
        return pl.pallas_call(
            functools.partial(_int8_fwd_kernel, **common),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, dim), jnp.float32),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(*ops[1:])

    def _run_anchored(ops):
        return pl.pallas_call(
            functools.partial(_int8_fwd_kernel_anchored, **common),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1), lambda b, h, qi, ki: (b, h, 0, 0)),
                *in_specs,
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, dim), jnp.float32),
            ],
            compiler_params=compiler_params,
            interpret=interpret,
        )(*ops)

    # Fixed-anchor dispatch (see _int8_fwd_kernel_anchored): the bound is
    # on the CENTERED-K logits the kernel actually computes. NaN-safe —
    # NaN < bound is False, so poisoned inputs take the running-max path.
    qn = jnp.max(
        jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)), axis=-1
    )
    kn = jnp.max(jnp.sqrt(jnp.sum(jnp.square(kf), axis=-1)), axis=-1)
    a2 = (sm_scale * LOG2E) * qn * kn
    out = lax.cond(
        jnp.max(a2) < ANCHOR_MAX_LOG2,
        _run_anchored,
        _run_standard,
        (a2.reshape(batch, heads, 1, 1), q8, k8, v_in, sq, sk_tile, sv),
    )
    if v_mean is not None:
        out = (out.astype(jnp.float32) + v_mean).astype(q.dtype)
    return out
