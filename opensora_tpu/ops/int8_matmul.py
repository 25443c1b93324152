"""Pallas fused W8A8 matmul: int8×int8 → VMEM int32 accumulator → bf16 out.

Motivation (NOTES_r1.md addendum 5/6): the XLA W8A8 path materializes the
int32 dot output in HBM before the rescale epilogue — 2× the bytes of the
bf16 result. At the 11B MLP shape that buffer is 3.7 GiB and pushes
768px/129f out of a 16 GiB chip. This kernel keeps the int32 accumulator in
VMEM scratch and writes only the rescaled bf16 tile:

    out[m, n] = (sum_k x8[m, k] * w8[k, n]) * s_a[m] * s_w[n]

Grid is (M/bm, N/bn, K/bk) with K innermost-sequential (same accumulator
pattern as ops/flash_attention.py). int8 garbage in padded tail tiles is
harmless (integer arithmetic cannot NaN) and out-of-range output rows are
clipped by Pallas on write-back; K must be block-aligned (hidden dims are
multiples of 512 in every supported config).

No reference equivalent (serving-side optimization; the reference serves
bf16 with TP + offload, README.md:281-288).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _w8a8_kernel(x_ref, w_ref, sa_ref, sw_ref, o_ref, acc_ref, *, n_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == n_k - 1)
    def _epilogue():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * sa_ref[...] * sw_ref[...]
        ).astype(o_ref.dtype)


def _w8a8_fq_kernel(x_ref, w_ref, inv_ref, sa_ref, sw_ref, o_ref, acc_ref, *, n_k):
    """Fused-quant variant: x arrives bf16 and is quantized IN VMEM against
    the per-row scale, so the int8 activation tensor never exists in HBM and
    the XLA quantize preamble (abs-max pass + cast pass + int8 write-back)
    disappears. The re-quantize per (mi, ki) tile repeats across the N/bn
    grid steps — bm*bk VPU ops against bm*bk*bn MXU MACs, ~1/bn relative
    cost, invisible next to the dot."""
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x8 = jnp.clip(
        jnp.round(x_ref[...].astype(jnp.float32) * inv_ref[...]), -127, 127
    ).astype(jnp.int8)
    acc_ref[...] += jax.lax.dot_general(
        x8, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ki == n_k - 1)
    def _epilogue():
        o_ref[...] = (
            acc_ref[...].astype(jnp.float32) * sa_ref[...] * sw_ref[...]
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret")
)
def w8a8_fusedquant_matmul(
    x: jnp.ndarray,       # (M, K) bf16/f32 activations (NOT quantized)
    w8: jnp.ndarray,      # (K, N) int8
    s_w: jnp.ndarray,     # (N,)  f32 per-column weight scales
    *,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dynamic W8A8 matmul with IN-KERNEL activation quantization.

    out[m, n] = (sum_k q(x[m, :])[k] * w8[k, n]) * s_a[m] * s_w[n],
    s_a[m] = max_k |x[m, k]| / 127,  q(x) = clip(round(x / s_a), +-127).

    Only the per-row abs-max reduction stays in XLA (one fused pass that
    XLA folds into the producing layer_norm/modulate chain); quantize, the
    int8 dot, and the rescale epilogue all live in the kernel, and the
    int32 accumulator never leaves VMEM (same memory envelope as
    w8a8_matmul). The reciprocal is precomputed once per row so the kernel
    pays one FMA per element instead of a divide."""
    M, K = x.shape
    K2, N = w8.shape
    assert K == K2 and s_w.shape == (N,)
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    assert K % block_k == 0, f"K={K} must be divisible by block_k={block_k}"
    xf_max = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s_a = jnp.maximum(xf_max / 127.0, 1e-8)
    inv = 1.0 / s_a
    grid = (pl.cdiv(M, block_m), pl.cdiv(N, block_n), K // block_k)
    return pl.pallas_call(
        functools.partial(_w8a8_fq_kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((block_m, 1), lambda mi, ni, ki: (mi, 0)),
            pl.BlockSpec((block_m, 1), lambda mi, ni, ki: (mi, 0)),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        interpret=interpret,
    )(x, w8, inv, s_a, s_w.reshape(1, N))


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret")
)
def w8a8_matmul(
    x8: jnp.ndarray,      # (M, K) int8
    w8: jnp.ndarray,      # (K, N) int8
    s_a: jnp.ndarray,     # (M, 1) f32 per-row activation scales
    s_w: jnp.ndarray,     # (N,)  f32 per-column weight scales
    *,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 1024,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x8.shape
    K2, N = w8.shape
    assert K == K2 and s_a.shape == (M, 1) and s_w.shape == (N,)
    block_m = min(block_m, M)
    block_n = min(block_n, N)
    block_k = min(block_k, K)
    assert K % block_k == 0, f"K={K} must be divisible by block_k={block_k}"
    grid = (pl.cdiv(M, block_m), pl.cdiv(N, block_n), K // block_k)
    sw2 = s_w.reshape(1, N)
    return pl.pallas_call(
        functools.partial(_w8a8_kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda mi, ni, ki: (mi, ki)),
            pl.BlockSpec((block_k, block_n), lambda mi, ni, ki: (ki, ni)),
            pl.BlockSpec((block_m, 1), lambda mi, ni, ki: (mi, 0)),
            pl.BlockSpec((1, block_n), lambda mi, ni, ki: (0, ni)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda mi, ni, ki: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        interpret=interpret,
    )(x8, w8, s_a, sw2)
