"""Int8 quantization for serving: weight-only ("w8") and dynamic W8A8.

Production-serving feature with no reference equivalent (the reference's
single-GPU story is TP + CPU offload, README.md:281-288).

- "w8" (weight-only): per-output-channel absmax int8 kernels halve weight
  memory vs bf16, letting the full 11B MMDiT (22 GB bf16) fit a single
  16 GB v5e chip. Dequantization is a convert fused into the matmul by XLA
  (y = (x @ W_q) · scale), so the MXU still runs bf16.
- "w8a8": additionally quantizes activations per token (dynamic absmax) and
  runs the matmul on the int8 MXU path (2× the bf16 MACs on v5e — measured
  375 vs 189 TFLOP/s-equiv at the 11B MLP shape, NOTES_r1.md). The int32
  accumulator is rescaled by (act_scale · weight_scale) in the epilogue.
  Opt-in (``quantized="w8a8"``): per-token absmax activation quantization
  is the standard dynamic-quant scheme but costs ~1e-2 relative error per
  matmul vs the weight-only path's exactness in activations.
"""

from __future__ import annotations

from typing import Any, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class QuantDense(nn.Module):
    """Drop-in Dense over int8 weights + per-output-channel fp32 scales.

    ``col_slice=(a, b)`` applies only columns [a, b) of the kernel (and the
    matching scale/bias slice) — valid because quantization is
    per-output-channel. Used by the sequence-chunked MMDiT blocks to compute
    the qkv and MLP column groups of a fused projection in separate passes
    (models/mmdit/layers.py) so the full-width output never materializes.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    mode: str = "w8"  # "w8" | "w8a8"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, col_slice: Optional[tuple] = None
    ) -> jnp.ndarray:
        in_f = x.shape[-1]
        q = self.param(
            "kernel_q", nn.initializers.zeros, (in_f, self.features), jnp.int8
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        features = self.features
        if col_slice is not None:
            a, b = col_slice
            q = jax.lax.slice_in_dim(q, a, b, axis=1)
            scale = jax.lax.slice_in_dim(scale, a, b, axis=0)
            features = b - a
        n_rows = x.size // in_f
        if self.mode == "w8a8" or (
            # the Pallas paths exist to keep the int32 accumulator out of
            # HBM (and, for _fq, the int8 activations too); for few-row
            # matmuls (modulation/vec embeds) those buffers are tiny and
            # the XLA path is both faster and shape-flexible
            self.mode in ("w8a8_pallas", "w8a8_fq")
            and (n_rows < 1024 or in_f % 512)
        ):
            xf = x.astype(jnp.float32)
            s_a = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            s_a = jnp.maximum(s_a, 1e-8)
            x8 = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x8, q,
                dimension_numbers=(((x8.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (acc.astype(jnp.float32) * s_a * scale).astype(self.dtype)
        elif self.mode == "w8a8_fq":
            # fused-quant Pallas kernel (ops/int8_matmul.py): activations
            # arrive bf16 and quantize IN VMEM — no XLA quantize preamble
            # (abs-max + cast + int8 write-back round-trips through HBM)
            # and no int8 activation tensor in HBM; only the per-row
            # abs-max reduction stays outside, fused by XLA into the
            # producing norm/modulate chain
            from opensora_tpu.ops.int8_matmul import w8a8_fusedquant_matmul

            lead = x.shape[:-1]
            y = w8a8_fusedquant_matmul(
                x.reshape(-1, in_f).astype(self.dtype), q, scale,
                block_m=512, block_n=1024,
                block_k=512 if in_f % 1024 else 1024,
                out_dtype=self.dtype,
                interpret=jax.default_backend() != "tpu",
            ).reshape(*lead, features)
        elif self.mode == "w8a8_pallas":
            # fused Pallas kernel (ops/int8_matmul.py): the int32 accumulator
            # stays in VMEM, only the rescaled bf16 tile hits HBM. ~16% lower
            # TOPS than the XLA int8 path (297 vs 354 measured) but removes
            # the int32 HBM buffer — use when memory is the binding
            # constraint (long-sequence 768px serving, NOTES_r1.md add. 6).
            from opensora_tpu.ops.int8_matmul import w8a8_matmul

            xf = x.astype(jnp.float32)
            s_a = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
            s_a = jnp.maximum(s_a, 1e-8)
            x8 = jnp.clip(jnp.round(xf / s_a), -127, 127).astype(jnp.int8)
            lead = x8.shape[:-1]
            y = w8a8_matmul(
                x8.reshape(-1, in_f), q,
                s_a.reshape(-1, 1), scale,
                block_m=512, block_n=1024,
                block_k=512 if in_f % 1024 else 1024,
                out_dtype=self.dtype,
                interpret=jax.default_backend() != "tpu",
            ).reshape(*lead, features)
        else:
            x = x.astype(self.dtype)
            # keep the dequant scale multiply in fp32 — rounding the
            # per-channel scale to bf16 would add ~0.4% extra relative error
            # on top of int8 quantization; XLA fuses this fp32 epilogue
            y = (
                jnp.dot(x, q.astype(self.dtype)).astype(jnp.float32) * scale
            ).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if col_slice is not None:
                b = jax.lax.slice_in_dim(b, col_slice[0], col_slice[1], axis=0)
            y = y + b.astype(self.dtype)
        return y


class SliceableDense(nn.Module):
    """nn.Dense twin (identical param names/shapes/init) whose call can apply
    only a column range of the kernel: ``col_slice=(a, b)`` computes
    ``x @ W[:, a:b] (+ bias[a:b])``. Lets the sequence-chunked MMDiT blocks
    share one code path between the bf16 and int8 weight formats."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, col_slice: Optional[tuple] = None
    ) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (x.shape[-1], self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias else None
        )
        if col_slice is not None:
            a, b = col_slice
            kernel = jax.lax.slice_in_dim(kernel, a, b, axis=1)
            if bias is not None:
                bias = jax.lax.slice_in_dim(bias, a, b, axis=0)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jnp.dot(x, kernel)
        if bias is not None:
            y = y + bias
        return y


def dense(quantized: Union[bool, str], features: int, **kw):
    """SliceableDense (≡ nn.Dense) or QuantDense, keyword-compatible.
    ``quantized`` may be a bool (True → weight-only "w8") or a mode string
    ("w8" / "w8a8" / "w8a8_pallas")."""
    if quantized:
        mode = quantized if isinstance(quantized, str) else "w8"
        return QuantDense(features, mode=mode, **kw)
    return SliceableDense(features, **kw)


def quantize_kernel(kernel: np.ndarray):
    """(..., in, out) float kernel → (int8 kernel, (out,) fp32 scale)."""
    k = np.asarray(kernel, np.float32)
    absmax = np.max(np.abs(k), axis=tuple(range(k.ndim - 1)))  # per out-channel
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_params(params: Any, subtrees=("double_blocks", "single_blocks")) -> Any:
    """Convert Dense kernels under the given subtrees into QuantDense params
    (kernel → kernel_q + kernel_scale). Biases and norms stay fp."""

    def walk(node, inside):
        if not isinstance(node, dict):
            return node
        if inside and "kernel" in node and getattr(node["kernel"], "ndim", 0) >= 2:
            out = {k: v for k, v in node.items() if k != "kernel"}
            kern = np.asarray(node["kernel"])
            if kern.ndim == 2:
                q, s = quantize_kernel(kern)
            else:
                # stacked scan kernels: quantize per layer
                qs, ss = zip(*(quantize_kernel(kern[i]) for i in range(kern.shape[0])))
                q, s = np.stack(qs), np.stack(ss)
            out["kernel_q"] = jnp.asarray(q)
            out["kernel_scale"] = jnp.asarray(s)
            return out
        return {
            k: walk(v, inside or k in subtrees) for k, v in node.items()
        }

    return walk(params, False)
