"""Attention entry point: RoPE + flash attention with backend dispatch.

Mirrors the role of reference opensora/models/mmdit/math.py:22-36
(``attention(q, k, v, pe)``) but TPU-native: RoPE is applied in plain JAX
(XLA fuses it into the surrounding matmuls) and the softmax-attention core is
the Pallas flash kernel on TPU, or a numerically-identical XLA reference
implementation elsewhere (CPU tests, fallback).

Layout convention: q, k, v are (B, L, H, D); output is (B, L, H*D) like the
reference's flash_attn_func epilogue.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from opensora_tpu.ops import rope as rope_ops
from opensora_tpu.ops.flash_attention import flash_attention


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    causal_block: Optional[int] = None,
) -> jnp.ndarray:
    """Reference O(L^2)-memory attention. q,k,v: (B, H, L, D) → (B, H, L, D)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if causal_block is not None:
        ql, kl = s.shape[-2], s.shape[-1]
        qf = jnp.arange(ql)[:, None] // causal_block
        kf = jnp.arange(kl)[None, :] // causal_block
        s = jnp.where(kf <= qf, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def scaled_dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    *,
    causal_block: Optional[int] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """(B, H, L, D) attention core with backend dispatch."""
    if backend is None:
        backend = "pallas" if _on_tpu() else "xla"
    if backend == "pallas":
        # tiny sequences (e.g. toy VAE latents) and odd head dims take the
        # XLA path; arbitrary lengths are fine for the kernel (tail blocks
        # are masked + zero-filled in-kernel)
        l_q, l_k, d = q.shape[2], k.shape[2], q.shape[-1]
        if min(l_q, l_k) < 128 or d % 128:
            return xla_attention(q, k, v, causal_block=causal_block)
        return flash_attention(q, k, v, causal_block=causal_block)
    if backend == "pallas_interpret":
        return flash_attention(q, k, v, causal_block=causal_block, interpret=True)
    if backend in ("int8", "int8_qk8"):
        # serving-only int8-MXU attention (ops/int8_flash.py): "int8" runs
        # both matmuls int8, "int8_qk8" keeps P.V in bf16 (tighter error,
        # and the faster of the two on v5e — the kernel is VPU-bound, so
        # quantizing P costs more vector ops than the int8 PV matmul saves)
        from opensora_tpu.ops.int8_flash import int8_flash_attention

        assert causal_block is None, "int8 attention is bidirectional-only"
        l_q, l_k, d = q.shape[2], k.shape[2], q.shape[-1]
        if min(l_q, l_k) < 128 or d % 128:
            return xla_attention(q, k, v, causal_block=causal_block)
        return int8_flash_attention(
            q, k, v, pv_int8=(backend == "int8"),
            interpret=not _on_tpu(),
        )
    if backend == "xla":
        return xla_attention(q, k, v, causal_block=causal_block)
    raise ValueError(f"unknown attention backend {backend!r}")


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    *,
    rope_convention: str = "split",
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """MMDiT attention: optional RoPE, flash core, heads re-merged.

    q, k, v: (B, L, H, D); pe: (cos, sin) each (B, L, D/2) or None.
    Returns (B, L, H*D).
    """
    if pe is not None:
        cos, sin = pe
        if rope_convention == "split":
            q = rope_ops.apply_rope_split(q, cos, sin)
            k = rope_ops.apply_rope_split(k, cos, sin)
        elif rope_convention == "interleaved":
            q = rope_ops.apply_rope_interleaved(q, cos, sin)
            k = rope_ops.apply_rope_interleaved(k, cos, sin)
        else:
            raise ValueError(f"unknown rope convention {rope_convention!r}")
    if backend == "ring_rdma":
        # inference-only SP: in-kernel RDMA KV rotation (ops/ring_flash.py);
        # training uses "ring" (custom-vjp backward)
        from opensora_tpu.ops.ring_flash import ring_flash_attention
        from opensora_tpu.parallel.context import get_mesh

        mesh = get_mesh()
        assert mesh is not None, "ring_rdma requires a mesh (parallel.context.set_mesh)"
        qh, kh, vh = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
        # interpret-mode remote DMA needs a single-axis mesh (CPU tests)
        out, _ = ring_flash_attention(
            qh, kh, vh, mesh, interpret=jax.default_backend() != "tpu"
        )
        b, h, l, d = out.shape
        return out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
    if backend in ("ulysses", "ring") or (
        isinstance(backend, str) and backend.startswith(("ulysses:", "ring:"))
    ):
        # sequence-parallel paths: tokens sharded over the 'sp' mesh axis
        from opensora_tpu.ops.sp import ring_attention, ulysses_attention
        from opensora_tpu.parallel.context import get_mesh

        mesh = get_mesh()
        assert mesh is not None, "SP attention requires a mesh (parallel.context.set_mesh)"
        name, _, inner = backend.partition(":")
        inner = inner or None
        fn = ulysses_attention if name == "ulysses" else ring_attention
        out = fn(q, k, v, mesh, backend=inner)
        b, l, h, d = out.shape
        return out.reshape(b, l, h * d)

    # (B, L, H, D) → (B, H, L, D) for the kernel
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)
    out = scaled_dot_product_attention(qh, kh, vh, backend=backend)
    b, h, l, d = out.shape
    return out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
