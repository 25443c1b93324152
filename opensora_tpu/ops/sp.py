"""Sequence parallelism: Ulysses all-to-all + ring attention over the mesh.

TPU-native replacement for the reference's two SP modes
(opensora/models/mmdit/distributed.py):

- **Ulysses / all_to_all** (:473-553): scatter heads, gather sequence before
  attention; inverse after. Implemented with jax.lax.all_to_all inside
  shard_map over the 'sp' mesh axis — the collective rides ICI.
- **ring attention** (:219-422): KV blocks rotate via lax.ppermute with
  LSE-rescaled accumulation of partial outputs — the `_rescale_out_lse`
  numerics (:305-373) expressed over the Pallas kernel's (out, lse) pairs.
  Double-buffered comm/compute overlap is XLA's job (ppermute is async-
  scheduled against the flash kernel of the next step).

Both operate on (B, L_local, H, D) shards inside shard_map; callers hold
global (B, L, H, D) arrays sharded P(data, sp, None, None).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from opensora_tpu.ops.flash_attention import (
    flash_attention_with_lse,
    partial_flash_backward,
)
from opensora_tpu.parallel.mesh import DATA_AXIS, SP_AXIS


def _attention_core(q, k, v, backend: Optional[str]):
    from opensora_tpu.ops.attention import scaled_dot_product_attention

    return scaled_dot_product_attention(q, k, v, backend=backend)


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """DeepSpeed-Ulysses attention. q,k,v: global (B, L, H, D) arrays
    logically sharded P(data, sp); heads must divide sp size."""
    sp = mesh.shape[SP_AXIS]
    H = q.shape[2]
    assert H % sp == 0, f"sp size {sp} must divide heads {H}"

    spec = P(DATA_AXIS, SP_AXIS, None, None)

    def local_fn(ql, kl, vl):
        # (B, L/sp, H, D) → (B, L, H/sp, D)
        a2a = functools.partial(
            jax.lax.all_to_all, axis_name=SP_AXIS, split_axis=2, concat_axis=1,
            tiled=True,
        )
        qh, kh, vh = a2a(ql), a2a(kl), a2a(vl)
        # kernel layout (B, H, L, D)
        out = _attention_core(
            qh.transpose(0, 2, 1, 3), kh.transpose(0, 2, 1, 3),
            vh.transpose(0, 2, 1, 3), backend,
        ).transpose(0, 2, 1, 3)
        # (B, L, H/sp, D) → (B, L/sp, H, D)
        return jax.lax.all_to_all(
            out, axis_name=SP_AXIS, split_axis=1, concat_axis=2, tiled=True
        )

    return shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def _merge_partials(o1, lse1, o2, lse2):
    """LSE-rescaled merge of two attention partials
    (reference _rescale_out_lse, distributed.py:305-373).
    o: (B, H, L, D) fp32; lse: (B, H, L)."""
    lse_max = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - lse_max)
    w2 = jnp.exp(lse2 - lse_max)
    denom = w1 + w2
    o = (o1 * (w1 / denom)[..., None] + o2 * (w2 / denom)[..., None])
    lse = lse_max + jnp.log(denom)
    return o, lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Ring attention: every rank keeps its Q shard; KV shards rotate around
    the 'sp' ring via ppermute, partials merge by LSE rescaling
    (reference RingAttention fwd, distributed.py:219-313).

    Differentiable: the backward pass mirrors the reference's bwd ring
    (distributed.py:316-373) — dk/dv accumulators travel WITH the rotating
    KV blocks and arrive home after a full circle, while dq accumulates
    locally from the stored global LSE. Both passes use the Pallas flash
    kernels on TPU (partial_flash_backward per ring step); einsum reference
    math on other backends."""
    sp = mesh.shape[SP_AXIS]
    spec = P(DATA_AXIS, SP_AXIS, None, None)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    scale_by = None  # default 1/sqrt(d)

    def _partial(qh, k_cur, v_cur):
        """One ring step's (out, lse) partial. (B, H, L, D) fp32 out."""
        if backend in (None, "pallas", "pallas_interpret"):
            o_i, lse_i = flash_attention_with_lse(
                qh, k_cur, v_cur, interpret=(backend == "pallas_interpret")
            )
            return o_i.astype(jnp.float32), lse_i
        scale = 1.0 / jnp.sqrt(jnp.float32(qh.shape[-1]))
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qh.astype(jnp.float32), k_cur.astype(jnp.float32)
        ) * scale
        lse_i = jax.scipy.special.logsumexp(s, axis=-1)
        o_i = jnp.einsum(
            "bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1),
            v_cur.astype(jnp.float32),
        )
        return o_i, lse_i

    def _fwd_scan(qh, kh, vh):
        # step 0 computes on the local shard outside the scan; each scan
        # step rotates FIRST then computes, so no rotation's result is ever
        # discarded (collectives inside scan are not dead-code-eliminated —
        # the old rotate-after-compute shape paid one wasted full-KV ICI
        # hop per call)
        o0, lse0 = _partial(qh, kh, vh)

        def step(carry, _):
            o_acc, lse_acc, k_cur, v_cur = carry
            k_cur = jax.lax.ppermute(k_cur, SP_AXIS, perm)
            v_cur = jax.lax.ppermute(v_cur, SP_AXIS, perm)
            o_i, lse_i = _partial(qh, k_cur, v_cur)
            o_new, lse_new = _merge_partials(o_acc, lse_acc, o_i, lse_i)
            return (o_new, lse_new, k_cur, v_cur), None

        (o, lse, _, _), _ = jax.lax.scan(
            step, (o0, lse0, kh, vh), None, length=sp - 1
        )
        return o, lse

    @jax.custom_vjp
    def _ring(qh, kh, vh):
        o, _ = _fwd_scan(qh, kh, vh)
        return o.astype(qh.dtype)

    def _ring_fwd(qh, kh, vh):
        o, lse = _fwd_scan(qh, kh, vh)
        return o.astype(qh.dtype), (qh, kh, vh, o, lse)

    def _bwd_partial(qh, k_cur, v_cur, do, lse, delta):
        """Per-ring-step gradient partials; Pallas kernels on TPU, einsum
        reference elsewhere."""
        if backend in (None, "pallas", "pallas_interpret"):
            dq_i, dk_i, dv_i = partial_flash_backward(
                qh, k_cur, v_cur, do.astype(qh.dtype), lse, delta,
                interpret=(backend == "pallas_interpret"),
            )
            return (
                dq_i.astype(jnp.float32),
                dk_i.astype(jnp.float32),
                dv_i.astype(jnp.float32),
            )
        scale = 1.0 / jnp.sqrt(jnp.float32(qh.shape[-1]))
        qf = qh.astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_cur.astype(jnp.float32)) * scale
        p = jnp.exp(s - lse[..., None])
        dv_i = jnp.einsum("bhqk,bhqd->bhkd", p, do)
        dp = jnp.einsum("bhqd,bhkd->bhqk", do, v_cur.astype(jnp.float32))
        ds = p * (dp - delta[..., None]) * scale
        dq_i = jnp.einsum("bhqk,bhkd->bhqd", ds, k_cur.astype(jnp.float32))
        dk_i = jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
        return dq_i, dk_i, dv_i

    def _ring_bwd(res, g):
        qh, kh, vh, o, lse = res
        do = g.astype(jnp.float32)
        delta = jnp.sum(do * o, axis=-1)  # (B, H, Lq)

        # step 0 on the local shard, outside the scan (mirrors _fwd_scan:
        # no kv rotation whose result would be discarded). dk/dv
        # accumulators still rotate sp times total — a step-i contribution
        # is computed on kv that is i hops from home and needs sp-i more
        # hops, so rotate-after-add every step (incl. step 0) brings every
        # contribution exactly full circle.
        dq0, dk0, dv0 = _bwd_partial(qh, kh, vh, do, lse, delta)

        def step(carry, _):
            dq_acc, k_cur, v_cur, dk_acc, dv_acc = carry
            k_cur = jax.lax.ppermute(k_cur, SP_AXIS, perm)
            v_cur = jax.lax.ppermute(v_cur, SP_AXIS, perm)
            dq_i, dk_i, dv_i = _bwd_partial(qh, k_cur, v_cur, do, lse, delta)
            dq_acc = dq_acc + dq_i
            dk_acc = jax.lax.ppermute(dk_acc + dk_i, SP_AXIS, perm)
            dv_acc = jax.lax.ppermute(dv_acc + dv_i, SP_AXIS, perm)
            return (dq_acc, k_cur, v_cur, dk_acc, dv_acc), None

        (dq, _, _, dk, dv), _ = jax.lax.scan(
            step,
            (
                dq0,
                kh,
                vh,
                jax.lax.ppermute(dk0, SP_AXIS, perm),
                jax.lax.ppermute(dv0, SP_AXIS, perm),
            ),
            None,
            length=sp - 1,
        )
        return dq.astype(qh.dtype), dk.astype(kh.dtype), dv.astype(vh.dtype)

    _ring.defvjp(_ring_fwd, _ring_bwd)

    def local_fn(ql, kl, vl):
        o = _ring(
            ql.transpose(0, 2, 1, 3),
            kl.transpose(0, 2, 1, 3),
            vl.transpose(0, 2, 1, 3),
        )
        return o.transpose(0, 2, 1, 3)

    return shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
