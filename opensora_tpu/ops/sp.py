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

from opensora_tpu.ops.flash_attention import flash_attention, flash_attention_with_lse
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
    assert H % sp == 0, f"heads {H} must divide sp size {sp}"

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
    the 'sp' ring via ppermute, partials merge by LSE rescaling. Forward
    only (inference); training uses Ulysses until the Pallas ring-bwd lands."""
    sp = mesh.shape[SP_AXIS]
    spec = P(DATA_AXIS, SP_AXIS, None, None)

    def local_fn(ql, kl, vl):
        qh = ql.transpose(0, 2, 1, 3)  # (B, H, Lq_local, D)
        kh = kl.transpose(0, 2, 1, 3)
        vh = vl.transpose(0, 2, 1, 3)
        perm = [(i, (i + 1) % sp) for i in range(sp)]

        def step(carry, _):
            o_acc, lse_acc, k_cur, v_cur, first = carry
            if backend in (None, "pallas", "pallas_interpret"):
                o_i, lse_i = flash_attention_with_lse(
                    qh, k_cur, v_cur,
                    interpret=(backend == "pallas_interpret"),
                )
                o_i = o_i.astype(jnp.float32)
            else:
                # xla reference path: compute lse explicitly
                scale = 1.0 / jnp.sqrt(jnp.float32(qh.shape[-1]))
                s = jnp.einsum(
                    "bhqd,bhkd->bhqk",
                    qh.astype(jnp.float32), k_cur.astype(jnp.float32),
                ) * scale
                lse_i = jax.scipy.special.logsumexp(s, axis=-1)
                o_i = jnp.einsum(
                    "bhqk,bhkd->bhqd",
                    jax.nn.softmax(s, axis=-1), v_cur.astype(jnp.float32),
                )
            o_new, lse_new = jax.lax.cond(
                first,
                lambda: (o_i, lse_i),
                lambda: _merge_partials(o_acc, lse_acc, o_i, lse_i),
            )
            k_nxt = jax.lax.ppermute(k_cur, SP_AXIS, perm)
            v_nxt = jax.lax.ppermute(v_cur, SP_AXIS, perm)
            return (o_new, lse_new, k_nxt, v_nxt, jnp.zeros_like(first)), None

        o0 = jnp.zeros(qh.shape, jnp.float32)
        lse0 = jnp.full(qh.shape[:3], -jnp.inf, jnp.float32)
        (o, lse, _, _, _), _ = jax.lax.scan(
            step, (o0, lse0, kh, vh, jnp.asarray(True)), None, length=sp
        )
        return o.astype(ql.dtype).transpose(0, 2, 1, 3)

    return shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
