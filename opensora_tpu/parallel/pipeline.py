"""Pipeline parallelism: GPipe-style SPMD microbatch pipeline on a mesh axis.

Behavioral reference: the reference slices the MMDiT block list over pipeline
stages via ColossalAI's HybridParallelPlugin stage manager
(models/mmdit/distributed.py:638-669 stage-index slicing,
:853-883 get_held_layers; scripts/diffusion/train.py:442-458
booster.execute_pipeline). On TPU the same schedule is expressed as data
movement inside one SPMD program: every device holds ONE stage's parameters
(the stacked-stage pytree is sharded over the mesh's ``pp`` axis), and a
`lax.scan` over clock ticks moves activations from stage s to s+1 with
`lax.ppermute`. Autodiff through ppermute+scan yields the reverse-order
backward pipeline automatically, so the same primitive serves training
(GPipe schedule: all microbatch activations are held, as in the reference's
non-interleaved pipeline).

Design notes (TPU-first):
- No sends/recvs or stage processes: one jitted program; XLA overlaps the
  ppermute with the stage compute where the dependency allows.
- The pipeline loop body is shape-static: every device runs ``stage_fn``
  every tick (bubble ticks compute on garbage and are masked by index
  arithmetic). Ticks = n_micro + n_stages - 1 — the standard GPipe bubble.
- Parameters never move; only the (much smaller) activations ride ICI.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def split_scan_params(params: Any, n_stages: int) -> Any:
    """Reshape an ``nn.scan``-stacked layer pytree (leading axis L) into a
    stage-major pytree (leading axis ``n_stages``, then L // n_stages).

    Use on the MMDiT scanned block params before sharding the stage axis
    over the mesh's ``pp`` axis. L must divide evenly; pad/split the block
    stack into pipeline-friendly depths at config time (the reference makes
    the same even-slicing assumption in its stage manager).
    """

    def _split(x):
        l = x.shape[0]
        assert l % n_stages == 0, f"layers {l} not divisible by stages {n_stages}"
        return x.reshape(n_stages, l // n_stages, *x.shape[1:])

    return jax.tree.map(_split, params)


def merge_scan_params(params: Any) -> Any:
    """Inverse of :func:`split_scan_params`."""
    return jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), params)


def pipeline_spec(params: Any, axis: str = "pp") -> Any:
    """PartitionSpecs sharding the leading (stage) axis over ``axis``."""
    return jax.tree.map(lambda x: P(axis, *([None] * (x.ndim - 1))), params)


def pipeline_apply(
    stage_fn: Callable[..., Any],
    stage_params: Any,
    x_mb: Any,
    *,
    mesh: Mesh,
    axis: str = "pp",
    batch_spec: P = P(),
    auto_axes: tuple = (),
) -> Any:
    """Run ``x_mb`` (a pytree of (n_micro, ...) arrays) through all stages.

    ``stage_params``: pytree with leading stage axis S == mesh.shape[axis],
    sharded (or shardable) over ``axis``. ``stage_fn(params_s, x)`` maps one
    microbatch through one stage's layers (e.g. an inner ``lax.scan`` over
    that stage's blocks); the output pytree must match ``x``'s structure and
    shapes (constant activation shape across stages). Per-sample state the
    stages need but don't update (RoPE tables, the conditioning vector)
    belongs IN ``x_mb``, returned unchanged — broadcasting it replicated
    would leak the full batch dim into each microbatch (training/pp.py).
    ``batch_spec`` shards every activation leaf — e.g. ``P(None, 'data')``
    keeps data parallelism over the microbatch's batch dim on a (data, pp)
    mesh. Returns the (n_micro, ...) output pytree, replicated over
    ``axis``.

    ``auto_axes``: mesh axes left to GSPMD instead of shard_map's manual
    mode — the PP×TP composition (the reference's HybridParallelPlugin
    composes tp inside each pipeline stage, utils/train.py:100-128). Pass
    ``("tp",)`` with stage params tp-sharded on their feature axes: inside
    the body, GSPMD partitions each stage's matmuls over 'tp' and inserts
    the row-parallel psums, exactly as in the non-PP path. in_specs/
    out_specs may only mention manual axes; auto-axis shardings flow
    through from the argument shardings.

    Differentiable: ``jax.grad`` of a loss of the output produces the
    reverse (backward) pipeline over the same mesh axis.
    """
    n_stages = mesh.shape[axis]
    n_micro = jax.tree.leaves(x_mb)[0].shape[0]
    n_ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def _pipelined(params_local, x_local):
        # shard_map gives a leading local stage axis of size 1 — drop it.
        params_local = jax.tree.map(lambda p: p[0], params_local)
        sid = lax.axis_index(axis)

        def tick(carry, t):
            recv, outs = carry
            # stage 0 injects microbatch t (while t < n_micro); others use
            # the activation received from the previous stage.
            mb_idx = jnp.minimum(t, n_micro - 1)
            inject = jax.tree.map(lambda a: a[mb_idx], x_local)
            act_in = jax.tree.map(
                lambda i, r: jnp.where(sid == 0, i, r), inject, recv
            )
            act_out = stage_fn(params_local, act_in)
            # last stage commits microbatch (t - (S-1)) when it's valid.
            out_idx = t - (n_stages - 1)
            valid = (out_idx >= 0) & (out_idx < n_micro)
            idx = jnp.maximum(out_idx, 0)
            outs = lax.cond(
                valid,
                lambda o: jax.tree.map(
                    lambda oo, a: lax.dynamic_update_index_in_dim(
                        oo, a.astype(oo.dtype), idx, 0
                    ),
                    o, act_out,
                ),
                lambda o: o,
                outs,
            )
            recv = jax.tree.map(lambda a: lax.ppermute(a, axis, perm), act_out)
            return (recv, outs), None

        outs0 = jax.tree.map(jnp.zeros_like, x_local)
        recv0 = jax.tree.map(lambda a: jnp.zeros_like(a[0]), x_local)
        (_, outs), _ = lax.scan(tick, (recv0, outs0), jnp.arange(n_ticks))
        # outs is populated only on the last stage; broadcast it to all
        # stages so the result is replicated over the pp axis.
        outs = jax.tree.map(
            lambda o: lax.psum(
                jnp.where(sid == n_stages - 1, o, jnp.zeros_like(o)), axis
            ),
            outs,
        )
        return outs

    kwargs = {}
    if auto_axes:
        # manual over every mesh axis EXCEPT auto_axes (axis_names=empty
        # set means manual over ALL axes — the legacy default)
        kwargs["axis_names"] = frozenset(mesh.axis_names) - set(auto_axes)
    return shard_map(
        _pipelined,
        mesh=mesh,
        in_specs=(
            pipeline_spec(stage_params, axis),
            jax.tree.map(lambda _: batch_spec, x_mb),
        ),
        out_specs=jax.tree.map(lambda _: batch_spec, x_mb),
        check_vma=False,
        **kwargs,
    )(stage_params, x_mb)


def create_pipeline_mesh(pp_size: int, data_size: int = 1, axis: str = "pp") -> Mesh:
    """A (data, pp) mesh for pipeline runs. The main 3-axis mesh
    (parallel/mesh.py) covers DP/SP/TP; PP is opt-in via this helper since
    GSPMD sharding normally obviates it on TPU (SURVEY §2.6 row PP)."""
    import numpy as np

    devices = jax.devices()[: data_size * pp_size]
    assert len(devices) == data_size * pp_size, "not enough devices"
    return Mesh(
        np.asarray(devices).reshape(data_size, pp_size), ("data", axis)
    )


def shard_pipeline_params(stage_params: Any, mesh: Mesh, axis: str = "pp") -> Any:
    """device_put the stacked-stage pytree with its stage axis over ``axis``."""
    return jax.device_put(
        stage_params,
        jax.tree.map(
            lambda s: NamedSharding(mesh, s), pipeline_spec(stage_params, axis)
        ),
    )
