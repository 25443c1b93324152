"""Pipeline-parallel MMDiT training forward (opt-in).

Behavioral reference: the reference's pipeline plugin slices the MMDiT block
list over stages — embedders live on the first stage, blocks are distributed,
the final layer on the last (opensora/models/mmdit/distributed.py:638-669
stage slicing, :853-883 get_held_layers) — and the booster drives a GPipe
schedule (scripts/diffusion/train.py:442-458).

TPU mapping: GSPMD over a (data, sp, tp) mesh already covers the reference's
parallelism envelope, so PP stays OPT-IN. When enabled, the same GPipe
schedule runs as ONE SPMD program over a ``pp`` mesh axis:

- the nn.scan-stacked double/single block params (leading layer axis) are
  reshaped stage-major (split_scan_params) and sharded over ``pp`` — each
  device holds only its stage's blocks (the PP memory win);
- microbatches ride the pipeline via lax.ppermute ticks
  (parallel/pipeline.py::pipeline_apply), double-stream stack first, then
  the single-stream stack (two pipelines, one bubble each);
- the cheap parts — embedders, RoPE tables, final layer — run replicated on
  every device, like the reference keeps them on boundary stages;
- autodiff through the pipeline yields the reverse-order backward schedule,
  so the SAME train step (training/diffusion.py) works unchanged: pass
  ``make_pp_forward(...)`` as its ``forward_fn``.

Constraint: depth and depth_single_blocks must divide by the pp size
(19 doubles of the 11B config → pp sizes that divide 19; the reference's
stage manager makes the same even-slicing assumption).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opensora_tpu.models.mmdit.model import MMDiTModel, make_block_scan
from opensora_tpu.parallel.pipeline import pipeline_apply, split_scan_params

BLOCK_STACKS = ("double_blocks", "single_blocks")


def pp_param_specs(params: Any, axis: str = "pp", tp: bool = False) -> Any:
    """PartitionSpecs: block stacks sharded over ``axis`` on the layer axis.

    ``tp=False``: everything else replicated (embedders/final layer run on
    all stages). ``tp=True`` composes the TP rules (parallel/sharding.py —
    the same col/row feature sharding the GSPMD path uses) INSIDE each
    stage: a stacked qkv kernel (L, in, out) gets P('pp', None, 'tp'), its
    bias P('pp', 'tp'); non-stack leaves keep their plain TP specs. This is
    the PP×TP hybrid of the reference's HybridParallelPlugin
    (opensora/utils/train.py:100-128, tp_size×pp_size in one config)."""
    if tp:
        from opensora_tpu.parallel.sharding import mmdit_param_specs

        base = mmdit_param_specs(params, fsdp=False)

        def stack_spec(spec, leaf):
            s = list(spec) + [None] * (leaf.ndim - len(spec))
            s[0] = axis
            return P(*s)

        return {
            k: (
                jax.tree.map(
                    stack_spec, base[k], v,
                    is_leaf=lambda x: isinstance(x, P),
                )
                if k in BLOCK_STACKS
                else base[k]
            )
            for k, v in params.items()
        }
    specs = {
        k: jax.tree.map(
            (lambda x: P(axis, *([None] * (x.ndim - 1))))
            if k in BLOCK_STACKS
            else (lambda x: P()),
            v,
        )
        for k, v in params.items()
    }
    return specs


def pp_state_shardings(mesh: Mesh, state, axis: str = "pp", tp: bool = None):
    """TrainState shardings for the PP layout (analogue of
    training/diffusion.py::state_shardings): params by pp_param_specs,
    optimizer/EMA leaves matched by tree-path suffix (shape-keyed matching
    mis-shards when an embedder shape collides with a stacked-block leaf),
    scalars replicated. ``tp`` defaults to whether the mesh has a 'tp'
    axis (the PP×TP hybrid layout)."""
    from opensora_tpu.training.diffusion import TrainState, match_opt_shardings

    if tp is None:
        tp = "tp" in mesh.shape
    pshard = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        pp_param_specs(state.params, axis, tp=tp),
        is_leaf=lambda x: isinstance(x, P),
    )
    return TrainState(
        step=NamedSharding(mesh, P()),
        params=pshard,
        opt_state=match_opt_shardings(mesh, state.params, pshard, state.opt_state),
        ema_params=pshard if state.ema_params is not None else None,
    )


def make_pp_forward(
    model: MMDiTModel,
    mesh: Mesh,
    n_micro: int,
    axis: str = "pp",
    data_axis: Optional[str] = "data",
) -> Callable:
    """MMDiT forward running the block stacks as a GPipe pipeline over
    ``mesh``'s ``axis``. Drop-in ``forward_fn`` for make_train_step.

    ``n_micro`` microbatches must divide the batch; fill the pipeline with
    n_micro >= 2 * pp for a small bubble. ``data_axis`` (if present on the
    mesh) keeps the batch dim data-parallel inside the pipeline.
    """
    cfg = model.config
    n_stages = mesh.shape[axis]
    if cfg.depth % n_stages or cfg.depth_single_blocks % n_stages:
        raise ValueError(
            f"block depths ({cfg.depth}, {cfg.depth_single_blocks}) must "
            f"divide by pp={n_stages}"
        )
    dbl = make_block_scan(cfg, "double", cfg.depth // n_stages)
    sgl = make_block_scan(cfg, "single", cfg.depth_single_blocks // n_stages)
    batch_spec = (
        P(None, data_axis) if data_axis and data_axis in mesh.shape else P()
    )
    # any extra mesh axis (e.g. 'tp') is left to GSPMD inside the pipeline
    # body: with stage params tp-sharded (pp_param_specs(tp=True)), each
    # stage's matmuls partition over 'tp' with automatic psums — the
    # reference's tp-inside-pp hybrid (utils/train.py:100-128)
    auto_axes = tuple(
        n for n in mesh.axis_names if n not in (axis, data_axis)
    )

    def dbl_stage(p, act):
        # pe rides with the microbatch (it is per-sample state, same for
        # every stage) — passing it as a replicated const would broadcast
        # the FULL batch dim into the microbatch's attention output.
        img, txt, vec, pe = act
        (img, txt), _ = dbl.apply({"params": p}, (img, txt), vec, pe)
        return (img, txt, vec, pe)

    def sgl_stage(p, act):
        x, vec, pe = act
        x, _ = sgl.apply({"params": p}, x, vec, pe)
        return (x, vec, pe)

    def forward(
        params, img, img_ids, txt, txt_ids, timesteps, y_vec,
        cond=None, guidance=None,
    ):
        img_e, txt_e, vec, pe = model.apply(
            {"params": params}, img, img_ids, txt, txt_ids, timesteps,
            y_vec, cond, guidance, method=MMDiTModel.prepare_block_inputs,
        )
        b, l_txt = img_e.shape[0], txt_e.shape[1]
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")

        def mb(a):
            return a.reshape(n_micro, b // n_micro, *a.shape[1:])

        pe_mb = jax.tree.map(mb, pe)
        dbl_params = split_scan_params(params["double_blocks"], n_stages)
        img_mb, txt_mb, vec_mb, pe_mb = pipeline_apply(
            dbl_stage, dbl_params,
            (mb(img_e), mb(txt_e), mb(vec), pe_mb),
            mesh=mesh, axis=axis, batch_spec=batch_spec, auto_axes=auto_axes,
        )

        x_mb = jnp.concatenate([txt_mb, img_mb], axis=2)
        sgl_params = split_scan_params(params["single_blocks"], n_stages)
        x_mb, _, _ = pipeline_apply(
            sgl_stage, sgl_params, (x_mb, vec_mb, pe_mb),
            mesh=mesh, axis=axis, batch_spec=batch_spec, auto_axes=auto_axes,
        )

        x = x_mb.reshape(b, *x_mb.shape[2:])
        img_out = x[:, l_txt:, :]
        return model.apply(
            {"params": params}, img_out, vec,
            method=lambda m, i, v: m.final_layer(i, v),
        )

    return forward


def create_pp_mesh(pp: int, data: int = 1, tp: int = 1) -> Mesh:
    """(data, pp[, tp]) mesh for pipeline training runs. ``tp > 1`` adds a
    tensor-parallel axis composed inside each pipeline stage (the hybrid
    tp×pp layout of reference configs/diffusion/train/stage2.py:6-14)."""
    import numpy as np

    n = data * pp * tp
    devices = jax.devices()[:n]
    assert len(devices) == n, "not enough devices"
    if tp > 1:
        return Mesh(
            np.asarray(devices).reshape(data, pp, tp), ("data", "pp", "tp")
        )
    return Mesh(np.asarray(devices).reshape(data, pp), ("data", "pp"))
