"""Diffusion (MMDiT) training: sharded train state + jitted step.

Behavioral reference: scripts/diffusion/train.py:363-499 (prepare_inputs /
run_iter: rectified-flow target, logit-normal shifted t, conditioning
dropout, masked loss, EMA) and opensora/utils/train.py plugins (:73-128).

TPU design: one jitted train_step over the full mesh —
  params sharded by TP+FSDP rules (parallel/sharding.py),
  optimizer state + EMA inherit the same sharding (ZeRO-equivalent),
  batch sharded on 'data', tokens on 'sp',
  gradient all-reduce / reduce-scatter inserted by XLA from the shardings.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opensora_tpu.parallel.sharding import make_shardings, mmdit_param_specs
from opensora_tpu.utils.sampling import time_shift, get_res_lin_function
from opensora_tpu.utils.train import (
    dropout_condition,
    get_batch_loss,
    rf_interpolate,
    update_ema,
)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, tx, ema: bool = True):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # jnp.array forces a copy — astype would alias fp32 params with
            # the EMA tree and break buffer donation in the jitted step
            ema_params=jax.tree.map(lambda x: jnp.array(x, jnp.float32), params) if ema else None,
        )


def match_opt_shardings(mesh: Mesh, params, pshard, opt_tree):
    """Shardings for optimizer-state leaves: optax states embed
    params-shaped subtrees (mu, nu) whose tree paths END WITH the param's
    own path, so each opt leaf is matched to the param whose path is the
    longest suffix of its path (with a shape check). A shape-keyed match
    is NOT enough: a replicated embedder kernel can share a shape with a
    sharded block-stack leaf (e.g. img_in (8, 64) vs a depth-8 stacked
    bias) and silently mis-shard the moments. Unmatched leaves replicate."""
    from jax.tree_util import keystr, tree_flatten_with_path, tree_map_with_path

    param_shards = sorted(
        (
            (keystr(p), leaf.shape, sh)
            for (p, leaf), sh in zip(
                tree_flatten_with_path(params)[0],
                jax.tree.leaves(
                    pshard, is_leaf=lambda x: isinstance(x, NamedSharding)
                ),
            )
        ),
        key=lambda t: -len(t[0]),  # prefer the longest (most specific) path
    )

    def leaf_shard(path, x):
        if hasattr(x, "shape") and len(x.shape) > 0:
            ps = keystr(path)
            for pk, shape, sh in param_shards:
                if ps.endswith(pk) and x.shape == shape:
                    return sh
        return NamedSharding(mesh, P())

    return tree_map_with_path(leaf_shard, opt_tree)


def state_shardings(mesh: Mesh, state: TrainState, fsdp: bool = True):
    """Sharding pytree for the train state: params by rule; opt/EMA inherit
    (matched by tree-path suffix per leaf); scalars replicated."""
    pspecs = mmdit_param_specs(state.params, fsdp=fsdp)
    pshard = make_shardings(mesh, pspecs)

    return TrainState(
        step=NamedSharding(mesh, P()),
        params=pshard,
        opt_state=match_opt_shardings(mesh, state.params, pshard, state.opt_state),
        ema_params=pshard if state.ema_params is not None else None,
    )


def shard_state(mesh: Mesh, state: TrainState, fsdp: bool = True) -> Tuple[TrainState, Any]:
    """Place the full train state by the sharding rules. tx.init creates
    opt-state leaves on the default device (zeros_like does not inherit
    shardings eagerly), so an explicit device_put is required before jit."""
    st_shard = state_shardings(mesh, state, fsdp=fsdp)
    return jax.device_put(state, st_shard), st_shard


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.9999,
    text_dropout_prob: float = 0.0,
    sigma_min: float = 1e-5,
    use_masked_loss: bool = False,
    patch_size: int = 2,
    lora_scale: float = 1.0,
    forward_fn: Optional[Callable] = None,
) -> Callable:
    """Build the jitted rectified-flow train step.

    ``forward_fn(params, **model_kwargs) -> pred`` overrides the plain
    ``model.apply`` forward — e.g. the pipeline-parallel MMDiT forward
    (training/pp.py::make_pp_forward). Loss/EMA/optimizer logic is shared,
    so parity between the two is a test of the forward alone.

    LoRA fine-tuning (reference scripts/diffusion/train.py:198-217 via peft):
    pass the frozen base params as a 4th argument to the returned step; then
    ``state.params`` is the LoRA factor tree and the model runs on
    ``merge_lora(frozen, params, lora_scale)`` — only the factors get
    gradients/optimizer state.

    batch dict (all device arrays):
      x0        packed clean latent (B, L, C_in)
      img_ids   (B, L, 3)
      txt, txt_ids, y_vec   text conditioning
      cond      packed visual condition (B, L, C_in + p²) or None
      masks     latent mask (B, 1, T, H, W) or None (for masked loss)
      shift_alpha (B,) resolution/temporal timestep shift factor
      guidance  (B,)
      null_txt, null_vec    CFG null embeddings (broadcast rows)
    """

    def loss_fn(params, frozen, batch, rng):
        if frozen is not None:
            from opensora_tpu.training.lora import merge_lora

            params = merge_lora(frozen, params, lora_scale)
        r_t, r_noise, r_txt, r_vec = jax.random.split(rng, 4)
        x0 = batch["x0"].astype(jnp.float32)
        b = x0.shape[0]

        # logit-normal t, shifted (reference train.py:384-390)
        t = jax.nn.sigmoid(jax.random.normal(r_t, (b,), jnp.float32))
        t = time_shift(batch["shift_alpha"], t)

        x1 = jax.random.normal(r_noise, x0.shape, jnp.float32)
        x_t, v_t = rf_interpolate(x0, x1, t, sigma_min)

        txt = batch["txt"]
        y_vec = batch["y_vec"]
        if text_dropout_prob > 0:
            txt = dropout_condition(r_txt, text_dropout_prob, txt, batch["null_txt"])
            y_vec = dropout_condition(r_vec, text_dropout_prob, y_vec, batch["null_vec"])

        apply = forward_fn if forward_fn is not None else (
            lambda p, **kw: model.apply({"params": p}, **kw)
        )
        pred = apply(
            params,
            img=x_t.astype(txt.dtype),
            img_ids=batch["img_ids"],
            txt=txt,
            txt_ids=batch["txt_ids"],
            timesteps=t,
            y_vec=y_vec,
            cond=batch.get("cond"),
            guidance=batch.get("guidance"),
        )
        if use_masked_loss and batch.get("masks") is not None:
            loss = get_batch_loss(
                pred, v_t, batch["masks"],
                latent_shape=batch["masks"].shape[-3:], patch_size=patch_size,
            )
        else:
            loss = jnp.mean((pred.astype(jnp.float32) - v_t) ** 2)
        return loss

    def train_step(state: TrainState, batch: Dict, rng: jax.Array, frozen=None):
        rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, frozen, batch, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            update_ema(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return train_step


def jit_train_step(
    train_step, mesh: Mesh, state: TrainState, fsdp: bool = True,
    frozen_shardings=None, st_shard=None,
):
    """jit with explicit in/out shardings over the mesh. Batch arrays carry
    their own shardings (in_shardings=None → inferred). For LoRA, pass the
    frozen base params' shardings and call the step with 4 arguments.
    ``st_shard`` overrides the default TP/FSDP state layout — e.g. the
    pipeline-parallel stage layout (training/pp.py::pp_state_shardings)."""
    if st_shard is None:
        st_shard = state_shardings(mesh, state, fsdp=fsdp)
    in_shardings = (st_shard, None, None)
    if frozen_shardings is not None:
        in_shardings = in_shardings + (frozen_shardings,)
    return jax.jit(
        train_step,
        in_shardings=in_shardings,
        out_shardings=(st_shard, None),
        donate_argnums=(0,),
    )


def compute_shift_alpha(latent_h: int, latent_w: int, latent_t: int) -> float:
    """Resolution/temporal shift factor: res_lin((h·w)//4)·√T over *latent*
    dims (reference scripts/diffusion/train.py:385-390)."""
    import math

    alpha = get_res_lin_function()((latent_h * latent_w) // 4)
    return alpha * math.sqrt(latent_t)
