"""Optimizer + LR schedule factories.

Behavioral reference: opensora/utils/optimizer.py:7-91 (HybridAdam factory,
LinearWarmupLR, CosineAnnealingWarmupLR). ColossalAI's HybridAdam (fused
CUDA/CPU Adam) maps to optax.adamw — XLA fuses the update elementwise chain —
with optimizer state sharded over the mesh by pjit (the ZeRO analogue).
"""

from __future__ import annotations

from typing import Optional

import optax


def linear_warmup_schedule(lr: float, warmup_steps: int) -> optax.Schedule:
    if warmup_steps <= 0:
        return optax.constant_schedule(lr)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps), optax.constant_schedule(lr)],
        [warmup_steps],
    )


def cosine_annealing_warmup_schedule(
    lr: float, warmup_steps: int, total_steps: int, eta_min: float = 1e-7
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=eta_min,
    )


def create_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    betas=(0.9, 0.999),
    warmup_steps: Optional[int] = None,
    use_cosine_scheduler: bool = False,
    total_steps: int = 1_000_000,
    grad_clip: Optional[float] = None,
    accumulation_steps: int = 1,
):
    """Mirrors the reference trainer's optimizer/scheduler wiring
    (scripts/diffusion/train.py:237-250)."""
    if use_cosine_scheduler:
        schedule = cosine_annealing_warmup_schedule(lr, warmup_steps or 0, total_steps)
    elif warmup_steps:
        schedule = linear_warmup_schedule(lr, warmup_steps)
    else:
        schedule = lr

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(
        optax.adamw(schedule, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    return tx
