"""Device-mesh construction for DP / FSDP / SP / TP over ICI.

Replaces the reference's process-group registry + ColossalAI plugin mesh
(reference: opensora/acceleration/parallel_states.py:3-29,
opensora/utils/train.py:73-128) with a single jax.sharding.Mesh.

Axis meaning:
  data — data parallel (batch); also the FSDP axis for ZeRO-style sharding
  sp   — sequence parallel (tokens within a sample)
  tp   — tensor parallel (hidden dimension / attention heads)

ZeRO-1/2 of the reference maps to sharding optimizer state (and optionally
params) over ``data`` — XLA overlaps the induced all-gathers with compute,
the analogue of ColossalAI's overlap_allgather.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SP_AXIS = "sp"
TP_AXIS = "tp"
AXES = (DATA_AXIS, SP_AXIS, TP_AXIS)


@dataclass
class MeshConfig:
    """Mirrors the reference plugin_config dict (tp_size/sp_size/...)."""

    dp_size: int = -1  # -1: fill remaining devices
    sp_size: int = 1
    tp_size: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        sizes = [self.dp_size, self.sp_size, self.tp_size]
        fills = [i for i, s in enumerate(sizes) if s == -1]
        assert len(fills) <= 1, "only one mesh axis may be -1 (fill remaining)"
        if fills:
            known = 1
            for s in sizes:
                if s != -1:
                    known *= s
            assert n_devices % known == 0, (
                f"{n_devices} devices not divisible by fixed axes product {known}"
            )
            sizes[fills[0]] = n_devices // known
        dp, sp, tp = sizes
        assert dp * sp * tp == n_devices, (
            f"dp*sp*tp={dp * sp * tp} != n_devices={n_devices}"
        )
        return dp, sp, tp


def create_mesh(
    mesh_config: MeshConfig | dict | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    if isinstance(mesh_config, dict):
        mesh_config = MeshConfig(**mesh_config)
    mesh_config = mesh_config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    dp, sp, tp = mesh_config.resolve(len(devices))
    # Use jax's device ordering utilities so the innermost (fastest-varying)
    # axes land on ICI-adjacent chips: tp innermost, then sp, then data.
    try:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh((dp, sp, tp), devices=devices)
    except Exception:
        dev_array = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(dev_array, AXES)


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1, 1), AXES)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, *trailing_axes) -> NamedSharding:
    """Batch-dim sharded over data (and optionally more named axes)."""
    return NamedSharding(mesh, P(DATA_AXIS, *trailing_axes))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    dp = mesh.shape[DATA_AXIS]
    assert global_batch % dp == 0
    return global_batch // dp


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_to_multiple(length: int, multiple: int) -> int:
    return int(math.ceil(length / multiple) * multiple)
