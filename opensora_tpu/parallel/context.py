"""Global parallel context — the SPMD analogue of the reference's
process-group registry (opensora/acceleration/parallel_states.py:3-29).

Instead of NCCL groups, a single jax Mesh is registered; model code reads it
to decide whether/how to shard_map attention (sequence parallelism) and to
place sharding constraints.
"""

from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

from opensora_tpu.parallel.mesh import DATA_AXIS, SP_AXIS, TP_AXIS

_MESH: Optional[Mesh] = None


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _MESH
    _MESH = mesh


def get_mesh() -> Optional[Mesh]:
    return _MESH


def axis_size(axis: str) -> int:
    if _MESH is None:
        return 1
    return _MESH.shape.get(axis, 1)


def dp_size() -> int:
    return axis_size(DATA_AXIS)


def sp_size() -> int:
    return axis_size(SP_AXIS)


def tp_size() -> int:
    return axis_size(TP_AXIS)


def sp_enabled() -> bool:
    return sp_size() > 1
