"""Mesh construction and fill-axis resolution."""

import pytest

from opensora_tpu.parallel.mesh import MeshConfig, create_mesh


def test_resolve_fill_axes():
    assert MeshConfig(dp_size=-1, sp_size=2, tp_size=2).resolve(8) == (2, 2, 2)
    assert MeshConfig(dp_size=1, sp_size=-1, tp_size=1).resolve(8) == (1, 8, 1)
    assert MeshConfig(dp_size=1, sp_size=1, tp_size=-1).resolve(8) == (1, 1, 8)
    with pytest.raises(AssertionError):
        MeshConfig(dp_size=-1, sp_size=-1).resolve(8)
    with pytest.raises(AssertionError):
        MeshConfig(dp_size=3, sp_size=1, tp_size=1).resolve(8)


def test_create_mesh_axes():
    mesh = create_mesh(MeshConfig(dp_size=2, sp_size=2, tp_size=2))
    assert mesh.shape == {"data": 2, "sp": 2, "tp": 2}
