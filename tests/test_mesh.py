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


def test_make_global_batch_placement():
    """Batch-assembly helper (parallel/data.py): rows land on 'data', token
    dims on 'sp' (when divisible), values unchanged — the CLI-side analogue
    of the reference's per-rank DP loading (dataloader.py:250-261)."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from opensora_tpu.parallel.data import make_global_batch
    from opensora_tpu.parallel.mesh import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(dp_size=4, sp_size=2, tp_size=1))
    rng = np.random.default_rng(0)
    batch = {
        "x0": rng.normal(size=(4, 6, 3)).astype(np.float32),   # tokens %2 != 0? 6%2==0
        "txt": rng.normal(size=(4, 8, 5)).astype(np.float32),
        "y_vec": rng.normal(size=(4, 5)).astype(np.float32),
        "guidance": rng.normal(size=(4,)).astype(np.float32),
        "cond": None,
        "odd_tokens": rng.normal(size=(4, 7, 3)).astype(np.float32),
    }
    out = make_global_batch(mesh, batch)
    assert out["cond"] is None
    assert out["x0"].sharding.spec == P("data", "sp", None)
    assert out["txt"].sharding.spec == P("data", "sp", None)
    assert out["y_vec"].sharding.spec == P("data", None)
    assert out["guidance"].sharding.spec == P("data")
    # non-token key: rows on data only even at 3D
    assert out["odd_tokens"].sharding.spec == P("data", None, None)
    for k in ("x0", "txt", "y_vec", "guidance"):
        assert np.allclose(np.asarray(out[k]), batch[k])


def test_make_global_batch_token_fallback():
    """Token length not divisible by sp → tokens replicate (still correct)."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from opensora_tpu.parallel.data import make_global_batch
    from opensora_tpu.parallel.mesh import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(dp_size=4, sp_size=2, tp_size=1))
    out = make_global_batch(
        mesh, {"x0": np.zeros((4, 7, 3), np.float32)}
    )
    assert out["x0"].sharding.spec == P("data", None, None)
