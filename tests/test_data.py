"""Bucket / aspect / sampler semantics + schedule math golden values."""

import numpy as np
import pytest

from opensora_tpu.datasets.aspect import (
    get_aspect_ratios_dict,
    get_closest_ratio,
    get_image_size,
    get_num_pixels_from_name,
)
from opensora_tpu.datasets.bucket import Bucket
from opensora_tpu.datasets.sampler import VariableVideoBatchSampler
from opensora_tpu.datasets.utils import map_target_fps


def test_aspect_math():
    assert get_num_pixels_from_name("256px") == 256 * 256
    assert get_num_pixels_from_name("360p") == int(360 * 360 / 9 * 16)
    ars = get_aspect_ratios_dict(256 * 256)
    for h, w in ars.values():
        assert h % 16 == 0 and w % 16 == 0
    assert get_closest_ratio(720, 1280, ars) == "16:9"  # names are width:height
    h, w = get_image_size("256px", "1:1")
    assert h == w == 256


def test_map_target_fps():
    assert map_target_fps(30, 16) == (15.0, 2)
    assert map_target_fps(16, 16) == (16, 1)
    assert map_target_fps(0, 16) == (0.0, 1)


@pytest.fixture
def bucket():
    return Bucket({
        "256px": {1: (1.0, 8), 33: (1.0, 4), 65: (1.0, 2)},
        "768px": {1: (0.5, 2), 33: (0.5, 1)},
    })


def test_bucket_assignment(bucket):
    # large video → highest resolution bucket that fits, longest T first
    bid = bucket.get_bucket_id(100, 1080, 1920, fps=16, seed=0)
    assert bid is not None
    hw_id, t_id, ar = bid
    assert t_id in (33, 65)
    t, h, w = bucket.get_thw(bid)
    assert t == t_id
    # tiny image → only small bucket possible
    bid = bucket.get_bucket_id(1, 260, 260, fps=0, seed=0)
    assert bid is not None and bid[1] == 1
    # too-low resolution → None
    assert bucket.get_bucket_id(100, 64, 64, fps=16, seed=0) is None


class _FakeDataset:
    bucket_class = "Bucket"
    fps_max = 16

    def __init__(self, n):
        import pandas as pd

        rng = np.random.default_rng(0)
        self.data = pd.DataFrame({
            "path": [f"v{i}.mp4" for i in range(n)],
            "num_frames": rng.choice([1, 40, 80], n),
            "height": rng.choice([720, 1080], n),
            "width": rng.choice([1280, 1920], n),
            "fps": 16.0,
        })


def _all_batches(sampler):
    return list(iter(sampler))


def test_sampler_batches_and_resume():
    ds = _FakeDataset(64)
    cfgs = {"256px": {1: (1.0, 4), 33: (1.0, 2)}}
    s = VariableVideoBatchSampler(ds, cfgs, num_replicas=2, rank=0, seed=7)
    batches = _all_batches(s)
    assert batches, "sampler yielded nothing"
    # every element is "idx-T-H-W" and batch shapes are uniform per batch
    for b in batches:
        shapes = {tuple(map(int, e.split("-")[1:])) for e in b}
        assert len(shapes) == 1

    # resume mid-epoch: state after k steps reproduces the remaining batches
    s2 = VariableVideoBatchSampler(ds, cfgs, num_replicas=2, rank=0, seed=7)
    k = 2
    it = iter(s2)
    first = [next(it) for _ in range(k)]
    assert first == batches[:k]
    s3 = VariableVideoBatchSampler(ds, cfgs, num_replicas=2, rank=0, seed=7)
    s3.load_state_dict(s2.state_dict(k))
    rest = _all_batches(s3)
    assert rest == batches[k:]


def test_sampler_rank_disjoint():
    ds = _FakeDataset(64)
    cfgs = {"256px": {1: (1.0, 4), 33: (1.0, 2)}}
    a = _all_batches(VariableVideoBatchSampler(ds, cfgs, num_replicas=2, rank=0, seed=7))
    b = _all_batches(VariableVideoBatchSampler(ds, cfgs, num_replicas=2, rank=1, seed=7))
    assert len(a) == len(b)


def test_schedule_golden():
    """time_shift / schedule math vs closed form (reference sampling.py:295-332)."""
    import jax.numpy as jnp

    from opensora_tpu.utils.sampling import get_res_lin_function, get_schedule, time_shift

    f = get_res_lin_function()
    assert abs(f(256) - 1.0) < 1e-9
    assert abs(f(4096) - 3.0) < 1e-9
    ts = get_schedule(10, 1024, num_frames=9, shift=True)
    assert ts.shape == (11,)
    assert float(ts[0]) == 1.0 and abs(float(ts[-1])) < 1e-7
    assert bool(jnp.all(ts[:-1] > ts[1:]))  # strictly decreasing
    t = jnp.asarray([0.25, 0.5, 0.75])
    alpha = 2.0
    expected = alpha * t / (1 + (alpha - 1) * t)
    assert jnp.allclose(time_shift(alpha, t), expected)


def test_pack_unpack_roundtrip():
    import jax.numpy as jnp

    from opensora_tpu.utils.sampling import pack, unpack

    x = jnp.arange(2 * 4 * 3 * 8 * 8, dtype=jnp.float32).reshape(2, 4, 3, 8, 8)
    packed = pack(x, patch_size=2)
    assert packed.shape == (2, 3 * 4 * 4, 16)
    # unpack uses AE_SPATIAL_COMPRESSION=16: h=ceil(H*8/16)... invert manually
    restored = unpack(packed, height=8 * 8, width=8 * 8, num_frames=3, patch_size=2)
    assert jnp.array_equal(restored, x)


def test_shape_grouped_batch_sampler():
    from opensora_tpu.datasets.sampler import ShapeGroupedBatchSampler

    shapes = ["4x2x8x8"] * 5 + ["4x1x8x8"] * 3
    s = ShapeGroupedBatchSampler(shapes, batch_size=2, shuffle=True, seed=1)
    batches = list(s)
    for b in batches:
        assert len({shapes[i] for i in b}) == 1  # uniform shape per batch
    covered = sorted(i for b in batches for i in b)
    assert covered == list(range(8))
