"""Multi-rank padding invariants for the samplers (round-2 review fixes).

Every rank must yield the SAME number of batches, and every batch must be
full-sized — an uneven split or a short batch on one rank deadlocks
multi-host SPMD collectives or breaks global-batch shape agreement.
"""

import numpy as np
import pandas as pd
import pytest

from opensora_tpu.datasets.sampler import (
    BatchDistributedSampler,
    ShapeGroupedBatchSampler,
    VariableVideoBatchSampler,
)


class _DS:
    def __init__(self, df):
        self.data = df
        self.fps_max = 16


def _df(n, frames=33, hw=256):
    return pd.DataFrame(
        {
            "path": [f"v{i}.mp4" for i in range(n)],
            "num_frames": [frames] * n,
            "height": [hw] * n,
            "width": [hw] * n,
            "fps": [16.0] * n,
        }
    )


BUCKET_CONFIG = {"256px": {33: (1.0, 4)}}


def test_variable_sampler_equal_full_batches_across_ranks():
    """9 samples, bs=4, 4 replicas: access order must pad and every rank's
    every batch must still be exactly bs samples (wrapped, not short)."""
    ds = _DS(_df(9))
    per_rank = []
    for rank in range(4):
        s = VariableVideoBatchSampler(
            ds, BUCKET_CONFIG, num_replicas=4, rank=rank,
            shuffle=True, seed=0, drop_last=False, verbose=False,
        )
        batches = list(s)
        per_rank.append(batches)
    counts = {len(b) for b in per_rank}
    assert len(counts) == 1, [len(b) for b in per_rank]
    for batches in per_rank:
        assert len(batches) == len(per_rank[0])
        for b in batches:
            assert len(b) == 4, b  # full micro-batch, never short/empty


def test_variable_sampler_len_matches_iteration():
    ds = _DS(_df(10))
    s = VariableVideoBatchSampler(
        ds, BUCKET_CONFIG, num_replicas=1, rank=0,
        shuffle=False, seed=0, drop_last=False, verbose=False,
    )
    assert len(list(s)) == len(s)
    s2 = VariableVideoBatchSampler(
        ds, BUCKET_CONFIG, num_replicas=1, rank=0,
        shuffle=False, seed=0, drop_last=True, verbose=False,
    )
    assert len(list(s2)) == len(s2)


def test_variable_sampler_nan_cells():
    """NaN num_frames/fps (empty csv cells for image rows) must not crash
    bucket assignment."""
    df = _df(4)
    df.loc[1, "num_frames"] = np.nan
    df.loc[1, "fps"] = np.nan
    s = VariableVideoBatchSampler(
        _DS(df), {"256px": {33: (1.0, 2), 1: (1.0, 2)}},
        num_replicas=1, rank=0, shuffle=False, seed=0, verbose=False,
    )
    _ = list(s)  # no ValueError


def test_batch_distributed_sampler_equal_counts():
    """10 saved batches over 4 replicas: all ranks get ceil(10/4)=3."""
    lens = []
    for rank in range(4):
        s = BatchDistributedSampler(
            dataset_size=100, batch_size=10, num_replicas=4, rank=rank,
            shuffle=True, seed=0,
        )
        batches = list(s)
        lens.append(len(batches))
        assert all(len(b) == 10 for b in batches)
    assert len(set(lens)) == 1, lens


def test_shape_grouped_sampler_equal_full_batches():
    """Tail group smaller than a batch + non-multiple batch count: every
    rank yields the same number of full-size batches."""
    shapes = ["(4,8,8)"] * 9 + ["(2,8,8)"] * 2  # 3 batches of A + 1 of B
    lens = []
    for rank in range(3):
        s = ShapeGroupedBatchSampler(
            shapes, batch_size=4, num_replicas=3, rank=rank,
            shuffle=True, seed=0, drop_last=False,
        )
        batches = list(s)
        lens.append(len(batches))
        for b in batches:
            assert len(b) == 4, b
            # uniform shape within the batch (the sampler's contract)
            assert len({shapes[i] for i in b}) == 1, b
    assert len(set(lens)) == 1, lens
