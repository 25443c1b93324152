"""Data loading: background-threaded prefetch feeding TPU hosts.

Behavioral reference: opensora/datasets/dataloader.py (prepare_dataloader
dispatch :232-313, DataloaderForVideo with a pinned-memory cache
:36-217, collate None-filtering :318-321, deterministic worker seeding).

TPU design: no pinned-memory dance — TPU hosts DMA from ordinary host RAM.
A thread pool decodes video while the accelerator runs the previous step;
``prefetch`` batches are kept in flight. Per-process data sharding follows
jax.process_index()/process_count() (the DP group of the reference)."""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from opensora_tpu.datasets.sampler import (
    StatefulDistributedSampler,
    VariableVideoBatchSampler,
)


def collate_fn_default(samples: List[Optional[dict]]) -> Optional[dict]:
    """Stack dict samples; drop Nones (corrupt media, reference :318-321)."""
    samples = [s for s in samples if s is not None]
    if not samples:
        return None
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Minimal threaded dataloader over a batch sampler."""

    def __init__(
        self,
        dataset,
        batch_sampler,
        num_workers: int = 2,
        prefetch: int = 2,
        collate_fn=collate_fn_default,
    ):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate_fn = collate_fn

    def __len__(self):
        return len(self.batch_sampler)

    def _fetch(self, indices) -> Optional[dict]:
        return self.collate_fn([self.dataset[i] for i in indices])

    def __iter__(self) -> Iterator[dict]:
        work_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        done = object()

        def producer():
            try:
                for indices in self.batch_sampler:
                    work_q.put(self._fetch(indices))
            finally:
                work_q.put(done)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = work_q.get()
            if item is done:
                break
            if item is None:
                continue
            yield item


def prepare_dataloader(
    dataset,
    batch_size: Optional[int] = None,
    bucket_config: Optional[dict] = None,
    num_workers: int = 2,
    shuffle: bool = True,
    seed: int = 42,
    drop_last: bool = False,
    num_replicas: Optional[int] = None,
    rank: Optional[int] = None,
    prefetch: int = 2,
    **kwargs,
):
    """Dispatch on dataset/bucket kind (reference dataloader.py:232-313).
    Returns (dataloader, sampler)."""
    import jax

    if num_replicas is None:
        num_replicas = jax.process_count()
    if rank is None:
        rank = jax.process_index()

    if bucket_config is not None:
        sampler = VariableVideoBatchSampler(
            dataset,
            bucket_config,
            num_replicas=num_replicas,
            rank=rank,
            shuffle=shuffle,
            seed=seed,
            drop_last=drop_last,
            verbose=True,
        )
        loader = DataLoader(
            dataset, sampler, num_workers=num_workers, prefetch=prefetch
        )
        return loader, sampler

    assert batch_size is not None

    data = getattr(dataset, "data", None)
    if data is not None and "shape" in getattr(data, "columns", []):
        from opensora_tpu.datasets.sampler import ShapeGroupedBatchSampler

        sampler = ShapeGroupedBatchSampler(
            data["shape"].tolist(), batch_size,
            num_replicas=num_replicas, rank=rank,
            shuffle=shuffle, seed=seed, drop_last=drop_last,
        )
        loader = DataLoader(dataset, sampler, num_workers=num_workers, prefetch=prefetch)
        return loader, sampler

    index_sampler = StatefulDistributedSampler(
        len(dataset), num_replicas=num_replicas, rank=rank,
        shuffle=shuffle, seed=seed, drop_last=drop_last,
    )

    class _Batched:
        def __init__(self, s, bs):
            self.s, self.bs = s, bs

        def __iter__(self):
            buf = []
            for i in self.s:
                buf.append(i)
                if len(buf) == self.bs:
                    yield buf
                    buf = []
            if buf and not drop_last:
                yield buf

        def __len__(self):
            n = len(self.s)
            return n // self.bs if drop_last else -(-n // self.bs)

    loader = DataLoader(
        dataset, _Batched(index_sampler, batch_size),
        num_workers=num_workers, prefetch=prefetch,
    )
    return loader, index_sampler
