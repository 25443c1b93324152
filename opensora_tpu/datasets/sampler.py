"""Batch samplers: variable-shape bucket sampler with mid-epoch resume.

Behavioral reference: opensora/datasets/sampler.py:33-393
(StatefulDistributedSampler, VariableVideoBatchSampler,
BatchDistributedSampler). Semantics preserved:

- probabilistic bucket assignment per sample, seeded by (seed + epoch) so
  assignment is reproducible;
- per-bucket pad-or-drop to a batch-size multiple, per-bucket shuffle, then a
  shuffled bucket-access order padded to a multiple of the DP world size;
- each DP rank consumes its slice of each access round; sample indices are
  encoded as "idx-T-H-W" strings carrying the target shape to the dataset;
- **stateful resume**: ``last_micro_batch_access_index`` survives
  checkpointing and is re-normalized when the number of ranks changes
  (reference :157-197).

The reference's pandarallel fan-out + broadcast (rank 0 assigns buckets for
everyone) becomes a plain vectorized pass here: every SPMD host computes the
same assignment deterministically from the shared seed — no broadcast needed.
"""

from __future__ import annotations

from collections import OrderedDict, defaultdict
from typing import Dict, Iterator, List

import numpy as np

from opensora_tpu.datasets.bucket import Bucket
from opensora_tpu.utils.logger import log_message


class StatefulDistributedSampler:
    """Plain index sampler with a resumable start offset
    (reference sampler.py:33-62)."""

    def __init__(
        self,
        dataset_size: int,
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.dataset_size = dataset_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.start_index = 0
        if drop_last:
            self.num_samples = dataset_size // num_replicas
        else:
            self.num_samples = -(-dataset_size // num_replicas)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        idx = np.arange(self.dataset_size)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(idx)
        if not self.drop_last:
            pad = self.num_samples * self.num_replicas - len(idx)
            if pad > 0:
                idx = np.concatenate([idx, idx[:pad]])
        else:
            idx = idx[: self.num_samples * self.num_replicas]
        idx = idx[self.rank :: self.num_replicas]
        return iter(idx[self.start_index :].tolist())

    def __len__(self) -> int:
        return self.num_samples - self.start_index

    def reset(self):
        self.start_index = 0

    def state_dict(self, step: int) -> dict:
        return {"start_index": step}

    def load_state_dict(self, state: dict):
        self.start_index = state.get("start_index", 0)


class VariableVideoBatchSampler:
    """Bucketized variable-shape batch sampler (reference sampler.py:65-341)."""

    def __init__(
        self,
        dataset,
        bucket_config: dict,
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
        verbose: bool = False,
        **_,
    ):
        self.dataset = dataset
        self.bucket = Bucket(bucket_config)
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.verbose = verbose
        self.epoch = 0
        self.last_micro_batch_access_index = 0
        self._cached_bucket_sample_dict = None
        self._cached_num_total_batch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    # -- bucket assignment --------------------------------------------------
    def group_by_bucket(self):
        if self._cached_bucket_sample_dict is not None:
            return self._cached_bucket_sample_dict, self._cached_num_total_batch

        data = self.dataset.data
        bucket_sample_dict: Dict[tuple, List[int]] = defaultdict(list)
        seed = self.seed + self.epoch
        fps_max = getattr(self.dataset, "fps_max", 16)
        def _num(val, default):
            # `or default` misses NaN (NaN is truthy): empty cells in a
            # mixed image/video csv come through pandas as NaN
            try:
                f = float(val)
            except (TypeError, ValueError):
                return default
            return default if f != f else f

        for i in range(len(data)):
            row = data.iloc[i]
            t = int(_num(row.get("num_frames", 1), 1) or 1)
            h = int(row["height"])
            w = int(row["width"])
            fps = _num(row.get("fps", 0), 0.0)
            bucket_id = self.bucket.get_bucket_id(
                t, h, w, fps, path=row.get("path"),
                seed=seed + i * self.bucket.num_bucket, fps_max=fps_max,
            )
            if bucket_id is not None:
                bucket_sample_dict[bucket_id].append(i)

        num_total_batch = self._log_bucket_info(bucket_sample_dict)
        self._cached_bucket_sample_dict = bucket_sample_dict
        self._cached_num_total_batch = num_total_batch
        return bucket_sample_dict, num_total_batch

    def clear_cache(self):
        self._cached_bucket_sample_dict = None
        self._cached_num_total_batch = 0

    def _log_bucket_info(self, bucket_sample_dict) -> int:
        total_batch = 0
        total_samples = 0
        img_samples = vid_samples = 0
        for bucket_id, samples in bucket_sample_dict.items():
            bs = self.bucket.get_batch_size(bucket_id)
            n = len(samples)
            total_samples += n
            total_batch += n // bs
            if bucket_id[1] == 1:
                img_samples += n
            else:
                vid_samples += n
        if self.verbose:
            log_message(
                f"Bucket stats: {total_samples} samples "
                f"({img_samples} img / {vid_samples} vid), {total_batch} batches"
            )
        return total_batch

    # -- iteration -----------------------------------------------------------
    def __iter__(self) -> Iterator[List[str]]:
        bucket_sample_dict, _ = self.group_by_bucket()
        self.clear_cache()

        rng = np.random.default_rng(self.seed + self.epoch)
        bucket_micro_batch_count = OrderedDict()
        bucket_last_consumed: Dict[tuple, int] = OrderedDict()

        for bucket_id in list(bucket_sample_dict.keys()):
            data_list = bucket_sample_dict[bucket_id]
            bs = self.bucket.get_batch_size(bucket_id)
            remainder = len(data_list) % bs
            if remainder > 0:
                if not self.drop_last:
                    data_list = data_list + data_list[: bs - remainder]
                else:
                    data_list = data_list[:-remainder]
            if self.shuffle:
                perm = rng.permutation(len(data_list))
                data_list = [data_list[i] for i in perm]
            bucket_sample_dict[bucket_id] = data_list
            bucket_micro_batch_count[bucket_id] = len(data_list) // bs

        bucket_id_access_order = []
        for bucket_id, n in bucket_micro_batch_count.items():
            bucket_id_access_order.extend([bucket_id] * n)
        if self.shuffle:
            perm = rng.permutation(len(bucket_id_access_order))
            bucket_id_access_order = [bucket_id_access_order[i] for i in perm]

        remainder = len(bucket_id_access_order) % self.num_replicas
        if remainder > 0:
            if self.drop_last:
                bucket_id_access_order = bucket_id_access_order[:-remainder]
            else:
                bucket_id_access_order += bucket_id_access_order[
                    : self.num_replicas - remainder
                ]

        num_iters = len(bucket_id_access_order) // self.num_replicas
        start_iter_idx = self.last_micro_batch_access_index // self.num_replicas

        # re-normalize resume point for a possibly-changed world size
        # (reference sampler.py:157-168)
        self.last_micro_batch_access_index = start_iter_idx * self.num_replicas
        for i in range(self.last_micro_batch_access_index):
            bucket_id = bucket_id_access_order[i]
            bs = self.bucket.get_batch_size(bucket_id)
            bucket_last_consumed[bucket_id] = bucket_last_consumed.get(bucket_id, 0) + bs

        for i in range(start_iter_idx, num_iters):
            access = bucket_id_access_order[
                i * self.num_replicas : (i + 1) * self.num_replicas
            ]
            self.last_micro_batch_access_index += self.num_replicas

            boundaries = []
            for bucket_id in access:
                bs = self.bucket.get_batch_size(bucket_id)
                last = bucket_last_consumed.get(bucket_id, 0)
                boundaries.append((last, last + bs))
                bucket_last_consumed[bucket_id] = last + bs

            bucket_id = access[self.rank]
            lo, hi = boundaries[self.rank]
            data_list = bucket_sample_dict[bucket_id]
            # wrap: the replica-padding of the access order duplicates
            # bucket accesses WITHOUT extending the per-bucket sample lists,
            # so the consumed offset can run past the end — a plain [lo:hi]
            # slice would yield a short/empty batch on some ranks (multi-host
            # collective desync). In-range slices are unaffected (j % n == j).
            micro_batch = [data_list[j % len(data_list)] for j in range(lo, hi)]
            real_t, real_h, real_w = self.bucket.get_thw(bucket_id)
            yield [f"{idx}-{real_t}-{real_h}-{real_w}" for idx in micro_batch]

        self.reset()

    def __len__(self) -> int:
        """Iterations actually yielded per rank — mirrors __iter__'s padding
        (ceil per bucket and ceil over replicas unless drop_last), so
        len(dataloader)-derived step counts match reality."""
        bucket_sample_dict, _ = self.group_by_bucket()
        total = 0
        for bucket_id, samples in bucket_sample_dict.items():
            bs = self.bucket.get_batch_size(bucket_id)
            n = len(samples)
            total += (n // bs) if self.drop_last else -(-n // bs)
        if self.drop_last:
            return total // self.num_replicas
        return -(-total // self.num_replicas) if total else 0

    def get_num_batch(self) -> int:
        _, n = self.group_by_bucket()
        return n

    def reset(self):
        self.last_micro_batch_access_index = 0

    def state_dict(self, num_steps: int) -> dict:
        # resume from the NEXT sample (reference sampler.py:346-351)
        return {
            "seed": self.seed,
            "epoch": self.epoch,
            "last_micro_batch_access_index": num_steps * self.num_replicas,
        }

    def load_state_dict(self, state: dict):
        self.seed = state.get("seed", self.seed)
        self.epoch = state.get("epoch", self.epoch)
        self.last_micro_batch_access_index = state.get(
            "last_micro_batch_access_index", 0
        )


class BatchDistributedSampler(StatefulDistributedSampler):
    """Contiguous-batch sampler for pre-batched (cached-latent) datasets
    (reference sampler.py:356-393): each rank reads whole saved batches."""

    def __init__(self, dataset_size: int, batch_size: int, **kwargs):
        super().__init__(dataset_size, **kwargs)
        self.batch_size = batch_size

    def __iter__(self):
        num_batches = self.dataset_size // self.batch_size
        idx = np.arange(num_batches)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            idx = rng.permutation(idx)
        # pad to a replica multiple (wrap) so every rank yields the SAME
        # number of batches — an uneven split deadlocks multi-host
        # collectives at epoch end (the parent StatefulDistributedSampler
        # pads; this override must keep that invariant)
        per_rank = -(-num_batches // self.num_replicas) if num_batches else 0
        pad = per_rank * self.num_replicas - num_batches
        if pad > 0:
            idx = np.concatenate([idx, idx[:pad]])
        idx = idx[self.rank :: self.num_replicas]
        for b in idx[self.start_index :]:
            start = int(b) * self.batch_size
            yield list(range(start, start + self.batch_size))


class ShapeGroupedBatchSampler:
    """Uniform-shape batches for cached-latent datasets: rows are grouped by
    their recorded latent shape so collate can stack them (the reference
    sidesteps this by saving whole batches and replaying them with
    BatchDistributedSampler; per-sample caches need explicit grouping)."""

    def __init__(
        self,
        shapes,
        batch_size: int,
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.shapes = list(shapes)
        self.batch_size = batch_size
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.start_index = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _batches(self):
        groups: Dict[str, List[int]] = defaultdict(list)
        for i, sh in enumerate(self.shapes):
            groups[str(sh)].append(i)
        rng = np.random.default_rng(self.seed + self.epoch)
        batches = []
        for key in sorted(groups):
            idx = groups[key]
            if self.shuffle:
                idx = [idx[j] for j in rng.permutation(len(idx))]
            for s in range(0, len(idx), self.batch_size):
                b = idx[s:s + self.batch_size]
                if len(b) == self.batch_size:
                    batches.append(b)
                elif not self.drop_last and self.num_replicas == 1:
                    batches.append(b)
                elif not self.drop_last:
                    # multi-host: a short tail on one rank while another
                    # rank sees a full batch at the same step breaks
                    # cross-host global-batch shape agreement — wrap-pad
                    # the tail to full size instead (cycling if the whole
                    # group is smaller than one batch)
                    need = self.batch_size - len(b)
                    pad_src = (idx * (need // len(idx) + 1))[:need]
                    batches.append(b + pad_src)
        if self.shuffle:
            batches = [batches[j] for j in rng.permutation(len(batches))]
        # equal batch count per rank (wrap) — uneven splits deadlock
        # multi-host collectives at epoch end
        n = len(batches)
        per_rank = -(-n // self.num_replicas) if n else 0
        pad = per_rank * self.num_replicas - n
        if pad > 0:
            batches = batches + batches[:pad]
        return batches[self.rank::self.num_replicas]

    def __iter__(self):
        for b in self._batches()[self.start_index:]:
            yield b
        self.start_index = 0

    def __len__(self):
        return len(self._batches()) - self.start_index

    def state_dict(self, step: int) -> dict:
        return {"start_index": step}

    def load_state_dict(self, state: dict):
        self.start_index = state.get("start_index", 0)
