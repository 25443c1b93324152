"""Bucketing: (resolution, num_frames, aspect-ratio) → (keep-prob, batch
size).

Behavioral reference: opensora/datasets/bucket.py:11-139. The bucket triplet
system defines the finite set of (T, H, W, bs) shapes seen by training — on
TPU this is also the XLA compilation-cache footprint, so the assignment math
must be stable and identical to the reference.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional, Tuple

import numpy as np

from opensora_tpu.datasets.aspect import (
    get_closest_ratio,
    get_resolution_with_aspect_ratio,
)
from opensora_tpu.datasets.utils import map_target_fps


class Bucket:
    """bucket_config: {resolution_name: {num_frames: (prob | (prob, next_t_prob), batch_size)}}"""

    def __init__(self, bucket_config: Dict[str, Dict[int, tuple]]):
        aspect_ratios = {
            key: get_resolution_with_aspect_ratio(key) for key in bucket_config
        }
        # order resolutions by pixel count, high → low
        bucket_names = sorted(
            bucket_config.keys(), key=lambda x: aspect_ratios[x][0], reverse=True
        )

        bucket_probs = OrderedDict()
        bucket_bs = OrderedDict()
        for key in bucket_names:
            t_names = sorted(bucket_config[key].keys(), reverse=True)
            bucket_probs[key] = OrderedDict(
                (t, bucket_config[key][t][0]) for t in t_names
            )
            bucket_bs[key] = OrderedDict(
                (t, bucket_config[key][t][1]) for t in t_names
            )

        self.hw_criteria = {k: aspect_ratios[k][0] for k in bucket_names}
        self.t_criteria = {k: {t: t for t in bucket_config[k]} for k in bucket_names}
        self.ar_criteria = {
            k: {t: dict(aspect_ratios[k][1]) for t in bucket_config[k]}
            for k in bucket_names
        }

        bucket_id_cnt = num_bucket = 0
        bucket_id: Dict[str, Dict[int, int]] = {}
        for k, probs in bucket_probs.items():
            bucket_id[k] = {}
            for t in probs:
                bucket_id[k][t] = bucket_id_cnt
                bucket_id_cnt += 1
                num_bucket += len(aspect_ratios[k][1])

        self.bucket_probs = bucket_probs
        self.bucket_bs = bucket_bs
        self.bucket_id = bucket_id
        self.num_bucket = num_bucket

    def get_bucket_id(
        self,
        T: int,
        H: int,
        W: int,
        fps: float,
        path: Optional[str] = None,
        seed: Optional[int] = None,
        fps_max: int = 16,
    ) -> Optional[Tuple[str, int, str]]:
        """Probabilistic bucket assignment (reference bucket.py:76-132):
        walk resolutions high→low (skip if sample resolution < 0.8×bucket),
        then frame counts high→low with keep/skip probabilities; per-sample
        RNG seeded for reproducible assignment across epochs/restarts."""
        approx = 0.8
        _, sampling_interval = map_target_fps(fps, fps_max)
        T = T // sampling_interval
        resolution = H * W
        rng = np.random.default_rng(seed)

        for hw_id, t_criteria in self.bucket_probs.items():
            if resolution < self.hw_criteria[hw_id] * approx:
                continue

            if T == 1:  # image
                if 1 in t_criteria:
                    if rng.random() < t_criteria[1]:
                        return hw_id, 1, get_closest_ratio(H, W, self.ar_criteria[hw_id][1])
                continue

            for t_id, prob in t_criteria.items():
                if T >= t_id and t_id != 1:
                    if isinstance(prob, tuple):
                        next_hw_prob, next_t_prob = prob
                        if next_t_prob >= 1 or rng.random() <= next_t_prob:
                            continue
                    else:
                        next_hw_prob = prob
                    if next_hw_prob >= 1 or rng.random() <= next_hw_prob:
                        ar_id = get_closest_ratio(H, W, self.ar_criteria[hw_id][t_id])
                        return hw_id, t_id, ar_id
                    else:
                        break
        return None

    def get_thw(self, bucket_id: Tuple[str, int, str]) -> Tuple[int, int, int]:
        assert len(bucket_id) == 3
        T = self.t_criteria[bucket_id[0]][bucket_id[1]]
        H, W = self.ar_criteria[bucket_id[0]][bucket_id[1]][bucket_id[2]]
        return T, H, W

    def get_prob(self, bucket_id) -> float:
        return self.bucket_probs[bucket_id[0]][bucket_id[1]]

    def get_batch_size(self, bucket_id) -> int:
        return self.bucket_bs[bucket_id[0]][bucket_id[1]]

    def __len__(self) -> int:
        return self.num_bucket
