"""Datasets: text prompts, video-text pairs, cached latents.

Behavioral reference: opensora/datasets/datasets.py:99-316 (TextDataset,
VideoTextDataset with "idx-T-H-W" composite indices + per-bucket resize_crop,
CachedVideoTextDataset, EfficientParquet lazy text columns).

Outputs are numpy (TPU hosts feed device arrays via the loader); corrupt
samples return None and are filtered at collate (reference :240-243).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

from opensora_tpu.datasets import utils as du
from opensora_tpu.registry import DATASETS


def read_data_file(path: str) -> pd.DataFrame:
    if path.endswith(".csv"):
        return pd.read_csv(path)
    if path.endswith(".parquet"):
        return pd.read_parquet(path)
    if path.endswith(".jsonl"):
        return pd.read_json(path, lines=True)
    raise ValueError(f"unsupported data file {path}")


@DATASETS.register_module("text")
class TextDataset:
    """Prompt-only dataset for inference (reference datasets.py:99-167).

    Supports fps-suffix injection and motion-score suffixes via kwargs, like
    the reference's prompt post-processing."""

    def __init__(
        self,
        data_path: str,
        fps: Optional[int] = None,
        motion_score: Optional[str] = None,
        **_,
    ):
        self.data_path = data_path
        self.data = read_data_file(data_path)
        assert "text" in self.data.columns, "text column required"
        texts = self.data["text"].tolist()
        if fps is not None:
            from opensora_tpu.utils.inference import add_fps_info_to_text

            texts = add_fps_info_to_text(texts, fps=fps)
        if motion_score is not None:
            from opensora_tpu.utils.inference import add_motion_score_to_text

            texts = add_motion_score_to_text(texts, motion_score)
        self.texts = texts

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> dict:
        row = self.data.iloc[idx]
        out = {"text": self.texts[idx], "index": idx}
        if "ref" in self.data.columns and not pd.isna(row.get("ref")):
            out["ref"] = row["ref"]
        if "neg" in self.data.columns and not pd.isna(row.get("neg")):
            out["neg"] = row["neg"]
        return out


@DATASETS.register_module("video_text")
class VideoTextDataset:
    """Video/image + caption dataset with bucket-shape decoding
    (reference datasets.py:169-248)."""

    bucket_class = "Bucket"

    def __init__(
        self,
        data_path: str,
        transform_name: str = "resize_crop",
        fps_max: int = 16,
        **_,
    ):
        self.data_path = data_path
        self.data = read_data_file(data_path)
        self.transform_name = transform_name
        self.fps_max = fps_max
        if "height" not in self.data.columns or "width" not in self.data.columns:
            raise ValueError(
                "dataset needs height/width columns — run scripts/cnv/meta.py first"
            )

    def __len__(self):
        return len(self.data)

    def getitem(self, index: str) -> Optional[dict]:
        # composite index "idx-T-H-W" from the bucket sampler
        idx, num_frames, height, width = (int(v) for v in index.split("-"))
        row = self.data.iloc[idx]
        path = row["path"]
        text = row.get("text", "")
        rng = np.random.default_rng(abs(hash((self.data_path, idx))) % 2**32)

        try:
            if du.is_img(path):
                media = du.read_image(path)
                video = np.repeat(media, num_frames, axis=1)
                fps = 0.0
            else:
                fps_raw = float(row.get("fps", 0) or 0)
                _, interval = du.map_target_fps(fps_raw, self.fps_max)
                from opensora_tpu.datasets.read_video import read_video_any

                video, fps = read_video_any(path, sampling_interval=interval)
                video = du.temporal_random_crop(video, num_frames, 1, rng)
            video = du.resize_crop(video, (height, width))
            video = du.normalize_video(video)
        except Exception:
            return None  # filtered in collate (reference :240-243)

        return {
            "video": video.astype(np.float32),
            "text": text,
            "num_frames": num_frames,
            "height": height,
            "width": width,
            "fps": fps,
            "index": idx,
        }

    def __getitem__(self, index):
        if isinstance(index, str):
            return self.getitem(index)
        row = self.data.iloc[int(index)]
        return {"text": row.get("text", ""), "index": int(index)}


@DATASETS.register_module("cached_video_text")
class CachedVideoTextDataset:
    """Precomputed latents + text embeddings (reference datasets.py:250-316):
    each row points at .npy files for video latents / T5 / CLIP embeddings."""

    bucket_class = "Bucket"

    def __init__(self, data_path: str, **_):
        self.data_path = data_path
        self.data = read_data_file(data_path)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx: int) -> Optional[dict]:
        row = self.data.iloc[int(idx)]
        try:
            out = {
                "video_latents": np.load(row["latent_path"]),
                "text_t5": np.load(row["t5_path"]),
                "text_clip": np.load(row["clip_path"]),
                "index": int(idx),
            }
            if "text" in row:
                out["text"] = row["text"]
            return out
        except Exception:
            return None
