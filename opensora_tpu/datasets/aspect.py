"""Aspect-ratio and resolution geometry.

Behavioral reference: opensora/datasets/aspect.py:4-151. All (height, width)
pairs snap to multiples of the AE spatial stride D (env/config
``AE_SPATIAL_COMPRESSION``, default 16). In training mode the pair is nudged
by ±D to best match the target pixel budget; duplicates are dropped.

This math is framework-neutral and must match the reference exactly — bucket
shapes define the set of compiled XLA programs, so any drift changes the
compilation-cache footprint and breaks checkpoint-resume bucket statistics.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

from opensora_tpu.utils.config import ae_spatial_compression

# width:height names, ordered by decreasing width/height ratio
ASPECT_RATIO_LD_LIST = [
    "2.39:1",  # cinemascope
    "2:1",
    "16:9",
    "1.85:1",  # american widescreen
    "9:16",
    "5:8",
    "3:2",
    "4:3",
    "1:1",
]


def get_ratio(name: str) -> float:
    """height / width for a 'W:H' ratio name."""
    width, height = map(float, name.split(":"))
    return height / width


def get_aspect_ratios_dict(
    total_pixels: int = 256 * 256, training: bool = True
) -> Dict[str, Tuple[int, int]]:
    D = ae_spatial_compression()
    out: Dict[str, Tuple[int, int]] = {}
    vertical: Dict[str, Tuple[int, int]] = {}
    for ratio in ASPECT_RATIO_LD_LIST:
        wr, hr = map(float, ratio.split(":"))
        width = int(math.sqrt(total_pixels * (wr / hr)) // D) * D
        height = int((total_pixels / width) // D) * D

        if training:
            # nudge by ±D toward the exact pixel budget
            best = (height, width)
            best_diff = abs(height * width - total_pixels)
            for h, w in (
                (height - D, width),
                (height + D, width),
                (height, width - D),
                (height, width + D),
            ):
                if abs(h * w - total_pixels) < best_diff:
                    best, best_diff = (h, w), abs(h * w - total_pixels)
            height, width = best

        if (height, width) not in out.values() or not training:
            out[ratio] = (height, width)
            vertical[":".join(ratio.split(":")[::-1])] = (width, height)

    out.update(vertical)
    return out


def get_num_pixels(aspect_ratios_dict: Dict[str, Tuple[int, int]]) -> Dict[str, int]:
    return {r: h * w for r, (h, w) in aspect_ratios_dict.items()}


def get_num_tokens(aspect_ratios_dict: Dict[str, Tuple[int, int]]) -> Dict[str, int]:
    D = ae_spatial_compression()
    return {r: h * w // D // D for r, (h, w) in aspect_ratios_dict.items()}


def get_num_pixels_from_name(resolution: str) -> int:
    """'256px' → 256², '360p' → 360² · 16/9 (reference aspect.py:66-77)."""
    resolution = resolution.split("_")[0]
    if resolution.endswith("px"):
        size = int(resolution[:-2])
        return size * size
    if resolution.endswith("p"):
        size = int(resolution[:-1])
        return int(size * size / 9 * 16)
    raise ValueError(f"Invalid resolution {resolution}")


def get_resolution_with_aspect_ratio(
    resolution: str,
) -> Tuple[int, Dict[str, Tuple[int, int]]]:
    """Resolve '256px' / '360p_ar1:1' / '768px_max' to (pixels, {ar: (h,w)})."""
    keys = resolution.split("_")
    if len(keys) == 1:
        name, setting = keys[0], ""
    else:
        name, setting = keys
        assert setting == "max" or setting.startswith("ar"), (
            f"Invalid setting {setting}"
        )

    num_pixels = get_num_pixels_from_name(name)
    ar_dict = get_aspect_ratios_dict(num_pixels)

    if setting == "max":
        ar = max(ar_dict, key=lambda x: ar_dict[x][0] * ar_dict[x][1])
        ar_dict = {ar: ar_dict[ar]}
    elif setting.startswith("ar"):
        ar = setting[2:]
        assert ar in ar_dict, f"Aspect ratio {ar} not found"
        ar_dict = {ar: ar_dict[ar]}

    return num_pixels, ar_dict


def get_closest_ratio(height: float, width: float, ratios: Dict) -> str:
    aspect = height / width
    return min(ratios.keys(), key=lambda r: abs(aspect - get_ratio(r)))


def get_image_size(resolution: str, ar_ratio: str, training: bool = True) -> Tuple[int, int]:
    num_pixels = get_num_pixels_from_name(resolution)
    ar_dict = get_aspect_ratios_dict(num_pixels, training)
    assert ar_ratio in ar_dict, f"Aspect ratio {ar_ratio} not found"
    return ar_dict[ar_ratio]


def bucket_to_shapes(bucket_config: Dict, batch_size: int | None = None):
    """Enumerate (bs, 3, T, H, W) shapes a bucket config can emit — used to
    pre-compile/warm the AE over all shapes (reference aspect.py:139-151)."""
    shapes = []
    for resolution, infos in bucket_config.items():
        for num_frames, (_, bs) in infos.items():
            ar_dict = get_aspect_ratios_dict(get_num_pixels_from_name(resolution))
            for _, (height, width) in ar_dict.items():
                shapes.append(
                    (batch_size if batch_size is not None else bs, 3, num_frames, height, width)
                )
    return shapes
