"""Inference-side conditioning, prompt utilities, and output saving.

Behavioral reference: opensora/utils/inference.py (fps/motion prompt suffixes
:186-208, add_noise_to_ref:210-214, collect_references_batch:216-281,
prepare_inference_condition:283-351, save helpers :101-163 +
opensora/datasets/utils.py:202-234).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# prompt utilities
# ----------------------------------------------------------------------


def ensure_sentence_ends_with_period(sentence: str) -> str:
    sentence = sentence.strip()
    if not sentence.endswith("."):
        sentence += "."
    return sentence


def check_fps_added(sentence: str) -> bool:
    return sentence.endswith(" FPS.")


def add_fps_info_to_text(text: List[str], fps: int = 16) -> List[str]:
    out = []
    for item in text:
        item = ensure_sentence_ends_with_period(item)
        if not check_fps_added(item):
            item = item + f" {fps} FPS."
        out.append(item)
    return out


def add_motion_score_to_text(text: List[str], motion_score) -> List[str]:
    """'dynamic' GPT-scored motion is not available offline; a fixed score is
    appended (the reference calls GPT for 'dynamic', inference.py:199-207)."""
    if motion_score == "dynamic":
        motion_score = 5
    return [f"{t} {motion_score} motion score." for t in text]


# ----------------------------------------------------------------------
# reference conditioning
# ----------------------------------------------------------------------


def add_noise_to_ref(
    masked_ref: jnp.ndarray,
    masks: jnp.ndarray,
    t: float,
    rng: jax.Array,
    sigma_min: float = 1e-5,
) -> jnp.ndarray:
    z1 = jax.random.normal(rng, masked_ref.shape, jnp.float32).astype(masked_ref.dtype)
    z_noisy = (1 - (1 - sigma_min) * t) * masked_ref + t * z1
    return masks * z_noisy


def collect_references_batch(
    reference_paths: List[str],
    cond_type: str,
    ae_encode,
    image_size,
    is_causal: bool = False,
):
    """Encode reference media into latents per conditioning type
    (reference inference.py:216-281). ``ae_encode``: (B,C,T,H,W) → latents."""
    from opensora_tpu.datasets.utils import read_from_path

    refs_x = []
    for reference_path in reference_paths:
        if reference_path == "" or reference_path is None:
            refs_x.append(None)
            continue
        ref_path = str(reference_path).split(";")
        ref = []
        if "v2v" in cond_type:
            r = read_from_path(ref_path[0], image_size, transform_name="resize_crop")
            actual_t = r.shape[1]
            target_t = 64 if (actual_t >= 64 and "easy" in cond_type) else 32
            if is_causal:
                target_t += 1
            assert actual_t >= target_t, (
                f"need at least {target_t} reference frames for v2v generation"
            )
            r = r[:, :target_t] if "head" in cond_type else r[:, -target_t:]
            ref.append(ae_encode(r[None])[0])
        elif cond_type == "i2v_head":
            r = read_from_path(ref_path[0], image_size, transform_name="resize_crop")
            ref.append(ae_encode(r[None, :, :1])[0])
        elif cond_type == "i2v_tail":
            r = read_from_path(ref_path[-1], image_size, transform_name="resize_crop")
            ref.append(ae_encode(r[None, :, -1:])[0])
        elif cond_type == "i2v_loop":
            r_head = read_from_path(ref_path[0], image_size, transform_name="resize_crop")
            ref.append(ae_encode(r_head[None, :, :1])[0])
            r_tail = read_from_path(ref_path[-1], image_size, transform_name="resize_crop")
            ref.append(ae_encode(r_tail[None, :, -1:])[0])
        else:
            raise NotImplementedError(f"Unknown condition type {cond_type}")
        refs_x.append(ref)
    return refs_x


def prepare_inference_condition(
    z: jnp.ndarray,
    mask_cond: str,
    ref_list=None,
    causal: bool = True,
):
    """Build (masks, masked_z) for i2v/v2v conditioning
    (reference inference.py:283-351). Host-side numpy assembly, device arrays out."""
    B, C, T, H, W = z.shape
    masks = np.zeros((B, 1, T, H, W), np.float32)
    masked_z = np.zeros((B, C, T, H, W), np.float32)

    if ref_list is None:
        assert mask_cond == "t2v", f"reference is required for {mask_cond}"
        ref_list = [None] * B

    for i in range(B):
        ref = ref_list[i]
        if ref is None and mask_cond != "t2v":
            continue
        if ref is not None and T > 1:
            if mask_cond == "i2v_head":
                masks[i, :, 0] = 1
                masked_z[i, :, 0] = np.asarray(ref[0][:, 0], np.float32)
            elif mask_cond == "i2v_tail":
                masks[i, :, -1] = 1
                masked_z[i, :, -1] = np.asarray(ref[-1][:, -1], np.float32)
            elif mask_cond in ("v2v_head", "v2v_tail", "v2v_head_easy", "v2v_tail_easy"):
                k = (16 if "easy" in mask_cond else 8) + int(causal)
                if "head" in mask_cond:
                    masks[i, :, :k] = 1
                    masked_z[i, :, :k] = np.asarray(ref[0][:, :k], np.float32)
                else:
                    masks[i, :, -k:] = 1
                    masked_z[i, :, -k:] = np.asarray(ref[0][:, -k:], np.float32)
            elif mask_cond == "i2v_loop":
                masks[i, :, 0] = 1
                masks[i, :, -1] = 1
                masked_z[i, :, 0] = np.asarray(ref[0][:, 0], np.float32)
                masked_z[i, :, -1] = np.asarray(ref[-1][:, -1], np.float32)
            else:
                assert mask_cond == "t2v", f"Unknown mask condition {mask_cond}"

    return jnp.asarray(masks, z.dtype), jnp.asarray(masked_z, z.dtype)


# ----------------------------------------------------------------------
# output saving
# ----------------------------------------------------------------------


def save_sample(
    x: np.ndarray,
    save_path: str,
    fps: int = 16,
) -> str:
    """Save (C, T, H, W) in [-1, 1] as png (T==1) or mp4 (reference
    datasets/utils.py:202-234; cv2 replaces pyav for encode)."""
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(save_path)), exist_ok=True)
    x = np.asarray(x, np.float32)
    x = np.clip((x + 1) / 2, 0, 1)
    x = (x * 255).astype(np.uint8)
    x = np.transpose(x, (1, 2, 3, 0))  # (T, H, W, C)
    if x.shape[0] == 1:
        save_path = save_path + ".png"
        cv2.imwrite(save_path, cv2.cvtColor(x[0], cv2.COLOR_RGB2BGR))
    else:
        save_path = save_path + ".mp4"
        t, h, w, _ = x.shape
        writer = cv2.VideoWriter(
            save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        for frame in x:
            writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        writer.release()
    return save_path


def process_and_save(
    x: np.ndarray,
    ids,
    save_dir: str,
    sub_dir: str = "",
    fps: int = 16,
    prompts: Optional[List[str]] = None,
) -> List[str]:
    out_dir = os.path.join(save_dir, sub_dir) if sub_dir else save_dir
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, idx in enumerate(ids):
        path = save_sample(x[i], os.path.join(out_dir, f"sample_{idx:04d}"), fps=fps)
        if prompts is not None:
            with open(os.path.join(out_dir, f"sample_{idx:04d}.txt"), "w") as f:
                f.write(prompts[i])
        paths.append(path)
    return paths
