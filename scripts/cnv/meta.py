"""Dataset metadata extraction: height/width/fps/num_frames per media file.

Behavioral reference: scripts/cnv/meta.py:22 — walks a csv of paths (or a
directory) and writes the columns the bucket sampler needs.

Usage: python scripts/cnv/meta.py INPUT.csv OUTPUT.csv
       python scripts/cnv/meta.py /data/videos OUTPUT.csv
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import pandas as pd

from opensora_tpu.datasets.utils import IMG_EXTENSIONS, VID_EXTENSIONS, is_img


def probe(path: str):
    import cv2

    if is_img(path):
        img = cv2.imread(path)
        if img is None:
            return None
        h, w = img.shape[:2]
        return dict(height=h, width=w, num_frames=1, fps=0.0)
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return None
    try:
        return dict(
            height=int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            width=int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            num_frames=int(cap.get(cv2.CAP_PROP_FRAME_COUNT)),
            fps=float(cap.get(cv2.CAP_PROP_FPS) or 0.0),
        )
    finally:
        cap.release()


def main():
    src, dst = sys.argv[1], sys.argv[2]
    if os.path.isdir(src):
        exts = IMG_EXTENSIONS + VID_EXTENSIONS
        paths = [
            os.path.join(r, f)
            for r, _, fs in os.walk(src)
            for f in fs
            if os.path.splitext(f)[1].lower() in exts
        ]
        df = pd.DataFrame({"path": sorted(paths)})
    else:
        df = pd.read_csv(src)

    rows = []
    for _, row in df.iterrows():
        meta = probe(row["path"])
        if meta is None:
            continue
        rows.append({**row.to_dict(), **meta})
    out = pd.DataFrame(rows)
    out.to_csv(dst, index=False)
    print(f"wrote {len(out)}/{len(df)} rows to {dst}")


if __name__ == "__main__":
    main()
