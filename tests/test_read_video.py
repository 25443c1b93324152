"""Video IO: the gated pyav reader, the cv2 fallback, and the
corrupt-file → None path that feeds the None-filtering collate
(reference opensora/datasets/read_video.py:18-257)."""

import numpy as np
import pytest

from opensora_tpu.datasets.read_video import (
    have_av,
    read_video_any,
    read_video_safe,
)


def _write_demo_mp4(path, t=12, h=48, w=64, fps=24):
    cv2 = pytest.importorskip("cv2")
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert vw.isOpened(), "cv2 mp4v writer unavailable"
    rng = np.random.default_rng(0)
    for i in range(t):
        frame = np.full((h, w, 3), i * 10 % 255, np.uint8)
        frame[:, :, 0] = rng.integers(0, 255, (h, w), np.uint8)
        vw.write(frame)
    vw.release()
    return str(path)


def test_read_video_roundtrip(tmp_path):
    path = _write_demo_mp4(tmp_path / "demo.mp4")
    video, fps = read_video_any(path)
    assert video.shape[0] == 3 and video.shape[1] == 12
    assert video.shape[2:] == (48, 64)
    assert video.dtype == np.float32
    assert 0.0 <= video.min() and video.max() <= 255.0
    assert abs(fps - 24.0) < 0.5


def test_read_video_sampling_and_cap(tmp_path):
    path = _write_demo_mp4(tmp_path / "demo.mp4", t=16)
    video, _ = read_video_any(path, max_frames=3, sampling_interval=2)
    assert video.shape[1] == 3


def test_corrupt_file_returns_none(tmp_path):
    bad = tmp_path / "corrupt.mp4"
    bad.write_bytes(b"\x00\x01garbage-not-a-video" * 64)
    assert read_video_safe(str(bad)) is None
    assert read_video_safe(str(tmp_path / "missing.mp4")) is None


def test_url_requires_pyav():
    if have_av():
        pytest.skip("pyav present: URL path is live, not gated")
    with pytest.raises(NotImplementedError):
        read_video_any("http://example.com/video.mp4")


@pytest.mark.skipif(not have_av(), reason="pyav not in this image")
def test_pyav_matches_cv2(tmp_path):
    from opensora_tpu.datasets.read_video import read_video_av
    from opensora_tpu.datasets.utils import read_video as cv2_read

    path = _write_demo_mp4(tmp_path / "demo.mp4")
    va, fa = read_video_av(path)
    vc, fc = cv2_read(path)
    assert va.shape == vc.shape
    assert abs(fa - fc) < 0.5
    # same codec, same decoder family — frames should agree closely
    assert np.abs(va - vc).mean() < 2.0
