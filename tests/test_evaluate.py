"""Tests for the quality-evaluation utilities."""

import numpy as np

from depthrenderer_tpu import evaluate, video


def test_discontinuity_mask():
    depth = np.zeros((16, 16), np.uint8)
    depth[:, 8:] = 200  # vertical step at column 8
    mask = evaluate.discontinuity_mask(depth, threshold=16, dilate=2)
    assert mask[5, 8] and mask[5, 7] and mask[5, 10]
    assert not mask[5, 2] and not mask[5, 14]


def test_masked_psnr_excludes_edges():
    depth = np.zeros((16, 16), np.uint8)
    depth[:, 8:] = 200
    a = np.zeros((16, 16, 3), np.uint8)
    b = a.copy()
    b[:, 7:10] = 255  # huge error, but only at the depth edge
    assert evaluate.masked_psnr(a, b) < 20
    assert evaluate.masked_psnr(a, b, depth, dilate=3) == float("inf")


def test_compare_videos(tmp_path):
    a, b = tmp_path / "a.avi", tmp_path / "b.avi"
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(3)]
    for path, noise in ((a, 0), (b, 2)):
        with video.AviFile(path, (32, 24), fps=8, codec="DIB ") as f:
            for fr in frames:
                f.write(np.clip(fr.astype(int) + noise, 0, 255).astype(np.uint8))
    vals = evaluate.compare_videos(str(a), str(b))
    assert len(vals) == 3
    assert all(v > 35 for v in vals)  # +2 offset ≈ 42 dB
