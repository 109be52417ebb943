"""Quality evaluation: PSNR between renders, with depth-discontinuity masking.

The BASELINE quality criterion is "PSNR vs the OpenGL reference render *away from
depth discontinuities*" — depth-image rendering is inherently ambiguous at depth
edges (rubber-sheet triangles), so comparisons exclude a small neighbourhood of
them. This module provides:

* :func:`discontinuity_mask` — pixels within ``dilate`` px of a strong depth edge.
* :func:`masked_psnr` — PSNR over the unmasked region.
* :func:`compare_videos` / CLI — per-frame PSNR between two AVI renders
  (``python -m depthrenderer_tpu.evaluate a.avi b.avi [--depth d.png]``).
"""

from __future__ import annotations

import argparse

import numpy as np

from .utils import log, psnr


def discontinuity_mask(depth, threshold=16, dilate=3):
    """True where a pixel is within ``dilate`` px of a depth step > ``threshold``.

    :param depth: (H, W) depth map (uint8 convention, as fed to mesh generation).
    """
    depth = np.asarray(depth, np.int32)
    if depth.ndim == 3:
        depth = depth[..., 0]
    edges = np.zeros(depth.shape, bool)
    edges[:, 1:] |= np.abs(np.diff(depth, axis=1)) > threshold
    edges[1:, :] |= np.abs(np.diff(depth, axis=0)) > threshold
    # Chebyshev dilation by `dilate` via shifted ORs.
    out = edges.copy()
    for _ in range(dilate):
        grown = out.copy()
        grown[1:, :] |= out[:-1, :]
        grown[:-1, :] |= out[1:, :]
        grown[:, 1:] |= out[:, :-1]
        grown[:, :-1] |= out[:, 1:]
        out = grown
    return out


def masked_psnr(a, b, depth=None, threshold=16, dilate=3, max_value=255.0):
    """PSNR between two images, excluding depth-discontinuity neighbourhoods.

    With no depth map this is plain PSNR. The mask is resized (nearest) to the
    image size if shapes differ.
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    if depth is None:
        return psnr(a, b, max_value)

    mask = discontinuity_mask(depth, threshold, dilate)
    if mask.shape != a.shape[:2]:
        ys = (np.arange(a.shape[0]) * mask.shape[0] // a.shape[0]).clip(0, mask.shape[0] - 1)
        xs = (np.arange(a.shape[1]) * mask.shape[1] // a.shape[1]).clip(0, mask.shape[1] - 1)
        mask = mask[ys][:, xs]
    keep = ~mask
    if not keep.any():
        return float("nan")
    diff = (a - b)[keep]
    mse = np.mean(diff**2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_value**2 / mse))


def compare_videos(path_a, path_b, depth=None, threshold=16, dilate=3):
    """Per-frame masked PSNR between two videos (AVI or MP4). Returns a list
    of dB values."""
    from .video import read_video_frames

    fa = read_video_frames(path_a)
    fb = read_video_frames(path_b)
    length = min(len(fa), len(fb))
    return [masked_psnr(fa[k], fb[k], depth, threshold, dilate)
            for k in range(length)]


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="python -m depthrenderer_tpu.evaluate",
        description="Per-frame PSNR between two rendered AVI videos, optionally "
        "excluding depth-discontinuity neighbourhoods.",
    )
    p.add_argument("video_a")
    p.add_argument("video_b")
    p.add_argument("--depth", default=None,
                   help="Depth map whose discontinuities are excluded.")
    p.add_argument("--threshold", type=int, default=16)
    p.add_argument("--dilate", type=int, default=3)
    args = p.parse_args(argv)

    depth = None
    if args.depth:
        from . import io as dio

        depth = dio.load_depth(args.depth)

    values = compare_videos(args.video_a, args.video_b, depth,
                            args.threshold, args.dilate)
    for k, v in enumerate(values):
        log(f"frame {k:04d}: {v:.2f} dB")
    finite = [v for v in values if np.isfinite(v)]
    mean = float(np.mean(finite)) if finite else float("inf")
    log(f"mean PSNR over {len(values)} frames: {mean:.2f} dB")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
