"""Interpret-mode equivalence of 2-bands-per-step vs 1 (round 4 band merge).

Renders the fold-heavy scene at an ODD band count (H = 40 -> 5 bands, so the
pad-band machinery runs: zeroed bounds + mid = -2) and at an even one, with
``_BANDS_PER_STEP`` pinned to 1 and 2, and requires byte-identical frames.
Covers texture mode (raw u32), texture_z (quality merge keys) via the patch
pipeline, and attrs mode via the row_edge quality path.

Run: python experiments/band_merge_check.py
"""
import os

os.environ.setdefault("DEPTHRENDERER_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import dataclasses
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthrenderer_tpu import animation, meshgen, transforms
from depthrenderer_tpu.ops import raster_scan


def scene(density=4, size=(48, 64), seed=3, displacement=10.0):
    rng = np.random.default_rng(seed)
    depth = rng.integers(0, 256, size=size, dtype=np.uint8)
    verts, uvs, _ = meshgen.grid_mesh(depth, density)
    n = 2**density + 1
    verts = np.asarray(verts).copy()
    verts[:, 2] *= displacement / 2.55
    proj = np.asarray(transforms.perspective(18.0, size[1] / size[0]))
    cam = np.asarray(transforms.translation(dz=-10.0))
    return verts.reshape(n, n, 3), np.asarray(uvs).reshape(n, n, 2), proj, cam


def checker(sz=64):
    c = np.zeros((sz, sz, 4), np.uint8)
    yy, xx = np.mgrid[0:sz, 0:sz]
    c[..., 0] = (xx * 4) % 256
    c[..., 1] = (yy * 4) % 256
    c[..., 2] = np.where((xx // 4 + yy // 4) % 2 == 0, 255, 32)
    c[..., 3] = 255
    return c.astype(np.float32)


def render(mvps, vgrid, uvgrid, tex, W, H, cfg):
    return np.asarray(raster_scan.render_frames_scan(
        mvps, vgrid, uvgrid, tex, W, H, cfg, frame_batch=2, interpret=True))


def main():
    vgrid, uvgrid, proj, cam = scene()
    tex = checker()
    sway = animation.default_sway(2.0)
    times = animation.frame_times(2, 24.0)
    views = np.asarray(sway.batch(times))
    mvps = (proj[None] @ (cam[None] @ views)).astype(np.float32)

    base = raster_scan.ScanConfig(rmax=24, cw=128, sr=8, off=3, hyps=1)
    cases = [
        ("texture W=128 H=40 (ODD 5 bands)", 128, 40, base),
        ("patch (texture_z + sparse) W=128 H=96", 128, 96,
         dataclasses.replace(base, patch=True)),
    ]
    fails = 0
    for name, W, H, cfg in cases:
        outs = {}
        for bps in (1, 2):
            raster_scan._BANDS_PER_STEP = bps
            outs[bps] = render(mvps, vgrid, uvgrid, tex, W, H, cfg)
        raster_scan._BANDS_PER_STEP = 1  # restore the measured default
        same = np.array_equal(outs[1], outs[2])
        d = np.abs(outs[1].astype(int) - outs[2].astype(int)).max()
        print(f"{name}: {'IDENTICAL' if same else f'DIFFERS (max {d})'}")
        fails += 0 if same else 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
