"""Interpret-mode A/B of the MXU exclusive-hit march vs the dense sweep.

Renders the random-heightfield scene (strong displacement for folds, so the
multi-hit fallback branch is exercised too) with ``mxu_march`` off and on at
otherwise-identical hyps=1 configs and reports flip counts. Expected: zero
>0-LSB differences except the documented cnt=0 deviation (column-0 fetch
instead of the dense sweep's FAR-keyed column — both exact-reject, so frames
should be byte-identical; any differences at all are reported for triage).

Run: python experiments/mxu_march_check.py
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
    verts[:, 2] *= displacement / 2.55  # strong folds
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


def main():
    vgrid, uvgrid, proj, cam = scene()
    tex = checker()
    W, H = 128, 96
    sway = animation.default_sway(2.0)
    times = animation.frame_times(2, 24.0)
    views = np.asarray(sway.batch(times))
    mvps = (proj[None] @ (cam[None] @ views)).astype(np.float32)

    base = raster_scan.ScanConfig(rmax=24, cw=128, sr=8, off=3, hyps=1)
    for name, cfg in [
        ("dense", base),
        ("mxu", dataclasses.replace(base, mxu_march=True)),
    ]:
        frames = np.asarray(raster_scan.render_frames_scan(
            mvps, vgrid, uvgrid, tex, W, H, cfg, frame_batch=2,
            interpret=True))
        if name == "dense":
            ref = frames
            cov = (frames[..., :3].sum(-1) > 0).mean()
            print(f"dense: coverage {cov:.3f}")
        else:
            d = np.abs(frames.astype(int) - ref.astype(int)).max(-1)
            print(f"{name}: diff px {(d > 0).sum()}/{d.size} "
                  f"(frac {(d > 0).mean():.5f}), max {d.max()}, "
                  f"flips>8 {(d > 8).sum()}")
            cov_m = (frames[..., :3].sum(-1) > 0)
            cov_r = (ref[..., :3].sum(-1) > 0)
            print(f"  coverage flips: mxu-only {np.sum(cov_m & ~cov_r)}, "
                  f"dense-only {np.sum(cov_r & ~cov_m)}")


if __name__ == "__main__":
    main()
