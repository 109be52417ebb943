"""Interpret-mode validation of the colfix hole fill (round 4).

Renders the fold-heavy low-density scene (the scan path's worst case) with
colfix off / K=1 / K=2 and scores each against the numpy oracle. The fixup
must strictly reduce oracle disagreements: holes it fills are pixels the
oracle covers; it must not FLIP pixels the base path already had right
(beyond legitimate nearer-winner replacements, which also count as fixes
when they match the oracle).

Run: python experiments/colfix_check.py
"""
import os

os.environ.setdefault("DEPTHRENDERER_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import dataclasses
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from jax.experimental.pallas import tpu as pltpu

from depthrenderer_tpu import transforms
from depthrenderer_tpu.ops import raster_reference, raster_scan
from depthrenderer_tpu.transforms import Axis
from test_raster import scene  # noqa: E402  (fold-heavy random-depth scene)


def checker(sz=64):
    c = np.zeros((sz, sz, 4), np.uint8)
    yy, xx = np.mgrid[0:sz, 0:sz]
    c[..., 0] = (xx * 4) % 256
    c[..., 1] = (yy * 4) % 256
    c[..., 2] = np.where((xx // 4 + yy // 4) % 2 == 0, 255, 32)
    c[..., 3] = 255
    return c.astype(np.float32)


def render(verts, uvs, mvp, tex, W, H, cfg):
    n = int(np.sqrt(len(verts)))
    with pltpu.force_tpu_interpret_mode():
        return np.asarray(raster_scan.render_frame_scan(
            mvp, verts.reshape(n, n, 3), uvs.reshape(n, n, 2), tex,
            W, H, cfg, "texture", interpret=True))


def main():
    verts, uvs, idx, mvp, _ = scene(density=3, size=(24, 32), seed=1)
    mvp = (mvp @ np.asarray(
        transforms.rotation(np.deg2rad(4.0), axis=Axis.Y))).astype(np.float32)
    W, H = 64, 48
    tex = checker()
    want = np.asarray(raster_reference.rasterize_reference(
        verts, uvs, idx, mvp, tex.astype(np.uint8), W, H))

    base_cfg = raster_scan.ScanConfig(rmax=16, cw=128, sr=8, off=3)
    base = render(verts, uvs, mvp, tex, W, H, base_cfg)

    def flips(img):
        return (np.abs(img.astype(int) - want.astype(int)).max(-1) > 8)

    fb = flips(base)
    print(f"base: {fb.sum()} oracle flips ({fb.mean()*100:.2f}%)")
    rc = 0
    for K in (1, 2):
        out = render(verts, uvs, mvp, tex, W, H,
                     dataclasses.replace(base_cfg, colfix=K))
        fx = flips(out)
        fixed = int((fb & ~fx).sum())
        broke = int((~fb & fx).sum())
        print(f"colfix K={K}: {fx.sum()} flips ({fx.mean()*100:.2f}%)  "
              f"fixed {fixed}  broke {broke}")
        if fx.sum() > fb.sum() or broke > max(2, fixed // 8):
            print(f"  FAIL: K={K} regressed vs base")
            rc = 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
