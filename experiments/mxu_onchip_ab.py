"""On-chip byte A/B of the MXU exclusive-hit march at the production config.

Renders one 16-frame group of the bench clip (NYU scene, d10/1080p, sway)
with ``mxu_march`` off and on and compares raw bytes. Expected: byte-identical
except the documented cnt=0 lane deviation (column-0 fetch vs the dense
sweep's FAR-keyed column — both exact-reject), i.e. zero differing pixels.

Run on the TPU box: python experiments/mxu_onchip_ab.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import dataclasses

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from depthrenderer_tpu import animation, io, meshgen, transforms
from depthrenderer_tpu.ops import raster_scan

SAMPLES = "/root/reference/samples"


def main():
    colour = io.load_colour(f"{SAMPLES}/00000_colors.png")
    depth = io.load_depth(f"{SAMPLES}/00000_depth.png")
    verts, uvs, _ = meshgen.grid_mesh(depth, 10)
    n = 2**10 + 1
    W, H = 1920, 1080
    proj = np.asarray(transforms.perspective(18.0, W / H))
    cam = np.asarray(transforms.translation(dz=-10.0))
    sway = animation.default_sway(5.0)
    times = animation.frame_times(16, 60.0)
    views = np.asarray(sway.batch(times))
    mvps = (proj[None] @ (cam[None] @ views)).astype(np.float32)

    vgrid = jax.device_put(np.asarray(verts).reshape(n, n, 3))
    uvgrid = jax.device_put(np.asarray(uvs).reshape(n, n, 2))
    tex = jax.device_put(colour.astype(np.float32))

    cfg = raster_scan.suggest_scan_config(n, W, H)
    frames = {}
    for name, c in [("dense", cfg),
                    ("mxu", dataclasses.replace(cfg, mxu_march=True))]:
        t0 = time.perf_counter()
        out = raster_scan.render_frames_scan(
            mvps, vgrid, uvgrid, tex, W, H, c, frame_batch=16, raw_u32=True)
        out.block_until_ready()
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = raster_scan.render_frames_scan(
            mvps, vgrid, uvgrid, tex, W, H, c, frame_batch=16, raw_u32=True)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        frames[name] = np.asarray(out)
        print(f"{name}: compile+1st {tc:.1f}s, steady {dt * 1000 / 16:.2f} "
              f"ms/frame ({16 / dt:.1f} fps)")

    a, b = frames["dense"], frames["mxu"]
    u8a = a.view(np.uint8).reshape(16, -1, a.shape[-1], 4)[:, :H, :W]
    u8b = b.view(np.uint8).reshape(16, -1, b.shape[-1], 4)[:, :H, :W]
    d = np.abs(u8a.astype(int) - u8b.astype(int)).max(-1)
    print(f"diff px {(d > 0).sum()}/{d.size} (frac {(d > 0).mean():.6f}), "
          f"max {d.max()}, flips>8 {(d > 8).sum()}")


if __name__ == "__main__":
    main()
