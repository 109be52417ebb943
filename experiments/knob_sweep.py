"""Decompose the scan's stretched-candidate flip class at the bench config.

Renders frame 0 of the d10/1080p sway path with the production scan config
and with each quality knob individually relaxed, comparing each against the
LOSSLESS tiled grid render. Whichever knob's relaxation removes the most
flips identifies the dominant candidate-loss mechanism:

  nbr (slots/column)    -> slot overflow at multi-crossing folds
  dmax (realign cap)    -> neighbour-strip misalignment at steep folds
  sr/off (strip span)   -> cells outside the captured strip
  cw (march window)     -> bracket columns outside the window

Usage: python experiments/knob_sweep.py [--view 40]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--view", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from depthrenderer_tpu import animation, io as dio, meshgen, transforms
    from depthrenderer_tpu.ops import raster_scan
    from depthrenderer_tpu.ops.raster_grid import (measured_config,
                                                   render_frames_grid)
    from depthrenderer_tpu.utils import psnr

    W, H, D = 1920, 1080, 10
    n = 2**D + 1
    colour = dio.load_colour("/root/reference/samples/00000_colors.png")
    depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                       (H, W))
    texture = dio.resize(colour, (H, W)).astype(np.float32)
    verts, uvs, _ = meshgen.grid_mesh(depth, D)
    verts = np.asarray(verts).copy()
    verts[:, 2] *= 4.0
    vgrid = jax.device_put(verts.reshape(n, n, 3))
    uvgrid = jax.device_put(np.asarray(uvs).reshape(n, n, 2))
    tex_dev = jax.device_put(texture)

    sway = animation.default_sway(5.0)
    times = animation.frame_times(64, 60.0)
    views = np.asarray(sway.batch(times))
    proj = np.asarray(transforms.perspective(18.0, W / H))
    cam = np.asarray(transforms.translation(dz=-10.0))
    mvps = (proj[None] @ (cam[None] @ views)).astype(np.float32)
    mvp1 = mvps[args.view:args.view + 1]

    # Lossless grid reference (row_anchors=2 default from measured_config).
    gcfg = measured_config(mvps, np.asarray(vgrid), W, H)
    ref = np.asarray(render_frames_grid(
        mvp1, vgrid, uvgrid, tex_dev, W, H, gcfg, frame_batch=1))[0]

    def run(tag, **overrides):
        cfg = raster_scan.suggest_scan_config(n, W, H, **overrides)
        if not raster_scan._vmem_budget_ok(n, cfg):
            print(f"{tag:>28}: skipped (VMEM budget)", flush=True)
            return None
        raw = raster_scan.render_frames_scan(
            mvp1, vgrid, uvgrid, tex_dev, W, H, cfg, frame_batch=1,
            raw_u32=True)
        f = raster_scan.unpack_raw_frames(np.asarray(raw), W, H)[0]
        d = np.abs(f.astype(int) - ref.astype(int)).max(-1)
        flips = (d > 8).mean()
        print(f"{tag:>28}: flips {flips * 100:6.3f}%  psnr {psnr(f, ref):6.2f} dB"
              f"  ({cfg})", flush=True)
        return flips

    import traceback

    for tag, ov in [
        ("production default", {}),
        ("nbr=3", {"nbr": 3}),
        ("nbr=4", {"nbr": 4}),
        ("dmax=None (full realign)", {"dmax": None}),
        ("sr=12/off=5", {"sr": 12, "off": 5}),
        ("sr=14/off=6", {"sr": 14, "off": 6}),
        ("cw=384", {"cw": 384}),
        ("hyps=1 (cost check)", {"hyps": 1}),
        ("all relaxed", {"nbr": 3, "dmax": None, "sr": 14, "off": 6,
                         "cw": 384}),
    ]:
        try:
            run(tag, **ov)
        except Exception:
            traceback.print_exc()
            print(f"{tag:>28}: FAILED", flush=True)


if __name__ == "__main__":
    main()
