"""Characterise the residual scan-vs-grid flip class at d10/1080p.

The knob sweep (experiments/knob_sweep.py) showed the ~0.84% flip floor does
not respond to any capacity knob (nbr/dmax/sr/cw), so it is either candidates
the column-crossing formulation cannot see, or near-tie z-order flips from
different float paths. This renders BOTH paths in texture AND debug_z mode
(model z as grayscale) and reports, at texture-flipped pixels, the signed
z difference: scan-z systematically FARTHER => missed near candidates;
centred near 0 => depth ties; scan-z NEARER => false/extra coverage.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

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

    # measured_config DEFAULTS to quantile=0.995 / row_anchors=1 — the grid
    # reference the bench cross-checks against is NOT lossless. Compare
    # against both it and the true lossless config (quantile=1, anchors=2).
    gcfg = measured_config(mvps, np.asarray(vgrid), W, H)
    gcfg_ll = measured_config(mvps, np.asarray(vgrid), W, H, quantile=1.0,
                              row_anchors=2)
    print("grid default:", gcfg)
    print("grid lossless:", gcfg_ll)
    scfg = raster_scan.suggest_scan_config(n, W, H)

    def grid(mode, cfg=None):
        return np.asarray(render_frames_grid(
            mvp1, vgrid, uvgrid, tex_dev, W, H, cfg or gcfg, frame_batch=1,
            mode=mode))[0]

    def scan(mode):
        raw = raster_scan.render_frames_scan(
            mvp1, vgrid, uvgrid, tex_dev, W, H, scfg, frame_batch=1,
            raw_u32=True, mode=mode)
        return raster_scan.unpack_raw_frames(np.asarray(raw), W, H)[0]

    gt, st = grid("texture"), scan("texture")
    gz, sz = grid("debug_z"), scan("debug_z")
    gt_ll = grid("texture", gcfg_ll)
    d_ll = np.abs(st.astype(int) - gt_ll.astype(int)).max(-1)
    d_gg = np.abs(gt.astype(int) - gt_ll.astype(int)).max(-1)
    print(f"scan vs LOSSLESS grid flips: {(d_ll > 8).mean() * 100:.3f}%  "
          f"(default grid vs lossless grid: {(d_gg > 8).mean() * 100:.3f}%)")

    d = np.abs(st.astype(int) - gt.astype(int)).max(-1)
    flips = d > 8
    print(f"texture flips: {flips.mean() * 100:.3f}%")

    # debug_z grayscale = clip(model_z, 0, 1) * 255 in channel 0.
    dz = st[..., 0].astype(int) - gt[..., 0].astype(int)  # scan - grid
    dzf = dz[flips]
    nearer = (dzf < -4).mean()   # scan strictly nearer (smaller z)
    farther = (dzf > 4).mean()   # scan strictly farther => missed candidate
    tie = 1 - nearer - farther
    print(f"at flipped pixels: scan NEARER {nearer * 100:.1f}%  "
          f"scan FARTHER {farther * 100:.1f}%  |dz|<=4 (tie) {tie * 100:.1f}%")
    print(f"dz quantiles at flips: {np.percentile(dzf, [5, 25, 50, 75, 95])}")

    # Flip distance to the nearest depth-map discontinuity (dilated edge mask).
    dep = depth.astype(np.int32)
    edge = (np.abs(np.diff(dep, axis=0, prepend=dep[:1])) > 8) | (
        np.abs(np.diff(dep, axis=1, prepend=dep[:, :1])) > 8)
    grow = edge.copy()
    for _ in range(3):  # ~3 px dilation
        g = grow.copy()
        g[1:] |= grow[:-1]
        g[:-1] |= grow[1:]
        g[:, 1:] |= grow[:, :-1]
        g[:, :-1] |= grow[:, 1:]
        grow = g
    print(f"flips within 3 px of a depth edge: {grow[flips].mean() * 100:.1f}%"
          f" (edge-mask area {grow.mean() * 100:.1f}%)")

    # Adjudicate against the real-GL golden when one exists for this view.
    gmap = {0: None, 40: "tests/goldens/gl_sample_d10_1080p_sway40.png"}
    gpath = gmap.get(args.view)
    if gpath and os.path.exists(gpath):
        from PIL import Image

        golden = np.asarray(Image.open(gpath))
        ds = np.abs(st.astype(int) - golden.astype(int)).max(-1) <= 8
        dg = np.abs(gt.astype(int) - golden.astype(int)).max(-1) <= 8
        n_f = flips.sum()
        print(f"at the {n_f} scan-vs-grid flip pixels, GL golden agrees with:"
              f" scan only {np.logical_and(ds, ~dg)[flips].mean() * 100:.1f}%,"
              f" grid only {np.logical_and(dg, ~ds)[flips].mean() * 100:.1f}%,"
              f" neither {np.logical_and(~ds, ~dg)[flips].mean() * 100:.1f}%")


if __name__ == "__main__":
    main()
