"""Diagnose the 4K/d12 (BASELINE #4) scan-vs-GL quality gap.

Renders the frontal view with the production big_grid scan config (as bench
preset 4 does), saves the frame, and reports the spatial structure of the
differences vs the GL golden: per-tile flip-rate map, row/column marginals,
and the diff histogram. Uniform speckle = the sub-pixel coverage floor at
~1-px triangles; structure (128-px periodicity, bands, holes) = a kernel bug.

Usage: python experiments/p4_diff.py [--edge-cull 0.25] [--out /tmp/p4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--edge-cull", type=float, default=0.25,
                    help="Cull threshold; <= 0 disables culling.")
    ap.add_argument("--out", default="/tmp/p4")
    ap.add_argument("--view", default="frontal")
    ap.add_argument("--rmax", type=int, default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from PIL import Image

    from depthrenderer_tpu import io as dio, meshgen, transforms, animation
    from depthrenderer_tpu.ops.raster_scan import (render_frames_scan,
                                                   suggest_scan_config,
                                                   unpack_raw_frames)

    W, H, D = 3840, 2160, 12
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
    texture = jax.device_put(texture)

    proj = np.asarray(transforms.perspective(18.0, W / H))
    cam = np.asarray(transforms.translation(dz=-10.0))
    mvp = (proj @ cam).astype(np.float32)
    if args.view.startswith("sway:"):
        k = int(args.view.split(":")[1])
        v = np.asarray(animation.default_sway(5.0).batch(
            animation.frame_times(64, 60.0)))[k]
        mvp = (proj @ cam @ v).astype(np.float32)

    cull = args.edge_cull if args.edge_cull > 0 else None
    kw = {"edge_cull_threshold": cull}
    if args.rmax:
        kw["rmax"] = args.rmax
    cfg = suggest_scan_config(n, W, H, **kw)
    print("config:", cfg, flush=True)
    raw = render_frames_scan(np.repeat(mvp[None], 4, 0), vgrid, uvgrid,
                             texture, W, H, cfg, frame_batch=4, raw_u32=True)
    f = unpack_raw_frames(np.asarray(raw[:1]), W, H)[0]
    Image.fromarray(f).save(os.path.join(args.out, f"scan_{args.view}.png"))

    gname = ("gl_sample_4k_d12_frontal.png" if args.view == "frontal"
             else "gl_sample_4k_d12_sway40.png")
    golden = np.asarray(Image.open(f"tests/goldens/{gname}"))
    diff = np.abs(f.astype(int) - golden.astype(int)).max(-1)
    flips = diff > 8
    print(f"flip fraction (>8 LSB): {flips.mean():.4f}")
    mse = np.mean((f.astype(np.float64) - golden.astype(np.float64)) ** 2)
    print(f"psnr: {10 * np.log10(255.0**2 / mse):.2f} dB")

    # 128x128 tile flip map: does the error concentrate periodically?
    th, tw = H // 120, W // 128  # 18x30 map
    fm = flips[:th * 120, :tw * 128].reshape(th, 120, tw, 128).mean((1, 3))
    np.save(os.path.join(args.out, f"flipmap_{args.view}.npy"), fm)
    print("tile flip-rate map (rows = y): min %.3f max %.3f" % (fm.min(), fm.max()))
    for r in fm:
        print(" ".join(f"{x:.2f}" for x in r))
    # Column marginal mod 128 (tile-boundary concentration test).
    colmod = np.array([flips[:, c::128].mean() for c in range(128)])
    print("col%%128 marginal: edge(0-3,124-127)=%.4f mid=%.4f" % (
        np.concatenate([colmod[:4], colmod[-4:]]).mean(), colmod[4:-4].mean()))
    rowmod = np.array([flips[r::8].mean() for r in range(8)])
    print("row%%8 marginal:", " ".join(f"{x:.4f}" for x in rowmod))
    # Coverage-only vs colour-only decomposition.
    cov_f = f[..., 3] > 0
    cov_g = golden[..., 3] > 0
    print(f"coverage mismatch: {(cov_f != cov_g).mean():.4f} "
          f"(scan-only {np.logical_and(cov_f, ~cov_g).mean():.4f}, "
          f"gl-only {np.logical_and(~cov_f, cov_g).mean():.4f})")
    both = cov_f & cov_g
    print(f"flips where both covered: {flips[both].mean():.4f}")
    # Save a downscaled diff heat image for eyeballing.
    hm = (np.clip(diff, 0, 64) * 4).astype(np.uint8)
    Image.fromarray(hm[::4, ::4]).save(os.path.join(args.out,
                                                    f"diff_{args.view}.png"))


if __name__ == "__main__":
    main()
