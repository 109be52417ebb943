"""Split the scan-vs-GL quality gap into shade-window-clamp vs candidate error.

Renders views with the SAME scan kernel but the legacy exact XLA shade
(attrs mode + _shade_scan_batched, which gathers from the full texture with
no window clamp), and reports masked PSNR vs the GL goldens next to the
in-kernel-shade numbers. If the exact-shade PSNR matches the tiled grid's own
GL floor, the whole scan gap is the texture-window clamp.

Usage: python experiments/shade_gap.py [--config d10|d12]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="d10", choices=("d10", "d12"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from PIL import Image

    from depthrenderer_tpu import animation, io as dio, meshgen, transforms
    from depthrenderer_tpu.evaluate import masked_psnr
    from depthrenderer_tpu.ops import raster_scan

    if args.config == "d10":
        W, H, D = 1920, 1080, 10
        goldens = {"frontal": "tests/goldens/gl_sample_d10_1080p_frontal.png",
                   "sway:40": "tests/goldens/gl_sample_d10_1080p_sway40.png"}
    else:
        W, H, D = 3840, 2160, 12
        goldens = {"frontal": "tests/goldens/gl_sample_4k_d12_frontal.png",
                   "sway:40": "tests/goldens/gl_sample_4k_d12_sway40.png"}
    n = 2**D + 1
    colour = dio.load_colour("/root/reference/samples/00000_colors.png")
    depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                       (H, W))
    texture = dio.resize(colour, (H, W)).astype(np.float32)
    verts, uvs, _ = meshgen.grid_mesh(depth, D)
    verts = np.asarray(verts).copy()
    verts[:, 2] *= 4.0
    vgrid = jax.device_put(verts.reshape(n, n, 3))
    tex_dev = jax.device_put(texture)

    proj = np.asarray(transforms.perspective(18.0, W / H))
    cam = np.asarray(transforms.translation(dz=-10.0))
    cfg = raster_scan.suggest_scan_config(n, W, H)
    print("config:", cfg, flush=True)
    dep = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                     (H, W))

    ht, wt = H, W
    rpt = max(-(-ht // 8) * 8, cfg.tex_rows)
    cpt = max(-(-wt // 128) * 128, cfg.tex_cols)
    texq = raster_scan._pack_texture(tex_dev, rpt, cpt)

    for view, gpath in goldens.items():
        mvp = (proj @ cam).astype(np.float32)
        if view.startswith("sway:"):
            k = int(view.split(":")[1])
            v = np.asarray(animation.default_sway(5.0).batch(
                animation.frame_times(64, 60.0)))[k]
            mvp = (proj @ cam @ v).astype(np.float32)
        minv = np.linalg.inv(np.asarray(mvp, np.float64))
        minv_rows = jnp.asarray(
            np.concatenate([minv[2], minv[3]]).astype(np.float32))[None]
        mvps = jnp.asarray(mvp)[None]
        prep = raster_scan._prep_scan_batched(mvps, vgrid, W, H, cfg)
        win, w0, bounds, canch, ovf = prep
        golden = np.asarray(Image.open(gpath))

        # (a) in-kernel shade: (1, HPAD, WL) raw u32 rows
        rgba = raster_scan._raster_scan_pallas(
            win, texq, (ht, wt), minv_rows, w0, bounds, canch, W, H, n, n,
            cfg, mode="texture")
        fk = raster_scan.unpack_raw_frames(np.asarray(rgba), W, H)[0]
        # (b) exact XLA shade from attrs
        bands = raster_scan._raster_scan_pallas(
            win, texq, (ht, wt), minv_rows, w0, bounds, canch, W, H, n, n,
            cfg)
        fx = np.asarray(raster_scan._shade_scan_batched(
            bands, tex_dev, W, H, "texture"))[0]

        for name, f in (("in-kernel", fk), ("exact-XLA", fx)):
            away = masked_psnr(f, golden, depth=dep)
            overall = masked_psnr(f, golden)
            flips = (np.abs(f.astype(int) - golden.astype(int)).max(-1)
                     > 8).mean()
            print(f"{view:>8} {name:>10}: masked {away:6.2f} dB, overall "
                  f"{overall:6.2f} dB, flips {flips * 100:5.2f}%", flush=True)


if __name__ == "__main__":
    main()
