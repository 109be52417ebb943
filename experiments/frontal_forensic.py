"""Diagnose the FRONTAL fidelity gap (VERDICT r4 ask #2).

Round-3 fact: at d10/1080p the default scan records 29.3 dB masked vs the
real-GL frontal golden while the lossless grid records 43.1 dB — and quality
mode still sits 8 dB under the grid. Frontal is the minimum-parallax view (a
heightfield seen head-on: no folds, monotone column curves), so the scan
should be near-exact there; something systematic is being averaged away.

This renders the TRUE identity view (proj @ cam — not sway(0), which carries
a +0.15 y translation) with the default AND quality scan configs plus the
lossless grid, then decomposes the flips: nearer/farther/tie by debug_z,
GL-golden adjudication, spatial structure (row/col histograms, pitch-phase
alignment), and saves the masks to /tmp/frontal_forensic.npz for follow-up
without re-rendering.
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from depthrenderer_tpu import io as dio, meshgen, transforms
from depthrenderer_tpu.evaluate import masked_psnr
from depthrenderer_tpu.ops import raster_scan
from depthrenderer_tpu.ops.raster_grid import measured_config, render_frames_grid

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "tests/goldens/gl_sample_d10_1080p_frontal.png")

W, H, D = 1920, 1080, 10
n = 2**D + 1
colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   (H, W))
texture = dio.resize(colour, (H, W)).astype(np.float32)
verts, uvs, _ = (np.asarray(a) for a in meshgen.grid_mesh(depth, D))
verts = verts.copy()
verts[:, 2] *= 4.0
vgrid = jax.device_put(verts.reshape(n, n, 3))
uvgrid = jax.device_put(np.asarray(uvs).reshape(n, n, 2))
tex_dev = jax.device_put(texture)

proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
mvp = (proj @ cam).astype(np.float32)
mvps16 = np.repeat(mvp[None], 16, axis=0)  # cached kernel group shape

gcfg_ll = measured_config(mvp[None], verts.reshape(n, n, 3), W, H,
                          quantile=1.0, row_anchors=2)
print("grid lossless:", gcfg_ll, flush=True)


def grid(mode):
    return np.asarray(render_frames_grid(
        mvp[None], vgrid, uvgrid, tex_dev, W, H, gcfg_ll, frame_batch=1,
        mode=mode))[0]


def scan(cfg, mode="texture"):
    if mode == "texture" and not cfg.row_edge:
        raw = raster_scan.render_frames_scan(
            mvps16, vgrid, uvgrid, tex_dev, W, H, cfg, raw_u32=True)
        return raster_scan.unpack_raw_frames(np.asarray(raw[:1]), W, H)[0]
    return np.asarray(raster_scan.render_frames_scan(
        mvps16, vgrid, uvgrid, tex_dev, W, H, cfg, mode=mode))[0]


cfg_def = raster_scan.suggest_scan_config(n, W, H)
cfg_q = raster_scan.suggest_scan_config(n, W, H, quality=True)
print("default:", cfg_def, flush=True)
print("quality:", cfg_q, flush=True)

gt = grid("texture")
gz = grid("debug_z")
golden = np.asarray(Image.open(GOLDEN))

out = {"grid_tex": gt, "grid_z": gz}
for name, cfg in (("default", cfg_def), ("quality", cfg_q)):
    st = scan(cfg)
    sz = scan(cfg, "debug_z") if not cfg.row_edge else None
    d = np.abs(st.astype(int) - gt.astype(int)).max(-1)
    flips = d > 8
    print(f"\n=== {name} ===", flush=True)
    print(f"flips vs lossless grid: {flips.mean() * 100:.3f}% "
          f"({flips.sum()} px)")
    print(f"masked PSNR vs GL golden: "
          f"{masked_psnr(st, golden, depth=depth):.2f} dB "
          f"(overall {masked_psnr(st, golden):.2f}); grid's own: "
          f"{masked_psnr(gt, golden, depth=depth):.2f} dB")
    if sz is not None:
        dz = sz[..., 0].astype(int) - gz[..., 0].astype(int)
        dzf = dz[flips]
        if len(dzf):
            nearer = (dzf < -4).mean()
            farther = (dzf > 4).mean()
            print(f"at flips: scan NEARER {nearer*100:.1f}%  FARTHER "
                  f"{farther*100:.1f}%  tie {100*(1-nearer-farther):.1f}%")
    # GL adjudication at flip pixels
    ds = np.abs(st.astype(int) - golden.astype(int)).max(-1) <= 8
    dg = np.abs(gt.astype(int) - golden.astype(int)).max(-1) <= 8
    if flips.sum():
        print(f"GL agrees with: scan only {(ds & ~dg)[flips].mean()*100:.1f}%"
              f", grid only {(dg & ~ds)[flips].mean()*100:.1f}%, neither "
              f"{(~ds & ~dg)[flips].mean()*100:.1f}%")
    # Spatial structure: pitch-phase alignment. Projected cell pitch at the
    # identity view ~ W / (n-1) horizontally (and H-scaled vertically).
    ys, xs = np.nonzero(flips)
    if len(ys):
        print(f"flip bbox: rows {ys.min()}-{ys.max()}, cols "
              f"{xs.min()}-{xs.max()}")
        # mod-8 band phase (kernel bands are 8 rows)
        hb = np.bincount(ys % 8, minlength=8) / len(ys)
        print("row phase mod 8 (band):", np.round(hb, 3))
        hcol = np.bincount(xs % 128, minlength=128) / len(xs)
        print(f"col phase mod 128: max {hcol.max():.3f} at "
              f"{hcol.argmax()} (uniform would be {1/128:.4f})")
        # error magnitude distribution at flips
        print("err quantiles at flips:",
              np.percentile(d[flips], [25, 50, 75, 95, 99]))
    out[f"scan_{name}"] = st
    if sz is not None:
        out[f"scanz_{name}"] = sz

np.savez_compressed("/tmp/frontal_forensic.npz", golden=golden, depth=depth,
                    **out)
print("\nsaved /tmp/frontal_forensic.npz", flush=True)
