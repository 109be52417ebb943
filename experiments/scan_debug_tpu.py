"""Diff the scan kernel against the grid path on the TPU at the bench config.

Saves scan/grid/diff PNGs to /tmp and prints an error-structure breakdown
(per-band and per-block mismatch rates) to localise compiled-only bugs.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops import raster_grid, raster_scan
from depthrenderer_tpu.ops.raster_grid import measured_config
from depthrenderer_tpu.utils import psnr

W, H, D = [int(v) for v in os.environ.get("SHAPE", "1920,1080,10").split(",")]
T_ANIM = float(os.environ.get("T_ANIM", "0.0"))

colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"), (H, W))
texture = jax.device_put(dio.resize(colour, (H, W)).astype(np.float32))

n = 2**D + 1
verts, uvs, _ = meshgen.grid_mesh(depth, D)
verts = np.asarray(verts).copy()
verts[:, 2] *= 4.0
vgrid = jax.device_put(verts.reshape(n, n, 3))
uvgrid = jax.device_put(np.asarray(uvs).reshape(n, n, 2))

sway = animation.default_sway(5.0)
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
mvp = (proj @ cam @ np.asarray(sway.transform_at(T_ANIM))).astype(np.float32)

_ov = {}
for k in ("nbr", "hyps", "sr", "rmax", "cw", "off"):
    if os.environ.get(k.upper()):
        _ov[k] = int(os.environ[k.upper()])
scfg = raster_scan.suggest_scan_config(n, W, H, **_ov)
print("scan config:", scfg)
out = raster_scan._prep_scan(jnp.asarray(mvp), vgrid, W, H, scfg)
print("prep: w0*8 head", np.asarray(out[1][:6]) * 8,
      "bounds[:6]", np.asarray(out[2][:6]),
      "canch", np.asarray(out[3][:8]), "ovf", int(out[4]))

t0 = time.time()
a = np.asarray(raster_scan.render_frame_scan(mvp, vgrid, uvgrid, texture, W, H, scfg))
print(f"scan {time.time()-t0:.1f}s")
gcfg = measured_config(mvp[None], np.asarray(vgrid), W, H,
                       quantile=float(os.environ.get("GQ", "0.995")))
t0 = time.time()
b = np.asarray(raster_grid.render_frame_grid(mvp, vgrid, uvgrid, texture, W, H, gcfg))
print(f"grid {time.time()-t0:.1f}s")

diff = np.abs(a.astype(int) - b.astype(int)).max(axis=-1)
bad = diff > 8
print(f"PSNR {psnr(a, b):.2f} dB | flips {bad.mean()*100:.3f}% | "
      f"cov scan {(a[..., 3] > 0).mean()*100:.2f}% grid {(b[..., 3] > 0).mean()*100:.2f}%")

bands = bad.reshape(H // 8 if H % 8 == 0 else -1, 8, W).mean(axis=(1, 2))
print("worst bands:", np.argsort(bands)[-8:][::-1], np.sort(bands)[-8:][::-1].round(3))
blocks = bad[:, : (W // 128) * 128].reshape(H, W // 128, 128).mean(axis=(0, 2))
print("per-block flip rate:", blocks.round(3))
rowprof = bad.mean(axis=1)
print("flip rate by row octile:", rowprof.reshape(8, -1).mean(axis=1).round(3))
# within-band row position (sub-row of each 8-row band)
subrow = bad[: (H // 8) * 8].reshape(-1, 8, W).mean(axis=(0, 2))
print("flip rate by band sub-row:", subrow.round(3))

from PIL import Image

Image.fromarray(a).save("/tmp/scan_frame.png")
Image.fromarray(b).save("/tmp/grid_frame.png")
Image.fromarray((bad * 255).astype(np.uint8)).save("/tmp/scan_diff.png")
print("wrote /tmp/scan_frame.png /tmp/grid_frame.png /tmp/scan_diff.png")
