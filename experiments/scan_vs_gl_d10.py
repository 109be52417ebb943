"""Masked PSNR of the scan path vs the PRODUCTION-config OpenGL goldens (TPU).

Round-3 quality gate (VERDICT.md next-round #3): the bench headline path
(d10/1080p scan) anchored against the REAL GL render at the same config —
frontal view plus a mid-sway rotated view (frame 40 of the bench's 64-frame
path). BASELINE bar: >= 40 dB masked PSNR away from depth discontinuities.

Goldens: tools/make_gl_golden.py --production --density 10 --width 1920
         --height 1080 --view {frontal,sway:40}

Usage: python experiments/scan_vs_gl_d10.py [--sr N] [--hyps N] [--cw N]
       (overrides trigger fresh kernel compiles: ~20-30 min each on the
        remote compile helper — batch them.)
"""

import argparse
import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.evaluate import masked_psnr
from depthrenderer_tpu.ops import raster_scan

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDENS = {
    "frontal": os.path.join(ROOT, "tests/goldens/gl_sample_d10_1080p_frontal.png"),
    "sway40": os.path.join(ROOT, "tests/goldens/gl_sample_d10_1080p_sway40.png"),
}

ap = argparse.ArgumentParser()
ap.add_argument("--density", type=int, default=10)
ap.add_argument("--width", type=int, default=1920)
ap.add_argument("--height", type=int, default=1080)
for k in ("sr", "hyps", "cw", "rmax", "nbr", "off"):
    ap.add_argument(f"--{k}", type=int, default=None)
args = ap.parse_args()

W, H, D = args.width, args.height, args.density
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
texture = jax.device_put(texture)

proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
sway = animation.default_sway(5.0)
times = animation.frame_times(64, 60.0)
views = np.asarray(sway.batch(times))
mvp_frontal = (proj @ cam).astype(np.float32)
mvp_sway40 = (proj @ cam @ views[40]).astype(np.float32)

# Pad to the bench's 16-frame group so the cached kernel shape is reused.
mvps = np.stack([mvp_frontal, mvp_sway40] + [mvp_frontal] * 14)

overrides = {k: getattr(args, k) for k in ("sr", "hyps", "cw", "rmax", "nbr",
                                           "off")
             if getattr(args, k) is not None}
cfg = raster_scan.suggest_scan_config(n, W, H, **overrides)
print("config:", cfg, flush=True)

raw = raster_scan.render_frames_scan(
    mvps, vgrid, uvgrid, texture, W, H, cfg, raw_u32=True)
frames = raster_scan.unpack_raw_frames(np.asarray(raw[:2]), W, H)

ok = True
for i, name in enumerate(("frontal", "sway40")):
    golden = np.asarray(Image.open(GOLDENS[name]))
    away = masked_psnr(frames[i], golden, depth=depth)
    overall = masked_psnr(frames[i], golden)
    print(f"scan vs GL {name}: overall {overall:.2f} dB, "
          f"away-from-depth-edges {away:.2f} dB (gate >= 40)", flush=True)
    Image.fromarray(frames[i]).save(f"/tmp/scan_d10_{name}.png")
    ok &= away >= 40.0
print("GATE:", "PASS" if ok else "FAIL")
