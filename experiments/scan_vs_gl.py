"""Masked PSNR of the scan path vs the committed REAL-OpenGL golden (TPU).

BASELINE quality criterion at config #1 (samples pair, d8, frontal, VGA):
PSNR >= 40 dB vs the OpenGL reference render away from depth discontinuities.
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from depthrenderer_tpu import io as dio, meshgen, transforms
from depthrenderer_tpu.evaluate import masked_psnr
from depthrenderer_tpu.ops import raster_scan

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens", "gl_sample_d8_frontal.png")

colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   colour.shape)
verts, uvs, _ = (np.asarray(a) for a in meshgen.grid_mesh(depth, 8))
verts = verts.copy()
verts[:, 2] *= 4.0
n = 2**8 + 1
aspect = colour.shape[1] / colour.shape[0]
proj = np.asarray(transforms.perspective(18.0, aspect))
mvp = (proj @ np.asarray(transforms.translation(dz=-10.0))).astype(np.float32)
W, H = 640, 480

cfg = raster_scan.suggest_scan_config(n, W, H)
print("config:", cfg)
ours = np.asarray(raster_scan.render_frame_scan(
    mvp, verts.reshape(n, n, 3), uvs.reshape(n, n, 2),
    colour.astype(np.float32), W, H, cfg))
golden = np.asarray(Image.open(GOLDEN))
print(f"scan vs OpenGL golden: overall {masked_psnr(ours, golden):.2f} dB, "
      f"away-from-depth-edges {masked_psnr(ours, golden, depth=depth):.2f} dB")
Image.fromarray(ours).save("/tmp/scan_vga.png")
