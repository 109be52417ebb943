"""Attribute the frontal false-coverage flip class to a mechanism.

frontal_forensic.py found: at the identity view the default scan flips 1.48%
vs the lossless grid, 72% of them with the scan winner NEARER, GL siding with
the grid on 84% — false coverage, not holes. Candidate mechanisms:

- the neighbour-strip REALIGN (mixing fold sheets / shear rows builds phantom
  quads) -> killed by dual_col=True (self-contained records);
- the pack_xy 1/256-px delta quantisation (perturbed edges at depth
  discontinuities flip coverage toward the nearer cell) -> killed by
  pack_xy=False;
- march rank (wrong column hypothesis wins by crossing z) -> reduced by
  hyps=2.

One render per config at the identity view; report flip% vs the lossless grid
and the GL-golden adjudication at flips.
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
mvps16 = np.repeat(mvp[None], 16, axis=0)

gcfg_ll = measured_config(mvp[None], verts.reshape(n, n, 3), W, H,
                          quantile=1.0, row_anchors=2)
gt = np.asarray(render_frames_grid(
    mvp[None], vgrid, uvgrid, tex_dev, W, H, gcfg_ll, frame_batch=1))[0]
golden = np.asarray(Image.open(GOLDEN))
dg = np.abs(gt.astype(int) - golden.astype(int)).max(-1) <= 8

CONFIGS = [
    ("default", {}),
    ("hyps2", {"hyps": 2}),
    ("nbr3", {"nbr": 3}),
    ("dual_col", {"dual_col": True}),
    ("no_pack", {"pack_xy": False}),
    ("dual+hyps2", {"dual_col": True, "hyps": 2}),
]

for name, over in CONFIGS:
    cfg = raster_scan.suggest_scan_config(n, W, H, **over)
    raw = raster_scan.render_frames_scan(
        mvps16, vgrid, uvgrid, tex_dev, W, H, cfg, raw_u32=True)
    st = raster_scan.unpack_raw_frames(np.asarray(raw[:1]), W, H)[0]
    d = np.abs(st.astype(int) - gt.astype(int)).max(-1)
    flips = d > 8
    s_bg = (st[..., :3] == 0).all(-1)
    g_bg = (gt[..., :3] == 0).all(-1)
    holes = (flips & s_bg & ~g_bg).mean() * 100
    extra = (flips & ~s_bg & g_bg).mean() * 100
    ds = np.abs(st.astype(int) - golden.astype(int)).max(-1) <= 8
    gl_g = (dg & ~ds)[flips].mean() * 100 if flips.sum() else 0.0
    gl_s = (ds & ~dg)[flips].mean() * 100 if flips.sum() else 0.0
    print(f"{name:12s} flips {flips.mean()*100:.3f}% (holes {holes:.3f}% "
          f"extra {extra:.3f}%)  GL: grid-only {gl_g:.1f}% / scan-only "
          f"{gl_s:.1f}%  GL-masked "
          f"{masked_psnr(st, golden, depth=depth):.2f} dB", flush=True)
