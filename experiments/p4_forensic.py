"""Forensics: preset 4 (4K/d12, edge cull) scan-vs-grid 11.7% flips.

Spatial attribution: are flips aligned to 128-col chunks / 8-row bands
(big_grid kernel bug) or to depth edges (cull-semantics mismatch)?
"""
import os, sys, time
import numpy as np
import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops.raster_grid import measured_config, render_frames_grid
from depthrenderer_tpu.ops.raster_scan import (render_frames_scan,
                                               suggest_scan_config,
                                               unpack_raw_frames)

W, H, D = 3840, 2160, 12
CULL = 0.25
n = 2**D + 1

colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.load_depth("/root/reference/samples/00000_depth.png")
depth_r = dio.resize(depth, (H, W))
texture = dio.resize(colour, (H, W)).astype(np.float32)

verts, uvs, _ = meshgen.grid_mesh(depth_r, D)
verts = np.asarray(verts).copy()
verts[:, 2] *= 4.0
vgrid = jax.device_put(verts.reshape(n, n, 3))
uvgrid = jax.device_put(np.asarray(uvs).reshape(n, n, 2))
texture = jax.device_put(texture)

sway = animation.default_sway(5.0)
times = animation.frame_times(16, 60.0)
views = np.asarray(sway.batch(times))
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
mvps = (proj[None] @ (cam[None] @ views)).astype(np.float32)[:1]

config = measured_config(mvps, np.asarray(vgrid), W, H, edge_cull_threshold=CULL)
scan_cfg = suggest_scan_config(n, W, H, edge_cull_threshold=CULL)
print("scan cfg:", scan_cfg, file=sys.stderr)

t0 = time.time()
raw = render_frames_scan(mvps, vgrid, uvgrid, texture, W, H, scan_cfg,
                         frame_batch=1, raw_u32=True)
raw.block_until_ready()
print(f"scan: {time.time()-t0:.1f}s", file=sys.stderr)
a = unpack_raw_frames(np.asarray(raw), W, H)[0]

t0 = time.time()
b = np.asarray(render_frames_grid(mvps, vgrid, uvgrid, texture, W, H, config,
                                  frame_batch=1))[0]
print(f"grid: {time.time()-t0:.1f}s", file=sys.stderr)

flip = np.abs(a.astype(int) - b.astype(int)).max(-1) > 8
print(f"flips: {flip.mean()*100:.2f}% ({flip.sum()} px)")

# coverage disagreement (background vs foreground)
bg_a = (a[..., :3] == 0).all(-1)
bg_b = (b[..., :3] == 0).all(-1)
print(f"scan-bg & grid-fg: {(bg_a & ~bg_b).mean()*100:.3f}%   "
      f"scan-fg & grid-bg: {(~bg_a & bg_b).mean()*100:.3f}%")

# alignment histograms
ys, xs = np.nonzero(flip)
if len(xs):
    hx = np.bincount(xs % 128, minlength=128)
    hy = np.bincount(ys % 8, minlength=8)
    print("flips by x%128 (16 buckets of 8):",
          (hx.reshape(16, 8).sum(1) / max(flip.sum(), 1) * 100).round(1))
    print("flips by y%8:", (hy / max(flip.sum(), 1) * 100).round(1))
    # fraction of flips per 128-wide column strip and 8-row band (top 10)
    cs = np.bincount(xs // 128, minlength=W // 128)
    bs = np.bincount(ys // 8, minlength=(H + 7) // 8)
    print("worst col-strips:", np.argsort(cs)[-8:][::-1], cs[np.argsort(cs)[-8:][::-1]])
    print("worst row-bands:", np.argsort(bs)[-8:][::-1], bs[np.argsort(bs)[-8:][::-1]])

from PIL import Image
Image.fromarray((flip * 255).astype(np.uint8)).resize((960, 540)).save(
    "/tmp/p4_flipmap.png")
Image.fromarray(a[::4, ::4]).save("/tmp/p4_scan.png")
Image.fromarray(b[::4, ::4]).save("/tmp/p4_grid.png")
print("maps saved")
