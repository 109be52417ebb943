"""Preset-4 (4K/d12 + edge cull) hole capture vs the EXACT control (round 5).

Renders the production big_grid scan and `render_frame_grid_exact` at the
bench's frame 0 (sway start) and saves both frames + the flip/hole masks to
/tmp/p4_holes.npz for the CPU-side classifier (p4_classify.py) — the d10
forensic method (hole_replay.py) applied at preset 4 (VERDICT r4 ask #5).

TPU-side; run alone (one TPU process at a time).
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops.raster_grid import render_frame_grid_exact
from depthrenderer_tpu.ops.raster_scan import (render_frames_scan,
                                               suggest_scan_config,
                                               unpack_raw_frames)

W, H, D, CULL = 3840, 2160, 12, 0.25
n = 2**D + 1
colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth_r = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                     (H, W))
texture = dio.resize(colour, (H, W)).astype(np.float32)
verts, uvs, _ = meshgen.grid_mesh(depth_r, D)
verts = np.asarray(verts).copy()
verts[:, 2] *= 4.0
vgrid = jax.device_put(verts.reshape(n, n, 3))
uvgrid = jax.device_put(np.asarray(uvs).reshape(n, n, 2))
tex_dev = jax.device_put(texture)

sway = animation.default_sway(5.0)
times = animation.frame_times(16, 60.0)
views = np.asarray(sway.batch(times))
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
mvps = (proj[None] @ (cam[None] @ views)).astype(np.float32)[:1]

overrides = {}
for kv in (sys.argv[1].split(",") if len(sys.argv) > 1 else []):
    k, v = kv.split("=")
    overrides[k] = None if v == "none" else int(v)
scan_cfg = suggest_scan_config(n, W, H, edge_cull_threshold=CULL, **overrides)
print("scan cfg:", scan_cfg, file=sys.stderr, flush=True)

t0 = time.time()
raw = render_frames_scan(mvps, vgrid, uvgrid, tex_dev, W, H, scan_cfg,
                         frame_batch=1, raw_u32=True)
raw.block_until_ready()
print(f"scan: {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
a = unpack_raw_frames(np.asarray(raw), W, H)[0]

t0 = time.time()
if os.path.exists("/tmp/p4_holes.npz") and not os.environ.get("P4_FRESH"):
    # the exact control costs ~30 min at 4K/d12 — reuse the captured one
    # (same mvp/scene by construction) for knob A/Bs
    b = np.load("/tmp/p4_holes.npz")["control"]
    print("exact control: reused /tmp/p4_holes.npz", file=sys.stderr,
          flush=True)
else:
    b = render_frame_grid_exact(mvps[0], np.asarray(vgrid),
                                np.asarray(uvgrid), tex_dev, W, H, strips=16,
                                edge_cull_threshold=CULL)
    print(f"exact control: {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

flip = np.abs(a.astype(int) - b.astype(int)).max(-1) > 8
bg_a = (a[..., :3] == 0).all(-1)
bg_b = (b[..., :3] == 0).all(-1)
hole = flip & bg_a & ~bg_b
false_fg = flip & ~bg_a & bg_b
both_fg = flip & ~bg_a & ~bg_b
mse = float(np.mean((a[..., :3].astype(np.float64)
                     - b[..., :3].astype(np.float64)) ** 2))
psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
print(f"flips {flip.mean()*100:.2f}%  holes {hole.mean()*100:.2f}%  "
      f"false-fg {false_fg.mean()*100:.2f}%  both-fg winner-diff "
      f"{both_fg.mean()*100:.2f}%  psnr {psnr:.1f} dB", flush=True)
out_npz = "/tmp/p4_holes_ab.npz" if overrides else "/tmp/p4_holes.npz"
np.savez_compressed(out_npz, scan=a, control=b,
                    mvp=mvps[0], overrides=str(overrides))
print(f"saved {out_npz}", flush=True)
