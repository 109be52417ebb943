"""Stage timing for the scan path at the bench config (steady-state, on-chip).

Times prep / kernel(all) / kernel(solve-only) / shade separately with
block_until_ready between reps; kernel(march+exact) = all - solve.
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
from depthrenderer_tpu.ops import raster_scan

W, H, D = [int(v) for v in os.environ.get("SHAPE", "1920,1080,10").split(",")]
REPS = int(os.environ.get("REPS", "10"))

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
mvp = jnp.asarray(
    (proj @ cam @ np.asarray(sway.transform_at(1.0))).astype(np.float32))

_ov = {}
for k in ("nbr", "hyps", "sr", "rmax", "cw", "off"):
    if os.environ.get(k.upper()):
        _ov[k] = int(os.environ[k.upper()])
scfg = raster_scan.suggest_scan_config(n, W, H, **_ov)
print("config:", scfg)

minv = np.linalg.inv(np.asarray(mvp, np.float64))
minv_rows = jnp.asarray(np.concatenate([minv[2], minv[3]]).astype(np.float32))


def timeit(name, fn):
    out = jax.block_until_ready(fn())  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:>24}: {dt:8.2f} ms")
    return dt, out


t_prep, prep = timeit(
    "prep (XLA)", lambda: raster_scan._prep_scan(mvp, vgrid, W, H, scfg))
win, w0, kb, ke, canch, _ = prep

t_solve, _ = timeit(
    "kernel solve-only",
    lambda: raster_scan._raster_scan_pallas(
        win, minv_rows, w0, kb, ke, canch, W, H, n, n, scfg, phases="solve"))
t_all, bands = timeit(
    "kernel all",
    lambda: raster_scan._raster_scan_pallas(
        win, minv_rows, w0, kb, ke, canch, W, H, n, n, scfg))
t_shade, _ = timeit(
    "shade (XLA)",
    lambda: raster_scan._shade_scan(bands, texture, W, H, "texture"))

print(f"{'march+exact (delta)':>24}: {t_all - t_solve:8.2f} ms")
total = t_prep + t_all + t_shade
print(f"{'total / fps':>24}: {total:8.2f} ms -> {1000.0 / total:.1f} frames/s")
