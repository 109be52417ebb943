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
for k in ("nbr", "hyps", "sr", "rmax", "cw", "off", "tex_cols", "tex_rows",
          "pack_xy", "dmax", "dual_col", "colfix"):
    if os.environ.get(k.upper()):
        _ov[k] = int(os.environ[k.upper()])
if os.environ.get("COLFIX", "").lower() == "none":
    _ov["colfix"] = None
for _bk in ("pack_xy", "dual_col"):
    if _ov.get(_bk) is not None:
        _ov[_bk] = bool(_ov[_bk])
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


T = int(os.environ.get("T", "1"))
mvps = jnp.broadcast_to(mvp[None], (T, 4, 4))
minv_b = jnp.broadcast_to(minv_rows[None], (T, 8))
ht, wt = int(texture.shape[0]), int(texture.shape[1])
rpt = max(-(-ht // 8) * 8, scfg.tex_rows)
cpt = max(-(-wt // 128) * 128, scfg.tex_cols)
texq = raster_scan._pack_texture(texture, rpt, cpt)
t_prep, prep = timeit(
    "prep (XLA)",
    lambda: raster_scan._prep_scan_batched(mvps, vgrid, W, H, scfg))
win, w0, bounds, canch, mid, _ = prep

t_noop, _ = timeit(
    "kernel noop (step+DMA)",
    lambda: raster_scan._raster_scan_pallas(
        win, texq, (ht, wt), minv_b, w0, bounds, canch, mid, W, H, n, n, scfg,
        phases="noop"))
t_nocap, _ = timeit(
    "kernel solve-nocapture",
    lambda: raster_scan._raster_scan_pallas(
        win, texq, (ht, wt), minv_b, w0, bounds, canch, mid, W, H, n, n, scfg,
        phases="solve_nocap"))
t_solve, _ = timeit(
    "kernel solve-only",
    lambda: raster_scan._raster_scan_pallas(
        win, texq, (ht, wt), minv_b, w0, bounds, canch, mid, W, H, n, n, scfg,
        phases="solve"))
t_march, _ = timeit(
    "kernel march-only",
    lambda: raster_scan._raster_scan_pallas(
        win, texq, (ht, wt), minv_b, w0, bounds, canch, mid, W, H, n, n, scfg,
        phases="march_only"))
t_attrs, bands = timeit(
    "kernel attrs (no shade)",
    lambda: raster_scan._raster_scan_pallas(
        win, texq, (ht, wt), minv_b, w0, bounds, canch, mid, W, H, n, n, scfg))
t_all, rgba = timeit(
    "kernel + in-kernel shade",
    lambda: raster_scan._raster_scan_pallas(
        win, texq, (ht, wt), minv_b, w0, bounds, canch, mid, W, H, n, n, scfg,
        mode="texture"))
t_shade, _ = timeit(
    "XLA shade (legacy)",
    lambda: raster_scan._shade_scan_batched(bands, texture, W, H, "texture"))
t_asm, _ = timeit(
    "rgba assembly (XLA)",
    lambda: raster_scan._assemble_rgba_batched(rgba, W, H))
(t_prep, t_noop, t_nocap, t_solve, t_march, t_attrs, t_all, t_shade,
 t_asm) = (
    x / T for x in (t_prep, t_noop, t_nocap, t_solve, t_march, t_attrs,
                    t_all, t_shade, t_asm))
print(f"(per frame at group T={T})")

print(f"{'step+DMA overhead':>24}: {t_noop:8.2f} ms")
print(f"{'solve-nocap (delta)':>24}: {t_nocap - t_noop:8.2f} ms")
print(f"{'strip capture (delta)':>24}: {t_solve - t_nocap:8.2f} ms")
print(f"{'march alone (delta)':>24}: {t_march - t_solve:8.2f} ms")
print(f"{'fetch+exact (delta)':>24}: {t_attrs - t_march:8.2f} ms")
print(f"{'in-kernel shade (delta)':>24}: {t_all - t_attrs:8.2f} ms")
total = t_prep + t_all + t_asm
print(f"{'total / fps':>24}: {total:8.2f} ms -> {1000.0 / total:.1f} frames/s")
