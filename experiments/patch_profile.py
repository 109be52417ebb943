"""Stage-profile the hole-driven sparse patch pass at the bench config.

Measures, on chip at 1080p/d10 over the 64-frame sway path: pass-1 time,
flag computation time + fire rates (bands / blocks), gated pass-2 time with
REAL flags vs ALL-ZERO flags (fixed sparse-step + prep overhead) vs ALL-ONE
(dense upper bound), and the u32 merge — to locate where the measured
30 ms/frame (vs 11.5 single-pass) goes.
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops import raster_scan

W, H, D, T = 1920, 1080, 10, 16
n = 2**D + 1
colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   (H, W))
texture = dio.resize(colour, (H, W)).astype(np.float32)
verts, uvs, _ = (np.asarray(a) for a in meshgen.grid_mesh(depth, D))
verts = verts.copy()
verts[:, 2] *= 4.0
vgrid = verts.reshape(n, n, 3)
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
sway = animation.default_sway(5.0)
times = animation.frame_times(64, 60.0)
vs = np.asarray(sway.batch(times))
mvps = np.einsum("ij,jk,tkl->til", proj, cam, vs).astype(np.float32)[:T]
if os.environ.get("PATCH_PROFILE_FRONTAL"):
    mvps = np.repeat((proj @ cam).astype(np.float32)[None], T, axis=0)
    print("== FRONTAL view group ==")

_cfx = os.environ.get("PATCH_PROFILE_COLFIX")
cfg1 = raster_scan.suggest_scan_config(
    n, W, H, **({"colfix": int(_cfx)} if _cfx else {}))
cfg1 = __import__("dataclasses").replace(cfg1, patch=False)
print("cfg1:", cfg1)
cfg2 = raster_scan._patch_cfg2(cfg1, n, n, W, H)
print("cfg2:", cfg2)

vg = jax.device_put(jnp.asarray(vgrid, jnp.float32))
tex = jax.device_put(jnp.asarray(texture, jnp.float32))
vg_t = jnp.transpose(vg, (1, 0, 2))
tex_t = jnp.transpose(tex, (1, 0, 2))
S = np.asarray(raster_scan._ROW_EDGE_SWAP, np.float64)
mvps2 = np.einsum("ij,tjk->tik", S, mvps.astype(np.float64)).astype(np.float32)

def timeit(label, fn, reps=3):
    fn()  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3/T:.2f} ms/frame ({best*1e3:.1f} ms/group)")
    return r

# pass 1
r1 = z1 = None
def pass1():
    global r1, z1
    r1, z1, _ = raster_scan._scan_rgba_z_grouped(
        jnp.asarray(mvps), vg, tex, W, H, cfg1, False, T)
    return z1
timeit("pass1 (texture_z)", pass1)

nbands2 = -(-W // 8)
nblocks2 = raster_scan._ceil_to(H, 128) // 128
flags = timeit("flags (XLA)", lambda: raster_scan._patch_flags(
    z1, W, H, nbands2, nblocks2))
bflag, blkflag = flags
bf = np.asarray(bflag); bkf = np.asarray(blkflag)
print(f"flag rates: bands {bf.mean():.1%} ({bf.sum()}/{bf.size}), "
      f"blocks {bkf.mean():.1%}; per-frame band range "
      f"{bf.sum(1).min()}-{bf.sum(1).max()} of {nbands2}")

def pass2(gates):
    r2, z2, _ = raster_scan._scan_rgba_z_grouped(
        jnp.asarray(mvps2), vg_t, tex_t, H, W, cfg2, False, T, gates=gates)
    return r2, z2
r2, z2 = timeit("pass2 real flags", lambda: pass2((bflag, blkflag)))
zeros = (jnp.zeros_like(bflag), jnp.zeros_like(blkflag))
timeit("pass2 zero flags", lambda: pass2(zeros))
ones = (jnp.ones_like(bflag), jnp.ones_like(blkflag))
timeit("pass2 all flags", lambda: pass2(ones))

timeit("merge (XLA)", lambda: raster_scan._merge_row_edge_raw(
    r1, z1, r2, z2, W, H))

# prep2 alone (inside pass2's loop; measure separately)
def prep2():
    win, w0, bounds, canch, mid, ovf = raster_scan._prep_scan_batched(
        jnp.asarray(mvps2), vg_t, W if False else H, W, cfg2)
    return w0
timeit("prep2 alone", prep2)
