"""Forensic: compare the COMPILED solve's records against a numpy replica.

Runs the kernel with debug_records at the bench config, then re-derives the
(sxc, zc, basew) record planes in numpy from the same projected window data
for a chosen set of bands and reports where they diverge.
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops import raster_scan

W, H, D = 1920, 1080, 10
BANDS = [int(b) for b in os.environ.get("BANDS", "0,40,84,95,120").split(",")]

colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"), (H, W))
n = 2**D + 1
verts, uvs, _ = meshgen.grid_mesh(depth, D)
verts = np.asarray(verts).copy()
verts[:, 2] *= 4.0
vgrid = jax.device_put(verts.reshape(n, n, 3))

sway = animation.default_sway(5.0)
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
mvp = (proj @ cam @ np.asarray(sway.transform_at(0.0))).astype(np.float32)

scfg = raster_scan.suggest_scan_config(n, W, H)
print("config:", scfg)
win, w0, bounds, canch, ovf = (np.asarray(a) for a in raster_scan._prep_scan(
    jnp.asarray(mvp), vgrid, W, H, scfg))
bounds2 = bounds.reshape(len(w0), -1)
kb = bounds2 & 0xFFF          # (nbands, nchunks) per-chunk window-relative
ke = (bounds2 >> 12) & 0xFFF

minv = np.linalg.inv(np.asarray(mvp, np.float64))
minv_rows = jnp.asarray(np.concatenate([minv[2], minv[3]]).astype(np.float32))
texq = jnp.zeros((scfg.tex_rows, scfg.tex_cols), jnp.uint32)
_, dbg = raster_scan._raster_scan_pallas(
    jnp.asarray(win)[None], texq, (1, 1), minv_rows[None], jnp.asarray(w0)[None],
    jnp.asarray(bounds)[None], jnp.asarray(canch)[None],
    W, H, n, n, scfg, debug_records=True)
dbg = np.asarray(dbg)[0]  # (1?, nbr/1, nrec, 8, CL)
print("records:", dbg.shape)

SR, OFF, NBR = scfg.sr, scfg.off, scfg.nbr
FAR = 3.0e38


def numpy_solve(i):
    """Replica of the kernel's solve for band i on the same window data."""
    w0i = int(w0[i]) * 8
    winb = win[:, w0i:w0i + scfg.rmax]  # (3, rmax, CL)
    CL = winb.shape[2]
    qy = (H - (i * 8 + np.arange(8)) - 0.5)[:, None]  # (8,1)
    sxc = np.full((NBR, 8, CL), FAR, np.float32)
    zc = np.full((NBR, 8, CL), FAR, np.float32)
    bw = np.full((NBR, 8, CL), -1.0e9, np.float32)
    cnt = np.zeros((8, CL), np.float32)
    for ci in range(CL // 128):
        cs = slice(ci * 128, ci * 128 + 128)
        for k in range(int(kb[i, ci]), int(ke[i, ci])):
            k1 = min(k + 1, scfg.rmax - 1)
            s_hi = winb[1, k][None, cs]
            s_lo = winb[1, k1][None, cs]
            cross = (s_hi >= qy) & (s_lo < qy)
            denom = np.maximum(s_hi - s_lo, 1e-12)
            frac = np.where(cross, (s_hi - qy) / denom, 0.0).astype(np.float32)
            sxn = (winb[0, k][None, cs]
                   + (winb[0, k1][None, cs] - winb[0, k][None, cs]) * frac)
            zn = (winb[2, k][None, cs]
                  + (winb[2, k1][None, cs] - winb[2, k][None, cs]) * frac)
            for s in range(NBR):
                fire = cross & (cnt[:, cs] == s)
                sxc[s][:, cs] = np.where(fire, sxn, sxc[s][:, cs])
                zc[s][:, cs] = np.where(fire, zn, zc[s][:, cs])
                bw[s][:, cs] = np.where(fire, float(k), bw[s][:, cs])
            cnt[:, cs] += cross
    return sxc, zc, bw


for i in BANDS:
    sxc, zc, bw = numpy_solve(i)
    got = dbg[i]  # (nbr, 3, 8, CL)
    for s in range(NBR):
        for p, (name, ref) in enumerate((("sxc", sxc[s]), ("zc", zc[s]),
                                         ("basew", bw[s]))):
            g = got[s, p]
            valid = (ref < FAR / 2) if name != "basew" else (ref > -1e8)
            both = valid & ((g < FAR / 2) if name != "basew" else (g > -1e8))
            mism = (~np.isclose(g, ref, rtol=1e-5, atol=1e-3)) & (valid | (
                (g < FAR / 2) if name != "basew" else (g > -1e8)))
            if p == 0:
                vg = (g < FAR / 2).mean()
                vr = valid.mean()
                print(f"band {i} slot {s}: valid kernel {vg*100:.1f}% "
                      f"numpy {vr*100:.1f}%", end="  ")
            print(f"{name} mism {mism.mean()*100:.2f}%", end="  ")
        print()
