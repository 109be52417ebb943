"""Measure how often the monotone-march gate fires at the bench config.

Replicates the solve's slot-0 sxc records on the host (same replica as
tests/test_scan.py::test_scan_solve_forensics_vs_host_replica) and evaluates
the kernel's mono gate (contiguous real run + monotone over real pairs,
all 8 scanlines) per (band, block) march window. Prints the hit rate and the
failure-mode split (holes vs non-monotone), plus the rate for a variant gate
restricted to the block-relevant column range.
"""

import os
import sys

import numpy as np

os.environ.setdefault("DEPTHRENDERER_PLATFORM", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from depthrenderer_tpu import animation, io as dio, meshgen, transforms  # noqa: E402
from depthrenderer_tpu.ops import raster_scan  # noqa: E402

W, H, D = 1920, 1080, 10
FAR = 3.0e38
n = 2**D + 1
colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   (H, W))
verts, uvs, _ = meshgen.grid_mesh(depth, D)
verts = np.asarray(verts).copy()
verts[:, 2] *= 4.0
vgrid = verts.reshape(n, n, 3)

sway = animation.default_sway(5.0)
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
mvp = (proj @ cam @ np.asarray(sway.transform_at(1.0))).astype(np.float32)

cfg = raster_scan.suggest_scan_config(n, W, H)
print("config:", cfg)
win, w0, bounds, canch, _ = (np.asarray(a) for a in raster_scan._prep_scan(
    jnp.asarray(mvp), jnp.asarray(vgrid), W, H, cfg))
nbands = -(-H // 8)
nblocks = -(-W // 128)
CL = win.shape[2]
nchunks = CL // 128
bounds2 = bounds.reshape(nbands, nchunks)
kb_all = bounds2 & 0xFFF
ke_all = (bounds2 >> 12) & 0xFFF

MW = cfg.cw
tot = hit = holes = nonmono = 0
tot_r = hit_r = 0  # restricted-range variant
for i in range(nbands):
    w0i = int(w0[i]) * 8
    winb = win[:, w0i:w0i + cfg.rmax]
    qy = (H - (i * 8 + np.arange(8)) - 0.5)[:, None]
    sxc = np.full((8, CL), FAR, np.float32)
    zc = np.full((8, CL), FAR, np.float32)
    cnt = np.zeros((8, CL), np.float32)
    for ci in range(nchunks):
        cs = slice(ci * 128, ci * 128 + 128)
        for k in range(int(kb_all[i, ci]), int(ke_all[i, ci])):
            k1 = min(k + 1, cfg.rmax - 1)
            s_hi = winb[1, k][None, cs]
            s_lo = winb[1, k1][None, cs]
            cross = (s_hi >= qy) & (s_lo < qy)
            denom = np.maximum(s_hi - s_lo, 1e-12)
            frac = np.where(cross, (s_hi - qy) / denom, 0.0).astype(np.float32)
            sxn = (winb[0, k][None, cs]
                   + (winb[0, k1][None, cs] - winb[0, k][None, cs]) * frac)
            zn = (winb[2, k][None, cs]
                  + (winb[2, k1][None, cs] - winb[2, k][None, cs]) * frac)
            fire = cross & (cnt[:, cs] == 0)
            sxc[:, cs] = np.where(fire, sxn, sxc[:, cs])
            zc[:, cs] = np.where(fire, zn, zc[:, cs])
            cnt[:, cs] += cross
    for blk in range(nblocks):
        cm = int(canch[blk]) * 8
        sub = sxc[:, cm:cm + MW]  # (8, MW)
        if sub.shape[1] < MW:
            continue
        real = sub < FAR * 0.5
        iota = np.arange(MW)
        a = np.where(real, iota, MW).min(1)
        b = np.where(real, iota, -1).max(1)
        nreal = real.sum(1)
        contig = np.all((b - a + 1 == nreal) | (nreal == 0))
        d = sub[:, 1:] - sub[:, :-1]
        pr = real[:, 1:] & real[:, :-1]
        dm = np.where(pr, d, 0.0)
        inc = dm.min() >= 0.0
        dec = dm.max() <= 0.0
        tot += 1
        if (inc or dec) and contig:
            hit += 1
        elif not contig:
            holes += 1
        else:
            nonmono += 1
        # Variant: restrict to columns whose sxc is near the block's qx span
        qx0, qx1 = blk * 128 + 0.5, blk * 128 + 127.5
        rel = real & (sub >= qx0 - 80) & (sub <= qx1 + 80)
        a2 = np.where(rel, iota, MW).min(1)
        b2 = np.where(rel, iota, -1).max(1)
        ar, br = a2.min(), b2.max()
        tot_r += 1
        if br < ar:
            hit_r += 1  # nothing relevant: trivially fine
            continue
        sub2 = sub[:, ar:br + 1]
        real2 = real[:, ar:br + 1]
        m2 = sub2.shape[1]
        iota2 = np.arange(m2)
        a3 = np.where(real2, iota2, m2).min(1)
        b3 = np.where(real2, iota2, -1).max(1)
        nreal2 = real2.sum(1)
        contig2 = np.all((b3 - a3 + 1 == nreal2) | (nreal2 == 0))
        d2 = sub2[:, 1:] - sub2[:, :-1]
        pr2 = real2[:, 1:] & real2[:, :-1]
        dm2 = np.where(pr2, d2, 0.0)
        if (dm2.min() >= 0.0 or dm2.max() <= 0.0) and contig2:
            hit_r += 1

print(f"blocks: {tot}; full-window mono gate: {hit / tot:.3f} "
      f"(holes {holes / tot:.3f}, non-monotone {nonmono / tot:.3f})")
print(f"restricted-range mono gate: {hit_r / tot_r:.3f}")
