"""Forensic #2: validate strips + replay march/fetch/exact from kernel records.

Uses the kernel's own slot-0 records (debug_records) for one band: checks the
captured strips against win[basew-off+j], then replays the march + realign +
exact tests in numpy and compares the per-pixel best-z against the kernel's
output z channel. Divergence localises the bug to a phase.
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
BAND = int(os.environ.get("BAND", "95"))
FAR = 3.0e38

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
SR, OFF, CW = scfg.sr, scfg.off, scfg.cw
win, w0, bounds, canch, _ = (np.asarray(a) for a in raster_scan._prep_scan(
    jnp.asarray(mvp), vgrid, W, H, scfg))
minv = np.linalg.inv(np.asarray(mvp, np.float64))
minv_rows = np.concatenate([minv[2], minv[3]]).astype(np.float32)
texq = jnp.zeros((scfg.tex_rows, scfg.tex_cols), jnp.uint32)
out, dbg = raster_scan._raster_scan_pallas(
    jnp.asarray(win)[None], texq, (1, 1), jnp.asarray(minv_rows)[None],
    jnp.asarray(w0)[None], jnp.asarray(bounds)[None],
    jnp.asarray(canch)[None], W, H, n, n, scfg, debug_records=True)
out = np.asarray(out)[0]   # (nbands, 8ch, 8, WL)
dbg = np.asarray(dbg)[0]   # (nbands, 1, nrec, 8, CL)

i = BAND
rec = dbg[i, 0]            # (nrec, 8, CL)
sxc, zc, bw = rec[0], rec[1], rec[2]
strips = rec[3:].reshape(SR, 3, 8, rec.shape[-1])  # [j, val, y, c]
w0i = int(w0[i]) * 8
winb = win[:, w0i:w0i + scfg.rmax]  # (3, rmax, CL)
CL = winb.shape[2]

# --- strip validation: strips[j, v, y, c] == winb[v, bw[y,c]-OFF+j, c] ---
valid = bw > -1e8
mism_tot = 0
for j in range(SR):
    rows = np.clip(bw.astype(int) - OFF + j, 0, scfg.rmax - 1)
    expect_ok = (bw.astype(int) - OFF + j >= 0) & (
        bw.astype(int) - OFF + j <= scfg.rmax - 1) & valid
    for v in range(3):
        want = winb[v][rows, np.arange(CL)[None, :]]
        got = strips[j, v]
        m = expect_ok & ~np.isclose(got, want, rtol=1e-6, atol=1e-5)
        mism_tot += m.sum()
        if m.sum():
            yy, cc = np.nonzero(m)
            k0 = (yy[0], cc[0])
            print(f"strip j={j} v={v}: {m.sum()} mismatches; first at y,c={k0} "
                  f"got {got[k0]} want {want[k0]} bw {bw[k0]}")
print(f"strip mismatches total: {mism_tot} "
      f"(checked {valid.sum()} valid records x {SR}x3)")

# --- march + exact replay from records (slot 0 only) ---
ych = out[i]  # channels
kz = ych[4]   # (8, WL) best z from kernel (includes slot 1 contributions!)

qy = (H - (i * 8 + np.arange(8)) - 0.5)[:, None]
nblocks = 1920 // 128
miss_m = 0
for blk in range(nblocks):
    ca = int(canch[blk]) * 128
    qx = blk * 128 + np.arange(128)[None, :] + 0.5     # (1,128)
    curve = sxc[:, ca:ca + CW]                          # (8, CW)
    zcv = zc[:, ca:ca + CW]
    f = curve[:, :, None] - qx[:, None, :]              # (8, CW, 128)
    f2 = np.roll(f, -1, axis=1)
    hit = (f * f2 <= 0)
    hit[:, CW - 1] = False
    key = np.where(hit, zcv[:, :, None], FAR)
    o1 = key.argmin(axis=1)                             # (8, 128)
    m1 = key.min(axis=1)
    key2 = key.copy()
    np.put_along_axis(key2, o1[:, None, :], FAR, axis=1)
    o2 = key2.argmin(axis=1)

    # exact replay for both hypotheses, slot 0
    best = np.full((8, 128), FAR, np.float32)
    for o in (o1, o2):
        jg = ca + o                                      # global record col
        for side in (0, 1):
            pass
        b1 = bw[np.arange(8)[:, None], jg]
        b2 = bw[np.arange(8)[:, None], np.clip(jg + 1, 0, CL - 1)]
        d = b2 - b1
        s1 = strips[:, :, np.arange(8)[:, None], jg]     # (SR,3,8,128)
        s2 = strips[:, :, np.arange(8)[:, None], np.clip(jg + 1, 0, CL - 1)]
        for k in range(SR - 1):
            rg = w0i + b1 - OFF + k
            cell_ok = (b1 > -1e8) & (rg >= 0) & (rg <= n - 2) & (jg <= n - 2)
            kk0 = (k - d).astype(int)
            kk1 = (k + 1 - d).astype(int)
            ok0 = (kk0 >= 0) & (kk0 < SR)
            ok1 = (kk1 >= 0) & (kk1 < SR)
            x00, y00, z00 = s1[k, 0], s1[k, 1], s1[k, 2]
            x10, y10, z10 = s1[k + 1, 0], s1[k + 1, 1], s1[k + 1, 2]
            def g2(v, kkk, okk):
                r = np.take_along_axis(
                    s2[:, v], np.clip(kkk, 0, SR - 1)[None], axis=0)[0]
                return np.where(okk, r, np.nan)
            x01, y01, z01 = g2(0, kk0, ok0), g2(1, kk0, ok0), g2(2, kk0, ok0)
            x11, y11, z11 = g2(0, kk1, ok1), g2(1, kk1, ok1), g2(2, kk1, ok1)
            for diag in (0, 1):
                if diag == 0:
                    ax, ay, az = x00, y00, z00
                    bx, by, bz_ = x10, y10, z10
                    cx, cy, cz = x01, y01, z01
                else:
                    ax, ay, az = x01, y01, z01
                    bx, by, bz_ = x10, y10, z10
                    cx, cy, cz = x11, y11, z11
                area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
                okt = cell_ok & (area2 > 1e-12)
                inv_a = np.where(okt, 1.0 / np.where(okt, area2, 1.0), 0.0)
                e0 = (cx - bx) * (qy - by) - (cy - by) * (qx - bx)
                e1 = (ax - cx) * (qy - cy) - (ay - cy) * (qx - cx)
                e2 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
                l0, l1, l2 = e0 * inv_a, e1 * inv_a, e2 * inv_a
                zz = l0 * az + l1 * bz_ + l2 * cz
                cov = okt & (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & (zz >= -1) & (zz <= 1)
                best = np.where(cov & (zz < best), zz, best)
    kzb = kz[:, blk * 128:(blk + 1) * 128]
    # kernel z can only be <= replay (slot 1 adds candidates); a replay win
    # strictly better than the kernel's means the kernel LOST a candidate.
    lost = (best < kzb - 1e-6)
    miss_m += lost.sum()
    if lost.sum():
        print(f"block {blk}: kernel lost {lost.sum()} replay-covered pixels "
              f"(of 1024)")
print("total kernel-lost pixels in band:", miss_m)
