"""Would an in-kernel column-exhaustive row sweep recover the default holes?

Round-4 quality lever candidate ("colfix"): the dominant hole classes
(strip-window 55%, realign-cap 34% — ROADMAP) have a CROSSING at the pixel's
scanline; only the captured sr-row strip misses the covering cell's row. The
band window (sx, sy, z rows) is resident in VMEM during the block's march, so
an extra gated pass could exact-test EVERY scanned window row at the pixel's
marched bracket column. That recovers a hole iff

  (a) the covering cell's column c IS the marched top-z hit column j* of some
      slot (the fixup only knows j*, not c), and
  (b) the covering row r lies inside the chunk's scanned row range [kb, ke).

This replays both conditions on the host for sampled default-config holes:
for each hole pixel, find the true covering cell (f64, global), rebuild the
kernel's slot crossing curves (f32 prep window), march the pixel, and report
where c ranks among the marched hits — top-1 (recovered), top-2 (recovered at
hyps=2), within +-K columns of j* (recovered by a K-column fan), or not a hit
at all (the crossing positions of c/c+1 do not bracket qx: unrecoverable by
any column-local sweep).

Reads /tmp/frontal_forensic.npz (run frontal_forensic.py first).
"""

import os
import sys

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from depthrenderer_tpu import io as dio, meshgen, transforms
from depthrenderer_tpu.ops import raster_scan

W, H, D = 1920, 1080, 10
n = 2**D + 1
colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   (H, W))
verts, uvs, _ = (np.asarray(a) for a in meshgen.grid_mesh(depth, D))
verts = verts.copy()
verts[:, 2] *= 4.0
vgrid = verts.reshape(n, n, 3)
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
mvp = (proj @ cam).astype(np.float32)

cfg = raster_scan.suggest_scan_config(n, W, H)  # the DEFAULT config
print("config:", cfg, flush=True)

win, w0, bounds, canch, mid, ovf = jax.tree.map(np.asarray, (
    raster_scan._prep_scan_impl(
        jax.numpy.asarray(mvp), jax.numpy.asarray(vgrid), W, H, cfg)))
sx_w, sy_w, z_w = win[0], win[1], win[2]
nbands = -(-H // 8)
CL = sx_w.shape[1]
nchunks = CL // 128
nblocks = -(-W // 128)
bounds = bounds.reshape(nbands, nchunks)
mid = mid.reshape(nbands, nblocks)

# host f64 projection for the ground-truth covering cell
P64 = np.asarray(mvp, np.float64)
vv = vgrid.reshape(-1, 3)
clip = np.concatenate([vv, np.ones((len(vv), 1))], 1) @ P64.T
inv_w = 1.0 / clip[:, 3]
SX = (((clip[:, 0] * inv_w) + 1) * 0.5 * W).reshape(n, n)
SY = (((clip[:, 1] * inv_w) + 1) * 0.5 * H).reshape(n, n)
ZN = (clip[:, 2] * inv_w).reshape(n, n)

d = np.load("/tmp/frontal_forensic.npz")
gt = d["grid_tex"]
st = d["scan_default"]
diff = np.abs(st.astype(int) - gt.astype(int)).max(-1)
holes = (diff > 8) & (st[..., :3] == 0).all(-1) & ~(gt[..., :3] == 0).all(-1)
print(f"default holes: {holes.sum()} px ({holes.mean()*100:.3f}%)")


def covering_cells(py, px):
    qx, qy = px + 0.5, H - (py + 0.5)
    cand = []
    xmin = np.minimum.reduce([SX[:-1, :-1], SX[1:, :-1], SX[:-1, 1:],
                              SX[1:, 1:]])
    xmax = np.maximum.reduce([SX[:-1, :-1], SX[1:, :-1], SX[:-1, 1:],
                              SX[1:, 1:]])
    ymin = np.minimum.reduce([SY[:-1, :-1], SY[1:, :-1], SY[:-1, 1:],
                              SY[1:, 1:]])
    ymax = np.maximum.reduce([SY[:-1, :-1], SY[1:, :-1], SY[:-1, 1:],
                              SY[1:, 1:]])
    rr, cc = np.nonzero((xmin <= qx) & (xmax >= qx) & (ymin <= qy)
                        & (ymax >= qy))
    for r, c in zip(rr, cc):
        pts = [(SX[r, c], SY[r, c], ZN[r, c]),
               (SX[r + 1, c], SY[r + 1, c], ZN[r + 1, c]),
               (SX[r, c + 1], SY[r, c + 1], ZN[r, c + 1]),
               (SX[r + 1, c + 1], SY[r + 1, c + 1], ZN[r + 1, c + 1])]
        for t_, tri in enumerate(((0, 1, 2), (2, 1, 3))):
            (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = (pts[tri[0]],
                                                        pts[tri[1]],
                                                        pts[tri[2]])
            area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
            if area <= 1e-12:
                continue
            e0 = (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
            e1 = (x0 - x2) * (qy - y2) - (y0 - y2) * (qx - x2)
            e2 = (x1 - x0) * (qy - y0) - (y1 - y0) * (qx - x0)
            if e0 >= 0 and e1 >= 0 and e2 >= 0:
                zz = (e0 * z0 + e1 * z1 + e2 * z2) / area
                if -1.0 <= zz <= 1.0:
                    cand.append((zz, r, c, t_))
    return sorted(cand)


def slot_curves(band, qy):
    """f32 replica of the solve's slot crossing curves for one scanline.

    Returns sxc[slot, CL], zc[slot, CL] (FAR where no ordinal-s crossing in
    the scanned range of the column's chunk)."""
    FAR = raster_scan._FAR
    sxc = np.full((cfg.nbr, CL), FAR, np.float32)
    zc = np.full((cfg.nbr, CL), FAR, np.float32)
    w0b = int(w0[band]) * 8
    for chunk in range(nchunks):
        bnd = int(bounds[band, chunk])
        kb, ke = bnd & 0xFFF, (bnd >> 12) & 0xFFF
        if ke <= kb:
            continue
        cols = np.arange(chunk * 128, (chunk + 1) * 128)
        sy_c = sy_w[w0b + kb : w0b + ke + 1, cols]  # (rows+1, 128) f32
        sx_c = sx_w[w0b + kb : w0b + ke + 1, cols]
        zz_c = z_w[w0b + kb : w0b + ke + 1, cols]
        s_hi, s_lo = sy_c[:-1], sy_c[1:]
        cross = (s_hi >= qy) & (s_lo < qy)
        denom = np.maximum(s_hi - s_lo, np.float32(1e-12))
        frac = np.where(cross,
                        (s_hi - np.float32(qy)) / denom, np.float32(0))
        sxx = (sx_c[:-1] + (sx_c[1:] - sx_c[:-1]) * frac).astype(np.float32)
        zxx = (zz_c[:-1] + (zz_c[1:] - zz_c[:-1]) * frac).astype(np.float32)
        ordn = np.cumsum(cross, 0) - 1
        for s in range(cfg.nbr):
            hit = cross & (ordn == s)
            kidx = hit.argmax(0)
            any_ = hit.any(0)
            sxc[s, cols[any_]] = sxx[kidx[any_], np.arange(128)[any_]]
            zc[s, cols[any_]] = zxx[kidx[any_], np.arange(128)[any_]]
    return sxc, zc


def march_hits(sxc_s, zc_s, qx, lo, hi):
    """Marched hit columns in window [lo, hi), ranked by zc (asc)."""
    FAR = raster_scan._FAR
    j = np.arange(lo, hi - 1)
    a, b = sxc_s[j], sxc_s[j + 1]
    mn, mx = np.minimum(a, b), np.maximum(a, b)
    hit = (qx >= mn) & (qx <= mx)
    cand = j[hit]
    return cand[np.argsort(zc_s[cand], kind="stable")]


rng = np.random.default_rng(2)
ys, xs = np.nonzero(holes)
N = min(400, len(ys))
sample = rng.choice(len(ys), N, replace=False)

ranks = {"top1": 0, "top2": 0, "hit_lower": 0, "not_hit": 0,
         "fan1": 0, "fan2": 0, "fan4": 0, "row_oob": 0, "no_cell": 0,
         "outside_march": 0}
for idx in sample:
    py, px = int(ys[idx]), int(xs[idx])
    qx, qy = px + 0.5, H - (py + 0.5)
    cands = covering_cells(py, px)
    if not cands:
        ranks["no_cell"] += 1
        continue
    zz, r, c, t_ = cands[0]
    band, blk = py // 8, px // 128
    canch_m = int(canch[blk]) * 8
    mb = int(mid[band, blk])
    if mb >= 0:
        lo, hi = canch_m + mb * 8, canch_m + mb * 8 + 128
    else:
        lo, hi = canch_m, canch_m + cfg.cw
    if not (lo <= c < hi - 1):
        ranks["outside_march"] += 1
        continue
    # row-bound check (condition b)
    chunk = c // 128
    w0b = int(w0[band]) * 8
    bnd = int(bounds[band, chunk])
    kb, ke = bnd & 0xFFF, (bnd >> 12) & 0xFFF
    if not (kb <= (r - w0b) < ke):
        ranks["row_oob"] += 1
        continue
    sxc, zc = slot_curves(band, qy)
    best_dist = None
    rank = None
    for s in range(cfg.nbr):
        order = march_hits(sxc[s], zc[s], qx, lo, hi)
        if len(order) == 0:
            continue
        if c in order:
            rk = int(np.nonzero(order == c)[0][0])
            rank = rk if rank is None else min(rank, rk)
        dist = abs(int(order[0]) - c)
        best_dist = dist if best_dist is None else min(best_dist, dist)
    if rank == 0:
        ranks["top1"] += 1
    elif rank == 1:
        ranks["top2"] += 1
    elif rank is not None:
        ranks["hit_lower"] += 1
    else:
        ranks["not_hit"] += 1
    if best_dist is not None:
        if best_dist <= 1:
            ranks["fan1"] += 1
        if best_dist <= 2:
            ranks["fan2"] += 1
        if best_dist <= 4:
            ranks["fan4"] += 1

ranks["gfan0"] = ranks.get("gfan0", 0)
# Policy replay: ONE fan around the GLOBAL top-1 (argmin zc across both
# slots' hits) — what a single-fan kernel fixup would actually test.
gfan = {0: 0, 1: 0, 2: 0, 3: 0}
for idx in sample:
    py, px = int(ys[idx]), int(xs[idx])
    qx, qy = px + 0.5, H - (py + 0.5)
    cands = covering_cells(py, px)
    if not cands:
        continue
    zz, r, c, t_ = cands[0]
    band, blk = py // 8, px // 128
    canch_m = int(canch[blk]) * 8
    mb = int(mid[band, blk])
    if mb >= 0:
        lo, hi = canch_m + mb * 8, canch_m + mb * 8 + 128
    else:
        lo, hi = canch_m, canch_m + cfg.cw
    sxc, zc = slot_curves(band, qy)
    best_j, best_z = None, None
    for s in range(cfg.nbr):
        order = march_hits(sxc[s], zc[s], qx, lo, hi)
        if len(order) and (best_z is None or zc[s, order[0]] < best_z):
            best_z = zc[s, order[0]]
            best_j = int(order[0])
    if best_j is None:
        continue
    for K in gfan:
        if abs(best_j - c) <= K:
            gfan[K] += 1

print(f"\nsampled {N} default holes:")
print(f"  ONE fan around GLOBAL top-1: K=0 {gfan[0]} ({gfan[0]/N*100:.0f}%)"
      f"  K=1 {gfan[1]} ({gfan[1]/N*100:.0f}%)  K=2 {gfan[2]}"
      f" ({gfan[2]/N*100:.0f}%)  K=3 {gfan[3]} ({gfan[3]/N*100:.0f}%)")
print(f"  covering col == marched top-1 (some slot): {ranks['top1']}"
      f" ({ranks['top1']/N*100:.0f}%)  <- base colfix recovery")
print(f"  covering col == marched top-2:            {ranks['top2']}")
print(f"  covering col a lower-ranked hit:          {ranks['hit_lower']}")
print(f"  covering col NOT a marched hit:           {ranks['not_hit']}")
print(f"  |top1 - c| <= 1 / 2 / 4 (any slot):       {ranks['fan1']} / "
      f"{ranks['fan2']} / {ranks['fan4']}")
print(f"  covering row outside chunk scan bounds:   {ranks['row_oob']}")
print(f"  covering col outside march window:        {ranks['outside_march']}")
print(f"  no covering cell on host:                 {ranks['no_cell']}")
