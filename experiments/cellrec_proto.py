"""Host-side statistical prototype of CELL-STRADDLE records (round 5).

The round-4 default ships colfix (in-kernel hole fill, ~6 ms/frame at 20%
block fire rate) because crossing-anchored records structurally miss covering
cells whose row sits outside the captured strip (strip-window 55% +
realign-cap 34% of holes, ROADMAP forensics). This prototype measures the
fidelity ceiling of a REDESIGNED record semantics before any kernel surgery:

  * A record exists at (scanline y, column c) for every grid cell (r, c)
    whose 4-corner projected-y interval contains qy ("y-straddle") — a
    NECESSARY condition for the cell to cover any pixel of that scanline,
    so every covering cell generates a record at its own row. No strips,
    no realign, no colfix needed: the record IS the cell (self-contained
    4 corners, like dual_col capture).
  * Slots: per (y, c) keep the best ``nbr`` records by zkey = min corner
    ndc-z (z-PRIORITY, not first-in-row-order) — overflow drops only
    farther sheets.
  * March: per pixel, hit columns = records whose 4-corner x interval
    contains qx (necessary for coverage); keep the top ``hyps`` by zkey
    per slot; exact-test those cells only.

Questions answered per view (frontal + sway40 at the bench scene):
  1. record count distribution per (y, c)  -> slot overflow rate at nbr
  2. march hit-column count per pixel      -> hyps miss rate
  3. end-to-end: does the candidate set contain the TRUE winner cell
     (exhaustive forward z-buffer truth)?  -> ceiling flip rate

Usage: python experiments/cellrec_proto.py [density [width height]]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

D = int(sys.argv[1]) if len(sys.argv) > 1 else 8
W = int(sys.argv[2]) if len(sys.argv) > 2 else 640
H = int(sys.argv[3]) if len(sys.argv) > 3 else 480
import os as _os
NBRS = tuple(int(x) for x in _os.environ.get("NBRS", "2,3").split(","))
HYPS = tuple(int(x) for x in _os.environ.get("HYPS", "1,2").split(","))
CAPY = int(_os.environ.get("CAPY", "48")); CAPX = int(_os.environ.get("CAPX", "24"))

import os

os.environ.setdefault("DEPTHRENDERER_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from depthrenderer_tpu import animation, io as dio, meshgen, transforms

colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   (H, W))
n = 2**D + 1
verts, _, _ = meshgen.grid_mesh(depth, D)
verts = np.asarray(verts, np.float64).copy()
verts[:, 2] *= 4.0

sway = animation.default_sway(5.0)
times = animation.frame_times(64, 60.0)
views = np.asarray(sway.batch(times))
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))


def project(mvp):
    ones = np.ones((len(verts), 1))
    clip = np.concatenate([verts, ones], axis=1) @ np.asarray(mvp, np.float64).T
    w = clip[:, 3]
    inv_w = np.where(np.abs(w) > 1e-30, 1.0 / w, 0.0)
    ndc = clip[:, :3] * inv_w[:, None]
    sx = (ndc[:, 0] + 1.0) * 0.5 * W
    sy = (ndc[:, 1] + 1.0) * 0.5 * H
    bad = w <= 1e-9
    return (sx.reshape(n, n), sy.reshape(n, n), ndc[:, 2].reshape(n, n),
            bad.reshape(n, n))


def cell_corner_arrays(sx, sy, z, bad):
    """Per-cell 4-corner arrays, cells flattened (r*(n-1)+c)."""
    c00 = (sx[:-1, :-1], sy[:-1, :-1], z[:-1, :-1])
    c10 = (sx[1:, :-1], sy[1:, :-1], z[1:, :-1])
    c01 = (sx[:-1, 1:], sy[:-1, 1:], z[:-1, 1:])
    c11 = (sx[1:, 1:], sy[1:, 1:], z[1:, 1:])
    anybad = bad[:-1, :-1] | bad[1:, :-1] | bad[:-1, 1:] | bad[1:, 1:]
    return c00, c10, c01, c11, anybad


def tri_cover_z(px, py, xs, ys, zs):
    """Coverage + interpolated ndc z of tri (v0, v1, v2) at (px, py).

    Kernel semantics: doubled signed area > 0 (CCW front), all three edge
    functions on the same side, z from barycentric in screen space.
    """
    x0, x1, x2 = xs
    y0, y1, y2 = ys
    z0, z1, z2 = zs
    e0 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
    e1 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    e2 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    cov = (area > 1e-12) & (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
    lam1 = np.where(cov, e2 / np.maximum(area, 1e-30), 0.0)
    lam2 = np.where(cov, e0 / np.maximum(area, 1e-30), 0.0)
    zi = z0 + lam1 * (z1 - z0) + lam2 * (z2 - z0)
    return cov, np.where(cov, zi, np.inf)


def cell_cover_z(px, py, corners):
    """Min-z coverage of the two triangles (a,b,c),(c,b,d) of a cell.

    a = top-left (r, c), b = bottom-left (r+1, c), c = top-right (r, c+1),
    d = bottom-right (r+1, c+1) — meshgen index pattern (reference
    render.py:519-532). Tie to lower tri id (tri0 = 2*cell, tri1 = +1).
    """
    (ax, ay, az), (bx, by, bz), (cx, cy, cz), (dx, dy, dz) = corners
    cov0, z0 = tri_cover_z(px, py, (ax, bx, cx), (ay, by, cy), (az, bz, cz))
    cov1, z1 = tri_cover_z(px, py, (cx, bx, dx), (cy, by, dy), (cz, bz, dz))
    # winner among the two tris: min z, tie -> tri 0
    zmin = np.minimum(z0, z1)
    tid = np.where(z1 < z0, 1, 0)
    return cov0 | cov1, zmin, tid


def truth_forward(sx, sy, z, bad, cap_y=None, cap_x=None):
    cap_y = cap_y or CAPY; cap_x = cap_x or CAPX
    """Exhaustive forward z-buffer truth: winner cell id + z per pixel.

    Vectorised over cells x a capped bbox offset grid; cells whose bbox
    exceeds the cap are counted (stretched folds) and tested at the capped
    size (their coverage loss is reported, not silently ignored).
    """
    c00, c10, c01, c11, anybad = cell_corner_arrays(sx, sy, z, bad)
    ncell = (n - 1) * (n - 1)
    xs = np.stack([c00[0], c10[0], c01[0], c11[0]], 0).reshape(4, ncell)
    ys = np.stack([c00[1], c10[1], c01[1], c11[1]], 0).reshape(4, ncell)
    zs = np.stack([c00[2], c10[2], c01[2], c11[2]], 0).reshape(4, ncell)
    okc = ~anybad.reshape(ncell)
    x_lo = np.floor(xs.min(0) - 0.5).astype(np.int64)
    y_lo = np.floor(ys.min(0) - 0.5).astype(np.int64)
    x_n = np.ceil(xs.max(0) + 0.5).astype(np.int64) - x_lo
    y_n = np.ceil(ys.max(0) + 0.5).astype(np.int64) - y_lo
    big = okc & ((x_n > cap_x) | (y_n > cap_y))
    zbuf = np.full(H * W, np.inf)
    idbuf = np.full(H * W, -1, np.int64)
    keybuf = np.full(H * W, np.inf)
    sel = okc & (xs.max(0) > -1) & (xs.min(0) < W + 1) \
        & (ys.max(0) > -1) & (ys.min(0) < H + 1)
    idx = np.nonzero(sel)[0]
    corners = [(xs[k, idx], ys[k, idx], zs[k, idx]) for k in range(4)]
    for oy in range(cap_y):
        for ox in range(cap_x):
            pyi = y_lo[idx] + oy
            pxi = x_lo[idx] + ox
            inb = (pyi >= 0) & (pyi < H) & (pxi >= 0) & (pxi < W)
            if not inb.any():
                continue
            px = pxi + 0.5
            py = pyi + 0.5
            cov, zmin, tid = cell_cover_z(px, py, corners)
            cov &= inb
            if not cov.any():
                continue
            # scatter-min by (z, tri id) — lowest id wins ties
            tri_id = idx * 2 + tid
            # pack: z primary, id secondary. ids < 2^31; z finite.
            pix = (H - 1 - pyi) * W + pxi  # screen row = H-1-y (y up)
            cidx = np.nonzero(cov)[0]
            key = zmin[cidx] + tri_id[cidx] * 1e-18  # id only breaks exact ties
            np.minimum.at(keybuf, pix[cidx], key)
            # second pass below resolves ids
    # resolve ids: repeat scatter, claim pixels whose key matches
    for oy in range(cap_y):
        for ox in range(cap_x):
            pyi = y_lo[idx] + oy
            pxi = x_lo[idx] + ox
            inb = (pyi >= 0) & (pyi < H) & (pxi >= 0) & (pxi < W)
            if not inb.any():
                continue
            px = pxi + 0.5
            py = pyi + 0.5
            cov, zmin, tid = cell_cover_z(px, py, corners)
            cov &= inb
            if not cov.any():
                continue
            tri_id = idx * 2 + tid
            pix = (H - 1 - pyi) * W + pxi
            cidx = np.nonzero(cov)[0]
            key = zmin[cidx] + tri_id[cidx] * 1e-18
            m = key == keybuf[pix[cidx]]
            idbuf[pix[cidx[m]]] = tri_id[cidx[m]]
            zbuf[pix[cidx[m]]] = zmin[cidx[m]]
    return idbuf.reshape(H, W), zbuf.reshape(H, W), int(big.sum())


def simulate(sx, sy, z, bad, nbr, hyps):
    """Cell-record pipeline sim -> winner tri id per pixel (or -1)."""
    c00, c10, c01, c11, anybad = cell_corner_arrays(sx, sy, z, bad)
    ncell = (n - 1) * (n - 1)
    xs = np.stack([c00[0], c10[0], c01[0], c11[0]], 0).reshape(4, ncell)
    ys = np.stack([c00[1], c10[1], c01[1], c11[1]], 0).reshape(4, ncell)
    zs = np.stack([c00[2], c10[2], c01[2], c11[2]], 0).reshape(4, ncell)
    okc = ~anybad.reshape(ncell)
    mny, mxy = ys.min(0), ys.max(0)
    mnx, mxx = xs.min(0), xs.max(0)
    zkey = zs.min(0)

    # ---- records: (cell, scanline) pairs where qy in [mny, mxy] ----
    # scanline qy = H - yi - 0.5 for output row yi (kernel qy convention)
    # qy values are H-0.5, H-1.5, ..., 0.5 i.e. qy = k + 0.5, k = 0..H-1
    k_lo = np.ceil(mny - 0.5).astype(np.int64)      # smallest k: qy >= mny
    k_hi = np.floor(mxy - 0.5).astype(np.int64)     # largest k: qy <= mxy
    k_lo = np.maximum(k_lo, 0)
    k_hi = np.minimum(k_hi, H - 1)
    cnt = np.maximum(k_hi - k_lo + 1, 0) * okc
    tot = int(cnt.sum())
    cell_rep = np.repeat(np.arange(ncell), cnt)
    offs = np.arange(tot) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    k_rec = k_lo[cell_rep] + offs                   # scanline index k
    col_rec = cell_rep % (n - 1)
    # record stats per (k, col)
    slotkey = k_rec * (n - 1) + col_rec
    order = np.lexsort((zkey[cell_rep], slotkey))
    sk_s = slotkey[order]
    first = np.r_[True, sk_s[1:] != sk_s[:-1]]
    grp = np.cumsum(first) - 1
    rank = np.arange(tot) - np.repeat(
        np.nonzero(first)[0], np.diff(np.r_[np.nonzero(first)[0], tot]))
    nrec_grp = np.bincount(grp)
    kept = rank < nbr
    kept_idx = order[kept]                          # indices into record list
    slot_k = rank[kept]                             # slot id of each record
    # ---- march: per record, pixel hit range = the cell's SCANLINE SEGMENT
    # (quad ∩ horizontal line qy via edge crossings; conservative min..max
    # for non-convex folded quads). The bbox [mnx, mxx] was measured too
    # loose: adjacent slanted cells' bboxes overlap several pixel columns,
    # the coarse min4z rank then picks the wrong neighbour at hyps=1
    # (6-8% winner misses at d8/VGA). Segments of one sheet tile the
    # scanline, so hits per (pixel, slot) drop to ~#sheets.
    cell_k = cell_rep[kept_idx]
    k_k = k_rec[kept_idx]
    qy_k = k_k + 0.5
    xs_k = xs[:, cell_k]
    ys_k = ys[:, cell_k]
    seg_lo = np.full(len(cell_k), np.inf)
    seg_hi = np.full(len(cell_k), -np.inf)
    # quad edge order a(0,tl) -> b(1,bl) -> d(3,br) -> c(2,tr) -> a
    for e0, e1 in ((0, 1), (1, 3), (3, 2), (2, 0)):
        y0, y1 = ys_k[e0], ys_k[e1]
        x0, x1 = xs_k[e0], xs_k[e1]
        crosses = (np.minimum(y0, y1) <= qy_k) & (qy_k <= np.maximum(y0, y1))
        dy = y0 - y1
        t = np.where(np.abs(dy) > 1e-30, (y0 - qy_k) / np.where(dy == 0, 1, dy),
                     0.0)
        xc = x0 + t * (x1 - x0)
        # horizontal edges at qy: both endpoints are crossings
        horiz = crosses & (np.abs(dy) <= 1e-30)
        seg_lo = np.where(crosses, np.minimum(seg_lo, np.where(
            horiz, np.minimum(x0, x1), xc)), seg_lo)
        seg_hi = np.where(crosses, np.maximum(seg_hi, np.where(
            horiz, np.maximum(x0, x1), xc)), seg_hi)
    px_lo = np.ceil(seg_lo - 0.5).astype(np.int64)
    px_hi = np.floor(seg_hi - 0.5).astype(np.int64)
    px_lo = np.maximum(px_lo, 0)
    px_hi = np.minimum(px_hi, W - 1)
    pcnt = np.maximum(px_hi - px_lo + 1, 0)
    ptot = int(pcnt.sum())
    rec_rep = np.repeat(np.arange(len(cell_k)), pcnt)
    poffs = np.arange(ptot) - np.repeat(np.cumsum(pcnt) - pcnt, pcnt)
    px_pair = px_lo[rec_rep] + poffs
    # The kernel's march runs PER SLOT: per (pixel, slot), top ``hyps``
    # hit columns by zkey reach the exact tests. Model exactly that.
    pixid = k_k[rec_rep] * W + px_pair
    pixslot = pixid * 8 + slot_k[rec_rep]
    zk_pair = zkey[cell_k[rec_rep]]
    porder = np.lexsort((zk_pair, pixslot))
    pix_s = pixslot[porder]
    pfirst = np.r_[True, pix_s[1:] != pix_s[:-1]]
    pstart = np.nonzero(pfirst)[0]
    prank = np.arange(ptot) - np.repeat(pstart, np.diff(np.r_[pstart, ptot]))
    hit_cnt = np.bincount(np.cumsum(pfirst) - 1)
    pkept = prank < hyps
    cand = porder[pkept]
    # ---- exact tests on candidates ----
    cell_c = cell_k[rec_rep[cand]]
    k_c = k_k[rec_rep[cand]]
    px_c = px_pair[cand]
    qx = px_c + 0.5
    qy = k_c + 0.5
    corners = [(xs[kk, cell_c], ys[kk, cell_c], zs[kk, cell_c])
               for kk in range(4)]
    cov, zmin, tid = cell_cover_z(qx, qy, corners)
    tri_c = cell_c * 2 + tid
    scr = (H - 1 - k_c) * W + px_c
    keyb = np.full(H * W, np.inf)
    idb = np.full(H * W, -1, np.int64)
    ci = np.nonzero(cov)[0]
    key = zmin[ci] + tri_c[ci] * 1e-18
    np.minimum.at(keyb, scr[ci], key)
    m = key == keyb[scr[ci]]
    idb[scr[ci[m]]] = tri_c[ci[m]]
    zb = np.where(np.isfinite(keyb), keyb, np.inf).reshape(H, W)
    stats = {
        "records_total": tot,
        "records_per_yc_p99": float(np.percentile(nrec_grp, 99)),
        "records_per_yc_max": int(nrec_grp.max()),
        "slot_overflow_frac": float((nrec_grp > nbr).mean()),
        "march_hits_per_px_p99": float(np.percentile(hit_cnt, 99)),
        "march_overflow_frac": float((hit_cnt > hyps).mean()),
    }
    return idb.reshape(H, W), zb, stats


def run_view(name, mvp):
    t0 = time.time()
    sx, sy, z, bad = project(mvp)
    tid_t, z_t, nbig = truth_forward(sx, sy, z, bad)
    covered = tid_t >= 0
    print(f"[{name}] truth: {covered.mean()*100:.1f}% covered, "
          f"{nbig} bbox-capped cells ({time.time()-t0:.0f}s)")
    for nbr in NBRS:
        for hyps in HYPS:
            tid_s, z_s, st = simulate(sx, sy, z, bad, nbr, hyps)
            # z-based verdicts: the capped truth can itself miss stretched
            # cells, so only count the sim WORSE (farther winner / hole)
            # than truth. sim-better = truth's cap artifact, reported apart.
            eps = 1e-9
            worse = z_s > z_t + eps          # sim missed a nearer cell
            hole = worse & ~np.isfinite(z_s)
            better = z_s < z_t - eps
            tie_flip = (np.abs(z_s - z_t) <= eps) & (tid_s != tid_t) \
                & covered
            print(f"[{name}] nbr={nbr} hyps={hyps}: "
                  f"sim-worse {worse.mean()*100:.4f}% "
                  f"(holes {hole.mean()*100:.4f}%, "
                  f"tie-flips {tie_flip.mean()*100:.4f}%, "
                  f"sim-better {better.mean()*100:.4f}%) | "
                  f"rec/yc p99={st['records_per_yc_p99']:.0f} "
                  f"max={st['records_per_yc_max']} "
                  f"slot-ovf {st['slot_overflow_frac']*100:.3f}% "
                  f"march p99={st['march_hits_per_px_p99']:.0f} "
                  f"march-ovf {st['march_overflow_frac']*100:.3f}%")


if __name__ == "__main__":
    run_view("frontal", proj @ cam)
    run_view("sway40", proj @ cam @ views[40])
