"""Classify preset-4 (4K/d12, big_grid) holes via host replay (round 5).

Reads /tmp/p4_holes.npz (p4_replay.py) and replays sampled hole pixels
through every prep-side precondition of the big_grid scan kernel — the d10
forensic method (hole_replay.py), with the big_grid differences:

  * bounds pack: w0c (10 bits, 8-row units) | kb (9 bits) | ke (9 bits) |
    multi2 (bit 28); kb/ke are CHUNK-window-relative (global = w0c*8 + k)
  * march window: the whole 128-aligned fetch window [canch_f*128,
    canch_f*128 + CWF), no narrow ``mid``
  * no colfix (standard-variant only as of round 4)

Run on CPU after p4_replay.py: python experiments/p4_classify.py
"""

import os
import sys

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from depthrenderer_tpu import io as dio, meshgen
from depthrenderer_tpu.ops import raster_scan

W, H, D, CULL = 3840, 2160, 12, 0.25
n = 2**D + 1
d = np.load(os.environ.get("P4_NPZ", "/tmp/p4_holes.npz"))
scan_f, control, mvp = d["scan"], d["control"], d["mvp"]

depth_r = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                     (H, W))
verts, uvs, _ = (np.asarray(a) for a in meshgen.grid_mesh(depth_r, D))
verts = verts.copy()
verts[:, 2] *= 4.0
vgrid = verts.reshape(n, n, 3)

cfg = raster_scan.suggest_scan_config(n, W, H, edge_cull_threshold=CULL)
assert cfg.big_grid, cfg
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
print("prep overflow rows:", int(ovf), flush=True)

P64 = np.asarray(mvp, np.float64)
vv = vgrid.reshape(-1, 3)
clip = np.concatenate([vv, np.ones((len(vv), 1))], 1) @ P64.T
inv_w = 1.0 / clip[:, 3]
SX = (((clip[:, 0] * inv_w) + 1) * 0.5 * W).reshape(n, n)
SY = (((clip[:, 1] * inv_w) + 1) * 0.5 * H).reshape(n, n)
ZN = (clip[:, 2] * inv_w).reshape(n, n)
ZM = vgrid[..., 2]

xmin = np.minimum.reduce([SX[:-1, :-1], SX[1:, :-1], SX[:-1, 1:], SX[1:, 1:]])
xmax = np.maximum.reduce([SX[:-1, :-1], SX[1:, :-1], SX[:-1, 1:], SX[1:, 1:]])
ymin = np.minimum.reduce([SY[:-1, :-1], SY[1:, :-1], SY[:-1, 1:], SY[1:, 1:]])
ymax = np.maximum.reduce([SY[:-1, :-1], SY[1:, :-1], SY[:-1, 1:], SY[1:, 1:]])
zspread = (np.maximum.reduce([ZM[:-1, :-1], ZM[1:, :-1], ZM[:-1, 1:],
                              ZM[1:, 1:]])
           - np.minimum.reduce([ZM[:-1, :-1], ZM[1:, :-1], ZM[:-1, 1:],
                                ZM[1:, 1:]]))


def covering_cells(py, px):
    qx, qy = px + 0.5, H - (py + 0.5)
    rr, cc = np.nonzero((xmin <= qx) & (xmax >= qx) & (ymin <= qy)
                        & (ymax >= qy))
    cand = []
    for r, c in zip(rr, cc):
        if zspread[r, c] > CULL:      # edge-culled in BOTH paths
            continue
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


def replay(py, px):
    qx, qy = px + 0.5, H - (py + 0.5)
    cands = covering_cells(py, px)
    if not cands:
        return "no-covering-cell (cull/clip parity)"
    zz, r, c, t_ = cands[0]
    band = py // 8
    blk = px // 128
    chunk = c // 128
    bnd = int(bounds[band, chunk])
    w0c = (bnd & 0x3FF) * 8
    kb = (bnd >> 10) & 0x1FF
    ke = (bnd >> 19) & 0x1FF
    colsy = sy_w[:, c]
    ks = []
    for k in range(kb, ke):
        gk = w0c + k
        if gk + 1 >= colsy.shape[0]:
            break
        if colsy[gk] >= qy > colsy[gk + 1]:
            ks.append(gk)
    if not ks:
        all_ks = [gk for gk in range(0, sy_w.shape[0] - 1)
                  if colsy[gk] >= qy > colsy[gk + 1]]
        if all_ks:
            return (f"crossing outside scanned chunk window "
                    f"[{w0c+kb},{w0c+ke})")
        return "no crossing anywhere (row-edge entry class)"
    ordinal = None
    for i_, gk in enumerate(ks):
        if gk - cfg.off <= r <= gk - cfg.off + cfg.sr - 2:
            ordinal = i_
            break
    if ordinal is None:
        return (f"strip-window: crossings exist, cell row outside "
                f"[k-{cfg.off}, k-{cfg.off}+{cfg.sr-2}]")
    if ordinal >= cfg.nbr:
        return "slot overflow"
    canch_f = (int(canch[blk]) * 8) // 128
    CWF = min(cfg.cw + 128, CL)
    if not (canch_f * 128 <= c < canch_f * 128 + CWF):
        return f"col {c} outside fetch/march window"
    # Sub-split the march/exact-stage loss (round-5 session 2): rank the
    # covering column among the scanline's BRACKETING crossings the way the
    # march does (interval-hit test, z-ascending keys), and check the
    # realign cap against the right column's own crossing row.
    gk_cov = ks[ordinal]
    hits = []
    c_lo = canch_f * 128
    c_hi = min(c_lo + CWF, CL - 1)
    for c2 in range(c_lo, c_hi):
        sy2 = sy_w[:, c2]
        for k in range(kb, ke):
            g = w0c + k
            if g + 1 >= sy2.shape[0]:
                break
            d0, d1 = sy2[g] - qy, sy2[g + 1] - qy
            if d0 >= 0 > d1:
                tt = d0 / max(d0 - d1, 1e-30)
                sxc = sx_w[g, c2] + tt * (sx_w[g + 1, c2] - sx_w[g, c2])
                sy3 = sy_w[:, c2 + 1] if c2 + 1 < CL else sy2
                d0b, d1b = sy3[g] - qy, sy3[g + 1] - qy
                if d0b - d1b != 0:
                    tb = np.clip(d0b / (d0b - d1b), 0.0, 1.0)
                else:
                    tb = 0.5
                sxn = (sx_w[g, c2 + 1]
                       + tb * (sx_w[g + 1, c2 + 1] - sx_w[g, c2 + 1])
                       if c2 + 1 < CL else sxc)
                if min(sxc, sxn) - 1.0 <= qx <= max(sxc, sxn) + 1.0:
                    zk = z_w[g, c2] + tt * (z_w[g + 1, c2] - z_w[g, c2])
                    hits.append((float(zk), c2, g))
    hits.sort()
    # colfix-fan reachability (round-5 session 3): the fixup's fan anchors
    # at the marched top-1 column (hits[0]); bucket the covering column's
    # cell distance from it so residual-after-colfix holes say whether a
    # wider fan (K > 3) would capture them.
    fan_d = abs(c - hits[0][1]) if hits else None
    fan_tag = f" fan-dist {min(fan_d, 9)}" if fan_d is not None else ""
    rank = next((i_ for i_, (_, c2, g) in enumerate(hits)
                 if c2 == c and g == gk_cov), None)
    if rank is None:
        return "march interval miss (crossing not a hit for this pixel)" \
            + fan_tag
    if rank >= cfg.hyps:
        return (f"march rank: covering crossing ranked {rank} "
                f"(hyps={cfg.hyps})") + fan_tag
    # realign: the right column's bracketing crossing row distance
    sy_r = sy_w[:, c + 1] if c + 1 < CL else sy_w[:, c]
    ks_r = [g for g in range(max(w0c + kb, 0),
                             min(w0c + ke, sy_r.shape[0] - 1))
            if sy_r[g] >= qy > sy_r[g + 1]]
    if ks_r and cfg.dmax is not None \
            and min(abs(g - gk_cov) for g in ks_r) > cfg.dmax:
        return f"realign cap: right record {min(abs(g - gk_cov) for g in ks_r)} rows away (dmax={cfg.dmax})"
    return "prep+rank OK: exact-stage loss (tie/float/realign-detail)"


flip = np.abs(scan_f.astype(int) - control.astype(int)).max(-1) > 8
bg_a = (scan_f[..., :3] == 0).all(-1)
bg_b = (control[..., :3] == 0).all(-1)
hole = flip & bg_a & ~bg_b
both = flip & ~bg_a & ~bg_b
print(f"flips {flip.mean()*100:.2f}% | holes {hole.mean()*100:.2f}% | "
      f"both-fg {both.mean()*100:.2f}%", flush=True)

rng = np.random.default_rng(2)
counts = {}
ys, xs = np.nonzero(hole)
NS = int(os.environ.get("NSAMP", "80"))
for idx in rng.choice(len(ys), min(NS, len(ys)), replace=False):
    v = replay(int(ys[idx]), int(xs[idx]))
    counts[v] = counts.get(v, 0) + 1
print("--- hole classes ---")
for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
    print(f"{v:4d}  {k}")

# both-covered winner flips: is the control's winner reachable?
counts2 = {}
ys2, xs2 = np.nonzero(both)
for idx in rng.choice(len(ys2), min(40, len(ys2)), replace=False):
    v = replay(int(ys2[idx]), int(xs2[idx]))
    counts2[v] = counts2.get(v, 0) + 1
print("--- both-covered flip classes (control winner replayed) ---")
for k, v in sorted(counts2.items(), key=lambda kv: -kv[1]):
    print(f"{v:4d}  {k}")
