"""Host-replay the residual frontal hole patches through prep's logic.

frontal_forensic.py found multi-thousand-pixel connected hole patches at the
identity view that survive dual_col+hyps2+row_edge. For sample pixels inside
the biggest patches this replays, in f64 on the host, every prep-side
precondition the kernel needs to find the covering cell:

  1. which grid cell actually covers the pixel (exact edge tests, searched
     globally via the projected cell bboxes);
  2. does the cell's anchor column cross the pixel's scanline inside the
     scanned row range [w0+kb, w0+ke) of its chunk (hull bounds)?
  3. is the crossing's bracket row within the strip window (off/sr) of the
     covering cell's row?
  4. is the column inside the block's march window (canch/cw) and the
     narrow-march window (mid)?
  5. which crossing ordinal is it (slot overflow if >= nbr)?

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

cfg = raster_scan.suggest_scan_config(n, W, H)
print("config:", cfg, flush=True)

# --- prep outputs (the exact kernel inputs) ---
win, w0, bounds, canch, mid, ovf = jax.tree.map(np.asarray, (
    raster_scan._prep_scan_impl(
        jax.numpy.asarray(mvp), jax.numpy.asarray(vgrid), W, H, cfg)))
sx_w, sy_w = win[0], win[1]
nbands = -(-H // 8)
CL = sx_w.shape[1]
nchunks = CL // 128
nblocks = -(-W // 128)
bounds = bounds.reshape(nbands, nchunks)
mid = mid.reshape(nbands, nblocks)
print("prep overflow rows:", int(ovf), flush=True)

# --- host f64 projection (same as the kernel's inputs, but exact) ---
P64 = np.asarray(mvp, np.float64)
vv = vgrid.reshape(-1, 3)
clip = np.concatenate([vv, np.ones((len(vv), 1))], 1) @ P64.T
inv_w = 1.0 / clip[:, 3]
SX = (((clip[:, 0] * inv_w) + 1) * 0.5 * W).reshape(n, n)
SY = (((clip[:, 1] * inv_w) + 1) * 0.5 * H).reshape(n, n)
ZN = (clip[:, 2] * inv_w).reshape(n, n)

# --- hole pixels from the saved forensic ---
d = np.load("/tmp/frontal_forensic.npz")
gt = d["grid_tex"]
st = d["scan_quality"]  # the residual class: survives even quality mode
diff = np.abs(st.astype(int) - gt.astype(int)).max(-1)
holes = (diff > 8) & (st[..., :3] == 0).all(-1) & ~(gt[..., :3] == 0).all(-1)
try:
    from scipy import ndimage

    lab, ncomp = ndimage.label(holes)
    sizes = np.bincount(lab.ravel())[1:]
    big_ids = np.argsort(sizes)[::-1][:6] + 1
except ImportError:
    lab, big_ids = None, []

rng = np.random.default_rng(1)


def covering_cells(py, px):
    """All cells whose triangles exactly cover pixel (py, px), with depth."""
    qx, qy = px + 0.5, H - (py + 0.5)
    # bbox search limited to cells whose projected x/y range contains (qx,qy)
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


def replay(py, px):
    qx, qy = px + 0.5, H - (py + 0.5)
    cands = covering_cells(py, px)
    if not cands:
        print(f"  ({py},{px}): NO covering cell on host either "
              f"(grid-bg?)")
        return "none"
    zz, r, c, t_ = cands[0]
    band = py // 8
    blk = px // 128
    chunk = c // 128
    w0b = int(w0[band]) * 8
    bnd = bounds[band, chunk]
    kb, ke = int(bnd & 0xFFF), int((bnd >> 12) & 0xFFF)
    # column c's crossings of this scanline in the scanned range, f32 fidelity
    colsy = sy_w[:, c]
    ks = []
    for k in range(kb, ke):
        gk = w0b + k
        if colsy[gk] >= qy > colsy[gk + 1]:
            ks.append(gk)
    verdicts = []
    if not ks:
        # does it cross anywhere in the whole window?
        all_ks = [gk for gk in range(0, sy_w.shape[0] - 1)
                  if colsy[gk] >= qy > colsy[gk + 1]]
        verdicts.append(f"NO crossing in scanned [{w0b+kb},{w0b+ke}) "
                        f"(all-window crossings at {all_ks[:4]})")
    else:
        ordinal = None
        for i_, gk in enumerate(ks):
            if gk - cfg.off <= r <= gk - cfg.off + cfg.sr - 2:
                ordinal = i_
                anchor = gk
                break
        if ordinal is None:
            verdicts.append(
                f"crossings at rows {ks} but cell row {r} outside strip "
                f"[k-{cfg.off}, k-{cfg.off}+{cfg.sr-2}] for all")
        elif ordinal >= cfg.nbr:
            verdicts.append(f"slot overflow: ordinal {ordinal} >= nbr")
        else:
            canch_m = int(canch[blk]) * 8
            if not (canch_m <= c < canch_m + cfg.cw):
                verdicts.append(f"col {c} outside march window "
                                f"[{canch_m}, {canch_m+cfg.cw})")
            else:
                mb = int(mid[band, blk])
                if mb >= 0 and not (canch_m + mb * 8 <= c
                                    < canch_m + mb * 8 + 127):
                    verdicts.append(f"col {c} outside NARROW window "
                                    f"(mid={mb}, canch={canch_m})")
                else:
                    verdicts.append("prep OK: march/exact-stage loss "
                                    "(rank or realign or tie)")
    print(f"  ({py},{px}) cell (r={r},c={c},tri={t_}) z={zz:.4f} "
          f"band {band} blk {blk}: {'; '.join(verdicts)}")
    return verdicts[0].split(":")[0]


counts = {}
if lab is not None:
    for comp in big_ids:
        ys, xs = np.nonzero(lab == comp)
        print(f"patch size {len(ys)} rows {ys.min()}-{ys.max()} cols "
              f"{xs.min()}-{xs.max()}:")
        for idx in rng.choice(len(ys), min(4, len(ys)), replace=False):
            v = replay(int(ys[idx]), int(xs[idx]))
            counts[v] = counts.get(v, 0) + 1
# also a random sample across all holes
ys, xs = np.nonzero(holes)
print("random hole sample:")
for idx in rng.choice(len(ys), min(30, len(ys)), replace=False):
    v = replay(int(ys[idx]), int(xs[idx]))
    counts[v] = counts.get(v, 0) + 1
print("\nverdict counts:", counts)
