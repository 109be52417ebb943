"""Do per-pixel winners persist between adjacent frames? (round 5)

The round-4 verdict's #1 ask proposes temporal coherence: solve frame 0
fully, seed frames 1..15 from the previous frame's records and verify-only.
That presumes the quantities being seeded persist. This measures, on the
bench sway path at d10/1080p (adjacent frames of the 64-frame 60 fps clip):

  * winner-cell persistence: fraction of pixels whose winning CELL (r, c)
    is identical / within +-1 row and column of the previous frame's
  * winner-column persistence: same for the column only (the march seed)
  * crossing-row drift: per (scanline, column), how far the bracket row of
    the first crossing moves between frames (the solve seed)

Truth winners come from the same capped forward z-buffer as
cellrec_proto.py (cap artifacts cancel: both frames use the same caps).

Usage: python experiments/temporal_persistence.py [density [width height [f0]]]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import os

os.environ.setdefault("DEPTHRENDERER_PLATFORM", "cpu")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import cellrec_proto as cp  # reuse scene + truth machinery

D, W, H = cp.D, cp.W, cp.H
F0 = int(sys.argv[4]) if len(sys.argv) > 4 else 40
n = cp.n

mvp_a = cp.proj @ cp.cam @ cp.views[F0]
mvp_b = cp.proj @ cp.cam @ cp.views[F0 + 1]


def winners(mvp):
    sx, sy, z, bad = cp.project(mvp)
    tid, zt, nbig = cp.truth_forward(sx, sy, z, bad)
    return tid, (sx, sy, z, bad)


tid_a, proj_a = winners(mvp_a)
tid_b, proj_b = winners(mvp_b)

cov = (tid_a >= 0) & (tid_b >= 0)
cell_a = tid_a >> 1
cell_b = tid_b >> 1
r_a, c_a = cell_a // (n - 1), cell_a % (n - 1)
r_b, c_b = cell_b // (n - 1), cell_b % (n - 1)
same = cov & (cell_a == cell_b)
near1 = cov & (np.abs(r_a - r_b) <= 1) & (np.abs(c_a - c_b) <= 1)
near2 = cov & (np.abs(r_a - r_b) <= 2) & (np.abs(c_a - c_b) <= 2)
col_same = cov & (c_a == c_b)
col_near1 = cov & (np.abs(c_a - c_b) <= 1)
ncov = cov.sum()
print(f"[frames {F0}->{F0+1}] d{D} {W}x{H}: winner cell identical "
      f"{same.sum()/ncov*100:.1f}%, within +-1 {near1.sum()/ncov*100:.1f}%, "
      f"within +-2 {near2.sum()/ncov*100:.1f}%")
print(f"  winner column identical {col_same.sum()/ncov*100:.1f}%, "
      f"within +-1 {col_near1.sum()/ncov*100:.1f}%")

# crossing-row drift per (scanline, column-polyline): first row k where
# sy[k, c] >= qy > sy[k+1, c]
for name, (sx, sy, z, bad) in (("A", proj_a), ("B", proj_b)):
    pass
sy_a = proj_a[1]
sy_b = proj_b[1]
qys = np.arange(H) + 0.5  # sample every 8th scanline to bound memory
drifts = []
for k in range(0, H, 8):
    qy = qys[k]
    ca = (sy_a[:-1] >= qy) & (sy_a[1:] < qy)    # (n-1, n) crossings
    cb = (sy_b[:-1] >= qy) & (sy_b[1:] < qy)
    fa = np.where(ca.any(0), ca.argmax(0), -1)  # first crossing row per col
    fb = np.where(cb.any(0), cb.argmax(0), -1)
    both = (fa >= 0) & (fb >= 0)
    drifts.append(np.abs(fa[both] - fb[both]))
dr = np.concatenate(drifts)
print(f"  first-crossing row drift: p50={np.percentile(dr, 50):.0f} "
      f"p90={np.percentile(dr, 90):.0f} p99={np.percentile(dr, 99):.0f} "
      f"p99.9={np.percentile(dr, 99.9):.0f} max={dr.max()}")
