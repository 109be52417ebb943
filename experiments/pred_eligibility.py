"""Measure predicted-column-march eligibility (round-4 perf lever design).

The dense march sign-tests Lw x 128 pairs per (band, block, slot); the
proposed replacement predicts each pixel's bracket column with a per-block
affine fit c_pred(x) = a*x + b and gathers only columns c_pred-K..c_pred+K —
valid iff prep can PROVE completeness:

  (1) every candidate pair column c (rigorous round-3 interval [pmin_c,
      pmax_c]) satisfies |c - c_pred(x)| <= K-1 for all x in its interval
      intersected with the block (margin 1 for floor + float);
  (2) no column in the block's march window can have a FAR curve entry
      (a (real, FAR) pair brackets every pixel to its right — no locality),
      guaranteed when every window column's polyline enters the band from
      above and exits below over the scanned rows.

This prototype computes the flag on CPU for the bench scene at d10/1080p
(identity + sway views) and reports eligibility rates per K — the go/no-go
for the kernel implementation.
"""

import os
import sys

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops import raster_scan


def eligibility(mvp, vgrid_np, W, H, cfg, Ks=(3, 4, 5, 6)):
    n_r, n_c = vgrid_np.shape[:2]
    win, w0, bounds, canch, mid, ovf = jax.tree.map(np.asarray, (
        raster_scan._prep_scan_impl(
            jax.numpy.asarray(mvp), jax.numpy.asarray(vgrid_np), W, H, cfg)))
    sx, sy = win[0], win[1]           # (RPAD, CL) padded
    RPAD, CL = sx.shape
    nbands = -(-H // 8)
    nchunks = CL // 128
    nblocks = -(-W // 128)
    bounds = bounds.reshape(nbands, nchunks)
    kb = bounds & 0xFFF
    ke = (bounds >> 12) & 0xFFF
    w0r = w0.astype(np.int64) * 8     # (nbands,)

    # Per-column sx extrema over the band's scanned window (rows w0+kb ..
    # w0+ke inclusive of the +1 row the crossing interpolates).
    qy_top = H - (np.arange(nbands) * 8 + 0.5)
    qy_bot = H - (np.arange(nbands) * 8 + 7.5)

    nwb = cfg.rmax // 8
    stats = {K: [0, 0] for K in Ks}   # eligible, total (nonempty blocks)
    mid = mid.reshape(nbands, nblocks)
    for b in range(nbands):
        # window extrema per column (use the full band window like prep's
        # sparse table: rows w0 .. w0+rmax)
        r0 = w0r[b]
        rows = slice(r0, min(r0 + cfg.rmax, RPAD))
        smin = sx[rows].min(axis=0)
        smax = sx[rows].max(axis=0)
        pmin = np.minimum(smin, np.r_[smin[1:], smin[-1]])
        pmax = np.maximum(smax, np.r_[smax[1:], smax[-1]])
        # FAR-existence test per column: polyline enters the band from above
        # at the first scanned row and exits below at the last (per chunk).
        always = np.zeros(CL, bool)
        for ch in range(nchunks):
            if ke[b, ch] <= kb[b, ch]:
                continue  # empty chunk: no candidates at all
            top_r = min(r0 + kb[b, ch], RPAD - 1)
            bot_r = min(r0 + ke[b, ch], RPAD - 1)
            cs = slice(ch * 128, ch * 128 + 128)
            always[cs] = (sy[top_r, cs] >= qy_top[b]) & \
                         (sy[bot_r, cs] < qy_bot[b])
        cidx = np.arange(CL)
        for blk in range(nblocks):
            if mid[b, blk] == -2:
                continue  # no candidates: march skipped entirely
            x0 = blk * 128 + 0.5
            x1 = blk * 128 + 127.5
            cand = (pmin <= x1 + 2.0) & (pmax >= x0 - 2.0)
            # restrict to the march window
            canch_m = canch[blk] * 8
            wmask = (cidx >= canch_m) & (cidx < canch_m + cfg.cw)
            cand &= wmask
            for K in Ks:
                stats[K][1] += 1
            if not cand.any():
                continue
            if not always[wmask].all():
                continue  # a FAR pair in the window: no locality proof
            m = (np.clip(pmin[cand], x0, x1) + np.clip(pmax[cand], x0, x1)) / 2
            c = cidx[cand].astype(np.float64)
            var = ((m - m.mean()) ** 2).sum()
            if var < 1e-9:
                a = 0.0
                bb = c.mean()
            else:
                a = (((m - m.mean()) * (c - c.mean())).sum()) / var
                bb = c.mean() - a * m.mean()
            lo_x = np.clip(pmin[cand], x0, x1)
            hi_x = np.clip(pmax[cand], x0, x1)
            p1 = a * lo_x + bb
            p2 = a * hi_x + bb
            dev_hi = c - np.minimum(p1, p2)
            dev_lo = c - np.maximum(p1, p2)
            for K in Ks:
                ok = (dev_lo >= -(K - 1.02)) & (dev_hi <= (K - 1.02))
                if ok.all():
                    stats[K][0] += 1
    return stats, int(np.asarray(ovf))


def main():
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
    sway = animation.default_sway(5.0)
    times = animation.frame_times(64, 60.0)
    views = np.asarray(sway.batch(times))
    cfg = raster_scan.suggest_scan_config(n, W, H)
    print("config:", cfg, flush=True)

    for name, m in (("identity", proj @ cam),
                    ("sway0", proj @ cam @ views[0]),
                    ("sway40", proj @ cam @ views[40]),
                    ("sway16", proj @ cam @ views[16])):
        stats, ovf = eligibility(np.asarray(m, np.float32), vgrid, W, H, cfg)
        msg = "  ".join(f"K={k}: {e}/{t} ({e/max(t,1)*100:.1f}%)"
                        for k, (e, t) in stats.items())
        print(f"{name:9s} {msg}", flush=True)


if __name__ == "__main__":
    main()
