"""Host-side sizing study for the round-3 scan-kernel levers (CPU, numpy).

Measures, on the bench scene/path (d10/1080p, 64-frame sway), how much solve
and march work the planned prep refinements remove:

1. **Per-chunk hull bounds** (solve lever): the kernel scans rows kb..ke per
   band; today those come from GLOBAL column-mean anchor curves with the
   global z range. Here we compute per-column envelope curves (z=0 / z=zmax
   anchor surfaces, optionally per-column z extremes) and take per-128-column
   chunk min/max -> the row span each chunk would actually scan.

2. **Per-(band, block) march anchors** (march/fetch lever): the march window
   cw=256 covers the anchor spread of a GLOBAL per-block anchor (mean
   projected column x over ALL grid rows). A band-local anchor (mean over the
   band's own hull rows) should track the local surface and shrink the
   window. We measure the residual spread of the covering columns against
   both anchors, over every (band, block), via a vertex->pixel binning proxy.

Run: python experiments/hull_stats.py  (CPU-only, ~1 min)
"""

import os
import sys

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthrenderer_tpu import animation, io as dio, meshgen, transforms  # noqa: E402

W, H, D = 1920, 1080, 10
MARGIN = 10
n = 2**D + 1

colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   (H, W))
verts, uvs, _ = (np.asarray(a) for a in meshgen.grid_mesh(depth, D))
verts = verts.copy()
verts[:, 2] *= 4.0
vgrid = verts.reshape(n, n, 3).astype(np.float64)

proj = np.asarray(transforms.perspective(18.0, W / H), np.float64)
cam = np.asarray(transforms.translation(dz=-10.0), np.float64)
views = np.asarray(animation.default_sway(5.0).batch(
    animation.frame_times(64, 60.0)), np.float64)
mvps = proj[None] @ cam[None] @ views


def project(v, mvp):
    clip = v @ mvp[:, :3].T + mvp[:, 3]
    w = clip[..., 3]
    ndc = clip[..., :3] / w[..., None]
    sx = (ndc[..., 0] + 1.0) * 0.5 * W
    sy = (ndc[..., 1] + 1.0) * 0.5 * H
    return sx, sy, ndc[..., 2]


def r_at(qy, curve, rows):
    """Rows where a monotone-ish column curve crosses scanline qy."""
    # curve: (n,) sy per row, decreasing in practice; use interp on flipped.
    return np.interp(-qy, -curve, rows)


nbands = H // 8
band_qy_top = H - (np.arange(nbands) * 8.0 + 0.5)
band_qy_bot = H - (np.arange(nbands) * 8.0 + 7.5)
rows_f = np.arange(n, dtype=np.float64)
nchunks = -(-n // 128)
nblocks = W // 128

zmax_g = vgrid[..., 2].max()
zmin_c = vgrid[..., 2].min(axis=0)  # per column
zmax_c = vgrid[..., 2].max(axis=0)

frames = range(0, 64, 8)
spans_global, spans_chunk, spans_chunk_zc = [], [], []
spread_global, spread_band = [], []

for f in frames:
    mvp = mvps[f]
    sx, sy, z = project(vgrid, mvp)

    flat_xy = vgrid[..., :2].reshape(-1, 2)

    def anchor_curves(zvals_col):
        """sy anchor curve per column at given per-column z. -> (n_r, n_c)"""
        v = np.concatenate([
            flat_xy,
            np.broadcast_to(zvals_col, (n, n)).reshape(-1, 1)], axis=1)
        _, sy_a, _ = project(v, mvp)
        return sy_a.reshape(n, n)

    sy0 = anchor_curves(np.zeros(n))
    syz = anchor_curves(np.full(n, zmax_g))
    sy_zc_lo = anchor_curves(zmin_c)
    sy_zc_hi = anchor_curves(zmax_c)

    # ---- current global bounds ----
    r_lo_g = np.full(nbands, np.inf)
    r_hi_g = np.full(nbands, -np.inf)
    for curve in (sy0.mean(axis=1), syz.mean(axis=1)):
        for qy in (band_qy_top, band_qy_bot):
            r = r_at(qy, curve, rows_f)
            r_lo_g = np.minimum(r_lo_g, r)
            r_hi_g = np.maximum(r_hi_g, r)
    span_g = np.clip(r_hi_g + MARGIN, 0, n - 2) - np.clip(
        r_lo_g - MARGIN, 0, n - 2)
    spans_global.append(span_g)

    # ---- per-column -> per-chunk bounds ----
    def chunk_spans(curve_lo, curve_hi):
        # curves: (n_r, n_c). r_at per column for band top/bot scanlines.
        r_lo = np.full((nbands, nchunks), np.inf)
        r_hi = np.full((nbands, nchunks), -np.inf)
        for ci in range(nchunks):
            cols = slice(ci * 128, min((ci + 1) * 128, n))
            for curve in (curve_lo, curve_hi):
                sub = curve[:, cols]
                m = sub.mean(axis=1)  # chunk-mean anchor curve
                lo = sub.min(axis=1)
                hi = sub.max(axis=1)
                # conservative: use the chunk min/max envelope curves
                for env in (lo, hi):
                    for qy in (band_qy_top, band_qy_bot):
                        r = r_at(qy, env, rows_f)
                        r_lo[:, ci] = np.minimum(r_lo[:, ci], r)
                        r_hi[:, ci] = np.maximum(r_hi[:, ci], r)
        return np.clip(r_hi + MARGIN, 0, n - 2) - np.clip(r_lo - MARGIN, 0,
                                                          n - 2)

    spans_chunk.append(chunk_spans(sy0, syz))
    spans_chunk_zc.append(chunk_spans(sy_zc_lo, sy_zc_hi))

    # ---- march anchor spreads (vertex->pixel binning proxy) ----
    p_row = H - sy.reshape(-1)          # pixel row (top-down)
    band = np.clip((p_row // 8).astype(int), 0, nbands - 1)
    blk = np.clip((sx.reshape(-1) // 128).astype(int), 0, nblocks - 1)
    ccol = np.tile(np.arange(n), n)     # grid column of each vertex
    onscreen = (p_row >= -8) & (p_row < H + 8) & (sx.reshape(-1) >= -128) & (
        sx.reshape(-1) < W + 128)

    col_x_mean = sx.mean(axis=0)        # global anchor basis (current)
    # global per-block anchor (current kernel): interp on mean curve
    qx_c = np.arange(nblocks) * 128.0 + 64.0
    c0_global = np.interp(qx_c, col_x_mean, np.arange(n))

    # band-local anchor: mean sx over the band's hull rows, per chunk-ish —
    # approximate with the band's own vertices: mean grid column whose sx
    # lands in the block, from a smooth surface fit: use median of ccol per
    # (band, blk) as the "ideal" anchor and measure spread around BOTH.
    bb = band[onscreen] * nblocks + blk[onscreen]
    cc = ccol[onscreen]
    order = np.argsort(bb, kind="stable")
    bb_s, cc_s = bb[order], cc[order]
    uniq, starts = np.unique(bb_s, return_index=True)
    ends = np.r_[starts[1:], len(bb_s)]
    for u, s, e in zip(uniq, starts, ends):
        cs = cc_s[s:e]
        med = np.median(cs)
        blk_id = u % nblocks
        spread_band.append(np.abs(cs - med).max())
        spread_global.append(
            max(abs(cs.min() - c0_global[blk_id]),
                abs(cs.max() - c0_global[blk_id])))

sg = np.concatenate([s.ravel() for s in spans_global])
sc = np.concatenate([s.ravel() for s in spans_chunk])
scz = np.concatenate([s.ravel() for s in spans_chunk_zc])
print(f"hull span  GLOBAL (current): mean {sg.mean():7.1f}  p99 "
      f"{np.percentile(sg, 99):7.1f}  max {sg.max():7.1f}")
print(f"hull span  PER-CHUNK(z-glob): mean {sc.mean():7.1f}  p99 "
      f"{np.percentile(sc, 99):7.1f}  max {sc.max():7.1f}")
print(f"hull span  PER-CHUNK(z-col):  mean {scz.mean():7.1f}  p99 "
      f"{np.percentile(scz, 99):7.1f}  max {scz.max():7.1f}")
# solve cost ~ sum of spans scanned
print(f"relative solve row-steps: per-chunk(z-glob) {sc.mean()/sg.mean():.2f}x"
      f", per-chunk(z-col) {scz.mean()/sg.mean():.2f}x of current")

sp_g = np.asarray(spread_global)
sp_b = np.asarray(spread_band)
print(f"march offset |spread|  GLOBAL anchor: p50 {np.percentile(sp_g,50):6.1f} "
      f"p99 {np.percentile(sp_g,99):6.1f}  p99.9 {np.percentile(sp_g,99.9):6.1f} "
      f"max {sp_g.max():6.1f}")
print(f"march offset |spread|  BAND-LOCAL   : p50 {np.percentile(sp_b,50):6.1f} "
      f"p99 {np.percentile(sp_b,99):6.1f}  p99.9 {np.percentile(sp_b,99.9):6.1f} "
      f"max {sp_b.max():6.1f}")
