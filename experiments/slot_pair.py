"""Test the cross-slot pairing hypothesis for the scan's coverage holes.

For sampled pixels where the scan renders background but the mesh genuinely
covers the pixel (the ~0.5% hole class at d10/1080p), find the true covering
cell by host brute force, then replicate the solve's crossing lists for its
two columns and classify WHY the scan missed it:

  cross-slot     — both columns hold the cell's crossing, but in DIFFERENT
                   slots (the exact phase only pairs same-slot records)
  slot-overflow  — a column's crossing is beyond nbr slots
  no-crossing    — a column's curve never crosses the scanline (the cell is
                   only reachable via a row-edge record family)
  bracket/march  — records exist in the same slot but the march's bracket
                   (sxc order) cannot select the pair

Pure host/numpy (prep runs on CPU); no TPU needed except one attrs render
to locate the holes, cached from experiments/false_cov.py if present.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--view", type=int, default=40)
    ap.add_argument("--samples", type=int, default=300)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from depthrenderer_tpu import animation, io as dio, meshgen, transforms
    from depthrenderer_tpu.ops import raster_scan
    from depthrenderer_tpu.ops.raster_grid import (measured_config,
                                                   render_frames_grid)

    W, H, D = 1920, 1080, 10
    n = 2**D + 1
    FAR = 3.0e38
    colour = dio.load_colour("/root/reference/samples/00000_colors.png")
    depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                       (H, W))
    texture = dio.resize(colour, (H, W)).astype(np.float32)
    verts, uvs, _ = meshgen.grid_mesh(depth, D)
    verts = np.asarray(verts).copy()
    verts[:, 2] *= 4.0
    vgrid_np = verts.reshape(n, n, 3)
    vgrid = jax.device_put(vgrid_np)
    uvgrid = jax.device_put(np.asarray(uvs).reshape(n, n, 2))
    tex_dev = jax.device_put(texture)

    sway = animation.default_sway(5.0)
    times = animation.frame_times(64, 60.0)
    views = np.asarray(sway.batch(times))
    proj = np.asarray(transforms.perspective(18.0, W / H))
    cam = np.asarray(transforms.translation(dz=-10.0))
    mvps = (proj[None] @ (cam[None] @ views)).astype(np.float32)
    mvp1 = mvps[args.view:args.view + 1]

    gcfg = measured_config(mvps, np.asarray(vgrid_np), W, H, quantile=1.0,
                           row_anchors=2)
    scfg = raster_scan.suggest_scan_config(n, W, H)

    gt = np.asarray(render_frames_grid(
        mvp1, vgrid, uvgrid, tex_dev, W, H, gcfg, frame_batch=1))[0]
    raw = raster_scan.render_frames_scan(
        mvp1, vgrid, uvgrid, tex_dev, W, H, scfg, frame_batch=1, raw_u32=True)
    st = raster_scan.unpack_raw_frames(np.asarray(raw), W, H)[0]

    ht, wt = H, W
    rpt = max(-(-ht // 8) * 8, scfg.tex_rows)
    cpt = max(-(-wt // 128) * 128, scfg.tex_cols)
    texq = raster_scan._pack_texture(tex_dev, rpt, cpt)
    minv = np.linalg.inv(np.asarray(mvp1[0], np.float64))
    minv_rows = jnp.asarray(
        np.concatenate([minv[2], minv[3]]).astype(np.float32))[None]
    prep = raster_scan._prep_scan_batched(jnp.asarray(mvp1), vgrid, W, H, scfg)
    win_d, w0_d, bounds_d, canch_d, _ = prep
    bands = np.asarray(raster_scan._raster_scan_pallas(
        win_d, texq, (ht, wt), minv_rows, w0_d, bounds_d, canch_d, W, H,
        n, n, scfg))
    nbands = -(-H // 8)
    WL = bands.shape[-1]
    planes = bands[0].transpose(1, 0, 2, 3).reshape(8, nbands * 8, WL)
    z_im = planes[4][:H, :W]

    win = np.asarray(win_d)[0]
    w0 = np.asarray(w0_d)[0]
    bounds = np.asarray(bounds_d)[0]
    canch = np.asarray(canch_d)[0]
    CL = win.shape[2]
    nchunks = CL // 128
    bounds2 = bounds.reshape(nbands, nchunks)
    kb_all = bounds2 & 0xFFF
    ke_all = (bounds2 >> 12) & 0xFFF

    d = np.abs(st.astype(int) - gt.astype(int)).max(-1)
    flips = d > 8
    holes = flips & (z_im > 1e30)
    print(f"flips {flips.mean() * 100:.3f}%  of which scan-background (holes) "
          f"{holes.sum() / max(flips.sum(), 1) * 100:.1f}%")

    # Host f64 projection + per-cell bboxes for brute-force winner search.
    P = np.asarray(mvp1[0], np.float64)
    vv = vgrid_np.reshape(-1, 3)
    clipv = np.concatenate([vv, np.ones((len(vv), 1))], 1) @ P.T
    wq = clipv[:, 3]
    inv_w = np.where(np.abs(wq) > 1e-30, 1.0 / wq, 0.0)
    sx = ((clipv[:, 0] * inv_w) + 1) * 0.5 * W
    sy = ((clipv[:, 1] * inv_w) + 1) * 0.5 * H
    zn = clipv[:, 2] * inv_w
    SX = sx.reshape(n, n)
    SY = sy.reshape(n, n)
    ZN = zn.reshape(n, n)
    x00, x01 = SX[:-1, :-1], SX[:-1, 1:]
    x10, x11 = SX[1:, :-1], SX[1:, 1:]
    y00, y01 = SY[:-1, :-1], SY[:-1, 1:]
    y10, y11 = SY[1:, :-1], SY[1:, 1:]
    bxmin = np.minimum(np.minimum(x00, x01), np.minimum(x10, x11))
    bxmax = np.maximum(np.maximum(x00, x01), np.maximum(x10, x11))
    bymin = np.minimum(np.minimum(y00, y01), np.minimum(y10, y11))
    bymax = np.maximum(np.maximum(y00, y01), np.maximum(y10, y11))

    def true_winner(qx, qy):
        """Min-z covering (cell, tri) by brute force over bbox candidates."""
        cand = np.nonzero((bxmin <= qx) & (bxmax >= qx) & (bymin <= qy)
                          & (bymax >= qy))
        best = (None, np.inf)
        for rr, cc in zip(*cand):
            pts = [(SX[rr, cc], SY[rr, cc], ZN[rr, cc]),
                   (SX[rr + 1, cc], SY[rr + 1, cc], ZN[rr + 1, cc]),
                   (SX[rr, cc + 1], SY[rr, cc + 1], ZN[rr, cc + 1]),
                   (SX[rr + 1, cc + 1], SY[rr + 1, cc + 1], ZN[rr + 1, cc + 1])]
            for tri in ((0, 1, 2), (2, 1, 3)):
                (ax, ay, az), (bx, by, bz), (cx, cy, cz) = (
                    pts[tri[0]], pts[tri[1]], pts[tri[2]])
                area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
                if area <= 1e-12:
                    continue
                e0 = (cx - bx) * (qy - by) - (cy - by) * (qx - bx)
                e1 = (ax - cx) * (qy - cy) - (ay - cy) * (qx - cx)
                e2 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
                if e0 >= 0 and e1 >= 0 and e2 >= 0:
                    zz = (e0 * az + e1 * bz + e2 * cz) / area
                    if zz < best[1]:
                        best = ((rr, cc), zz)
        return best

    def crossings(band_i, col, qy):
        """Ordered crossing list [(global_row, sxc, zc, slot_idx), ...] for a
        column at scanline qy, replicating the solve's kb/ke bounds."""
        ci = col // 128
        kb, ke = int(kb_all[band_i, ci]), int(ke_all[band_i, ci])
        w0i = int(w0[band_i]) * 8
        out = []
        for k in range(kb, ke):
            k1 = min(k + 1, scfg.rmax - 1)
            shi = win[1, w0i + k, col]
            slo = win[1, w0i + k1, col]
            if shi >= qy > slo:
                frac = (shi - qy) / max(shi - slo, 1e-12)
                sxc = win[0, w0i + k, col] + (
                    win[0, w0i + k1, col] - win[0, w0i + k, col]) * frac
                zc = win[2, w0i + k, col] + (
                    win[2, w0i + k1, col] - win[2, w0i + k, col]) * frac
                out.append((w0i + k, sxc, zc, len(out)))
        return out

    SR, OFF = scfg.sr, scfg.off
    DMAX = SR - 1 if scfg.dmax is None else scfg.dmax
    MWC = scfg.cw

    def classify(py, px):
        qx, qy = px + 0.5, H - (py + 0.5)
        (cell, zz) = true_winner(qx, qy)
        if cell is None:
            return "no-true-winner"
        rr, cc = cell
        band_i = py // 8
        blk = px // 128
        cm = int(canch[blk]) * 8  # march window start (global col)
        # per-slot crossing tables over the march window
        cr1 = crossings(band_i, cc, qy)
        cr2 = crossings(band_i, cc + 1, qy)
        # Reasons accumulate per slot; the cell is found if ANY slot works.
        reasons = set()
        for s in range(scfg.nbr):
            b1 = [x for x in cr1 if x[3] == s]
            b2 = [x for x in cr2 if x[3] == s]
            if not b1 or not b2:
                reasons.add("no-crossing-in-slot")
                continue
            gr1, sx1, zc1, _ = b1[0]
            gr2, sx2, zc2, _ = b2[0]
            k_idx = rr - (gr1 - OFF)
            if not (0 <= k_idx <= SR - 2):
                reasons.add("strip-window")
                continue
            dlt = gr2 - gr1
            if abs(dlt) > DMAX or not (0 <= k_idx - dlt
                                       and k_idx + 1 - dlt <= SR - 1):
                reasons.add("realign-cap")
                continue
            # march: does the bracket pair (cc, cc+1) get selected?
            if not (cc >= cm and cc + 1 < cm + MWC):
                reasons.add("march-window")
                continue
            # build slot-s sxc/zc over the window
            hits = []
            for col in range(cm, cm + MWC - 1):
                a = [x for x in crossings(band_i, col, qy) if x[3] == s]
                b = [x for x in crossings(band_i, col + 1, qy) if x[3] == s]
                fa = (a[0][1] - qx) if a else (FAR - qx)
                fb = (b[0][1] - qx) if b else (FAR - qx)
                if fa * fb <= 0:
                    hits.append((a[0][2] if a else FAR, col))
            hits.sort()
            sel = [col for _, col in hits[:scfg.hyps]]
            if cc in sel:
                return "UNEXPLAINED (pipeline should find it)"
            reasons.add("march-rank")
        for pref in ("march-rank", "realign-cap", "strip-window",
                     "march-window", "no-crossing-in-slot"):
            if pref in reasons:
                return pref
        return "other"

    ys, xs = np.nonzero(holes)
    rng = np.random.default_rng(1)
    take = rng.choice(len(ys), size=min(args.samples, len(ys)), replace=False)
    from collections import Counter

    counts = Counter()
    for idx in take:
        counts[classify(ys[idx], xs[idx])] += 1
    print("hole classification over", len(take), "samples:")
    for k, v in counts.most_common():
        print(f"  {k:>36}: {v}")


if __name__ == "__main__":
    main()
