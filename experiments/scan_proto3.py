"""Numpy prototype #3: the KERNEL-SHAPED column-crossing-scan inverse rasteriser.

Differences vs epipolar_proto2.py, each forced by a measured Mosaic constraint
(ROADMAP.md "Round-2 measurements"):

1. **Count-based march** — per (pixel, slot) the hypothesis col is
   ``c* = #{c : sxc(y, slot, c) <= qx} - 1`` (a monotone searchsorted realised as
   a dense compare+sum sweep), replacing proto2's top-NH-by-z insertion sort.
   One hypothesis per slot; folds are covered because each fold sheet owns a
   slot from the column solve.
2. **Self-contained per-column records** — the column solve emits, per
   (pixel row, slot, grid col c): valid, sxc (crossing x), base row, and the
   corner strip sx/sy/z at rows base-1..base+2 x cols {c, c+1} (24 values).
   Every later read is then a gather along the *column* axis only (lane-dim
   gather / mod-128 decomposition in the kernel); 2D (row, col) gathers —
   which Mosaic cannot lower — never occur. In the kernel the strip is
   captured by a rolling 4-row window inside the solve's row loop.
3. **Exact tests** per pixel: for each slot s and dc in {-1,0,1}: fetch record
   at col c*_s + dc, test its 3 cells (rows base-1..base+1) x 2 triangles with
   the oracle's exact edge functions. 3 slots x 3 cols x 3 cells x 2 = 54 tri
   tests (proto2: 162).

Validated against the same windowed-exhaustive reference as proto2.
Replaces: the candidate-generation role of glDrawElements
(/root/reference/DepthRenderer/render.py:448) at production density.
"""

import os
import time

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from depthrenderer_tpu import animation
import experiments.epipolar_proto as P1

NBR = 3     # crossing slots per (pixel-row, col)
EX_C, EX_R = 96, 40
MARGIN = 10
CW = 192    # march window in cell-columns (kernel: per-block window)
MARCH = "count"   # "count" | "scan2" (top-2-by-z crossing scan per slot)
DC = (-1, 0, 1)   # record-col neighbourhood exact-tested per hypothesis
CACHE = "/tmp/scan_proto_exhaustive"
SR = 4      # strip rows per record (cells tested = SR-1)
REALIGN = 0 # 1: single-col strips, neighbour realigned by base delta (kernel form)
OFF = 1     # strip starts at base-OFF


def column_solve_records(sx, sy, z, n, qy_rows, r_lo, r_hi):
    """Crossing slots + self-contained corner records per (pixel row, slot, col).

    :return: valid (HY, NBR, C) bool; sxc (HY, NBR, C) f32 crossing x;
        base (HY, NBR, C) i32; strip (HY, NBR, C, 4, 2, 3) f32 corner
        sx/sy/z at rows base-1..base+2, cols {c, c+1}.
    """
    HY = len(qy_rows)
    C = n - 1          # records per cell-column (col c pairs with c+1)
    valid = np.zeros((HY, NBR, C), bool)
    sxc = np.full((HY, NBR, C), np.inf, np.float32)
    zc = np.full((HY, NBR, C), np.inf, np.float32)
    base = np.zeros((HY, NBR, C), np.int32)
    strip = np.zeros((HY, NBR, C, SR, 2, 3), np.float32)
    vals = np.stack([sx, sy, z], axis=-1)     # (n, n, 3)
    for yi in range(HY):
        qy = qy_rows[yi]
        rr = np.arange(r_lo[yi], r_hi[yi])
        s_hi = sy[rr][:, :C]
        s_lo = sy[rr + 1][:, :C]
        cross = (s_hi >= qy) & (s_lo < qy)
        # first NBR crossings in row order (kernel: slot = running count)
        order = np.argsort(np.where(cross, np.arange(len(rr))[:, None], np.inf),
                           axis=0, kind="stable")[:NBR]
        got = np.take_along_axis(cross, order, axis=0)          # (NBR, C)
        b = rr[order].astype(np.int32)                          # (NBR, C)
        frac = (np.take_along_axis(s_hi, order, 0) - qy) / np.maximum(
            np.take_along_axis(s_hi - s_lo, order, 0), 1e-12)
        sx_hi = np.take_along_axis(sx[rr][:, :C], order, 0)
        sx_lo = np.take_along_axis(sx[rr + 1][:, :C], order, 0)
        valid[yi] = got
        base[yi] = b
        sxc[yi] = np.where(got, sx_hi + (sx_lo - sx_hi) * frac, np.inf)
        z_hi = np.take_along_axis(z[rr][:, :C], order, 0)
        z_lo = np.take_along_axis(z[rr + 1][:, :C], order, 0)
        zc[yi] = np.where(got, z_hi + (z_lo - z_hi) * frac, np.inf)
        rows = np.clip(b[:, :, None] - OFF + np.arange(SR)[None, None, :], 0, n - 1)
        cols = np.arange(C)[None, :, None, None] + np.arange(2)[None, None, None, :]
        strip[yi] = vals[rows[:, :, :, None], cols]             # (NBR,C,4,2,3)
    return valid, sxc, zc, base, strip


def exact_tests_from_records(qx, qy, rec_strip, rec_base, rec_valid, rec_c, n):
    """Oracle-exact coverage over one fetched record's 3 cells x 2 triangles.

    :param rec_strip: (P, SR, 2, 3); :param rec_c: (P,) record col (for tri ids).
    :return: best (z, id) over the record's 6 triangles (inf/-1 where invalid).
    """
    P = qx.shape[0]
    bz = np.full(P, np.inf, np.float32)
    bid = np.full(P, -1, np.int64)
    X, Y, Z = rec_strip[..., 0], rec_strip[..., 1], rec_strip[..., 2]
    for k in range(SR - 1):                 # cell rows base-OFF+k
        r_cell = rec_base - OFF + k
        cell_ok = rec_valid & (r_cell >= 0) & (r_cell <= n - 2)
        x00, x01 = X[:, k, 0], X[:, k, 1]
        x10, x11 = X[:, k + 1, 0], X[:, k + 1, 1]
        y00, y01 = Y[:, k, 0], Y[:, k, 1]
        y10, y11 = Y[:, k + 1, 0], Y[:, k + 1, 1]
        z00, z01 = Z[:, k, 0], Z[:, k, 1]
        z10, z11 = Z[:, k + 1, 0], Z[:, k + 1, 1]
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
            ok = cell_ok & (area2 > 1e-12)
            inv_a = np.where(ok, 1.0 / np.where(ok, area2, 1.0), 0.0)
            e0 = (cx - bx) * (qy - by) - (cy - by) * (qx - bx)
            e1 = (ax - cx) * (qy - cy) - (ay - cy) * (qx - cx)
            e2 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
            l0, l1, l2 = e0 * inv_a, e1 * inv_a, e2 * inv_a
            zz = l0 * az + l1 * bz_ + l2 * cz
            cov = ok & (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & (zz >= -1) & (zz <= 1)
            tid = 2 * (r_cell.astype(np.int64) * (n - 1) + rec_c) + diag
            better = cov & ((zz < bz) | ((zz == bz) & (tid < bid)))
            bz = np.where(better, zz.astype(np.float32), bz)
            bid = np.where(better, tid, bid)
    return bz, bid


def run_frame(verts, basemat, n, t_anim, sway, SUB=16):
    anim = np.asarray(sway.transform_at(t_anim))
    mvp = basemat @ anim
    sx, sy, z = P1.project(verts, mvp)

    ylo, yhi = (int(v) for v in os.environ.get("ROWS", f"0,{P1.H}").split(","))
    ys = np.arange(ylo, yhi, SUB)
    xs = np.arange(0, P1.W, SUB)
    qy_rows = P1.H - (ys + 0.5)
    qx_cols = xs + 0.5

    # depth-hull row bands (identical to proto2)
    zmax = float(verts[..., 2].max())
    anchors = []
    for zv in (0.0, zmax):
        vv = verts.copy()
        vv[..., 2] = zv
        _, syv, _ = P1.project(vv, mvp)
        ry = syv.mean(axis=1)
        anchors.append(np.interp(qy_rows, ry[::-1],
                                 np.arange(n, dtype=np.float64)[::-1]))
    r_lo = np.clip(np.round(np.minimum(*anchors) - MARGIN).astype(int), 0, n - 2)
    r_hi = np.clip(np.round(np.maximum(*anchors) + MARGIN).astype(int), 0, n - 2)

    valid, sxc, zc, base, strip = column_solve_records(sx, sy, z, n, qy_rows,
                                                       r_lo, r_hi)

    HY, HX = len(ys), len(xs)
    C = n - 1
    dir_sign = 1.0 if sx.mean(axis=0)[-1] >= sx.mean(axis=0)[0] else -1.0

    # per-pixel march window anchored at the separable col estimate
    col_x = sx.mean(axis=0)
    c0 = np.clip(np.interp(qx_cols, col_x, np.arange(n)), 0, n - 2).astype(int)
    c_lo = np.clip(c0 - CW // 2, 0, max(C - CW, 0))          # (HX,)
    win = c_lo[None, :, None] + np.arange(CW)[None, None, :]  # (1, HX, CW)

    qx_f = np.tile(qx_cols, HY)
    qy_f = np.repeat(qy_rows, HX)
    bz = np.full(HY * HX, np.inf, np.float32)
    bid = np.full(HY * HX, -1, np.int64)
    yi = np.repeat(np.arange(HY), HX)

    tested_cols = []

    def run_hyp(c_h_flat, slot):
        nonlocal bz, bid
        tested_cols.append(c_h_flat)
        if not REALIGN:
            st = strip[yi, slot, c_h_flat]
            ok = valid[yi, slot, c_h_flat]
        else:
            # kernel form: single-col strips; neighbour col realigned by base delta
            b0 = base[yi, slot, c_h_flat]
            c2 = np.minimum(c_h_flat + 1, strip.shape[2] - 1)
            b1 = base[yi, slot, c2]
            v1 = valid[yi, slot, c2]
            d = b1 - b0
            DMAX = int(os.environ.get('DMAX', '99'))
            d = np.where(np.abs(d) <= DMAX, d, 10_000)
            st = np.zeros(strip[yi, slot, c_h_flat].shape, np.float32)
            st[:, :, 0] = strip[yi, slot, c_h_flat][:, :, 0]
            kk = np.arange(SR)[None, :]
            src_k = kk - d[:, None]
            okk = (src_k >= 0) & (src_k < SR) & v1[:, None]
            s1 = strip[yi, slot, c2][:, :, 0]        # col c2 == c+1, (P, SR, 3)
            st[:, :, 1] = np.where(okk[:, :, None], np.take_along_axis(
                s1, np.clip(src_k, 0, SR - 1)[:, :, None], axis=1), np.nan)
            ok = valid[yi, slot, c_h_flat]
        zz, ii = exact_tests_from_records(
            qx_f, qy_f, st, base[yi, slot, c_h_flat], ok, c_h_flat, n)
        better = (zz < bz) | ((zz == bz) & (ii >= 0) & (ii < bid))
        bz = np.where(better, zz, bz)
        bid = np.where(better, ii, bid)

    for s in range(NBR):
        curve_full = np.where(valid[:, s], dir_sign * sxc[:, s], np.inf)
        curve = curve_full[np.arange(HY)[:, None, None], win]  # (HY, HX, CW)
        qd = dir_sign * qx_cols[None, :, None]
        if MARCH == "count":
            cnt = (curve <= qd).sum(axis=2)                    # (HY, HX)
            cstar = np.clip(c_lo[None, :] + cnt - 1, 0, C - 1)
            for dc in DC:
                run_hyp(np.clip(cstar + dc, 0, C - 1).reshape(-1), s)
        else:  # sign-change scan marches: scan1 / scan2 / countscan
            zwin = zc[np.arange(HY)[:, None, None], s, win]
            f = curve - qd                                     # (HY, HX, CW)
            hit = (f[:, :, :-1] * f[:, :, 1:] <= 0) & np.isfinite(zwin[:, :, :-1])
            key = np.where(hit, zwin[:, :, :-1], np.inf)
            o1 = np.argmin(key, axis=2)
            k1 = np.take_along_axis(key, o1[:, :, None], 2)[:, :, 0]
            hyps = [(o1, k1)]
            if MARCH == "scan2":
                key2 = key.copy()
                np.put_along_axis(key2, o1[:, :, None], np.inf, 2)
                o2 = np.argmin(key2, axis=2)
                k2 = np.take_along_axis(key2, o2[:, :, None], 2)[:, :, 0]
                hyps.append((o2, k2))
            elif MARCH == "countscan":
                cnt = (curve <= qd).sum(axis=2)
                oc = np.clip(cnt - 1, 0, CW - 1)
                hyps.append((oc, np.zeros_like(k1)))
            for ostar, kk in hyps:
                cstar = np.where(np.isfinite(kk), c_lo[None, :] + ostar,
                                 np.clip(c_lo[None, :], 0, C - 1))
                cstar = np.clip(cstar, 0, C - 1)
                for dc in DC:
                    run_hyp(np.clip(cstar + dc, 0, C - 1).reshape(-1), s)

    # windowed-exhaustive reference (same as proto2), cached per (t, SUB)
    row_y = sy.mean(axis=1)
    r0 = np.clip(np.interp(qy_rows, row_y[::-1],
                           np.arange(n, dtype=np.float64)[::-1]), 0, n - 2)
    cache_f = f"{CACHE}_t{t_anim}_s{SUB}_r{ylo}_{yhi}.npz" if (ylo, yhi) != (0, P1.H) else f"{CACHE}_t{t_anim}_s{SUB}.npz"
    if os.path.exists(cache_f):
        d = np.load(cache_f)
        ex_z, ex_id = d["ex_z"], d["ex_id"]
    else:
        r0_f = np.repeat(np.round(r0).astype(np.int32), HX)
        c0_f = np.tile(c0, HY)
        ex_z = np.full(qx_f.shape, np.inf, np.float32)
        ex_id = np.full(qx_f.shape, -1, np.int64)
        for st in range(0, len(qx_f), 1024):
            sl = slice(st, st + 1024)
            rr2, cc2 = [], []
            for dr in range(-EX_R, EX_R + 1):
                for dc in range(-EX_C, EX_C + 1):
                    rr2.append(r0_f[sl] + dr)
                    cc2.append(c0_f[sl].astype(np.int32) + dc)
            zz, ii = P1.exact_tests(sx, sy, z, n, qx_f[sl], qy_f[sl],
                                    np.stack(rr2), np.stack(cc2))
            ex_z[sl] = zz
            ex_id[sl] = ii
        np.savez(cache_f, ex_z=ex_z, ex_id=ex_id)

    cov_ex = ex_id >= 0
    match = (bid == ex_id) | (~cov_ex & (bid == -1))
    ztie = ~match & (np.abs(bz - ex_z) < 1e-6)
    mism = ~match & ~ztie
    hole = mism & (bid == -1) & cov_ex
    wrong = mism & (bid >= 0)
    nearer = wrong & (bz < ex_z - 1e-7)
    farther = wrong & (bz > ex_z + 1e-7)
    # `nearer` = the windowed exhaustive ref provably missed a triangle the
    # inverse found (its coverage test is exact) -> count as correct.
    eff = match | ztie | nearer
    print(f"t={t_anim:5.3f}: exh-cov {cov_ex.mean()*100:5.2f}% | id-match "
          f"{match.mean()*100:6.3f}% | effective {eff.mean()*100:6.3f}% | "
          f"holes {hole.sum()} wrong {wrong.sum()} "
          f"(ref-missed {nearer.sum()}, genuine {farther.sum()}) / {len(qx_f)}")
    if os.environ.get("DIAG") and hole.sum():
        # For each hole: where is the exhaustive winner's cell vs our records?
        hidx = np.nonzero(hole)[0]
        ex_cell = ex_id[hidx] // 2
        ex_r = (ex_cell // (n - 1)).astype(int)
        ex_c = (ex_cell % (n - 1)).astype(int)
        hyi = yi[hidx]
        # nearest slot-base offset at the winner's col (inf if no valid slot)
        v = valid[hyi, :, ex_c]                       # (Nh, NBR)
        b = base[hyi, :, ex_c]
        dr = np.where(v, b - ex_r[:, None], 10_000)
        drmin = np.abs(dr).min(axis=1)
        # was the winner's col within any tested hypothesis col +- max|DC|?
        print(f"         hole diag: |base-r| @winner col: "
              f"p50={np.percentile(drmin,50):.0f} p90={np.percentile(drmin,90):.0f} "
              f"none={np.mean(drmin>=10_000)*100:.0f}%  "
              f"(negative dr = base above winner row)")
        tc = np.stack([t[hidx] for t in tested_cols])   # (ntested, Nh)
        dcol = np.abs(tc - ex_c[None, :]).min(axis=0)
        print(f"         hole diag: |c_hyp-c_win| p50={np.percentile(dcol,50):.0f} "
              f"p90={np.percentile(dcol,90):.0f} max={dcol.max()}")
    return eff.mean()


if __name__ == "__main__":
    MARCH = os.environ.get("MARCH", MARCH)
    SR = int(os.environ.get("SR", SR))
    NBR = int(os.environ.get("NBR", NBR))
    REALIGN = int(os.environ.get("REALIGN", REALIGN))
    OFF = int(os.environ.get("OFF", OFF))
    DC = tuple(int(v) for v in os.environ.get("DC", "-1,0,1").split(","))
    verts, basemat, n = P1.load_scene()
    sway = animation.default_sway(5.0)
    t0 = time.time()
    print(f"march={MARCH} DC={DC} NBR={NBR} CW={CW} SR={SR} OFF={OFF}")
    SUB = int(os.environ.get("SUB", 16))
    TS = tuple(float(t) for t in os.environ.get("TS", "1.25,0,3.125,2").split(","))
    accs = [run_frame(verts, basemat, n, t, sway, SUB=SUB) for t in TS]
    print(f"total {time.time()-t0:.1f}s | min effective {min(accs)*100:.3f}%")
