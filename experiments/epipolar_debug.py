"""Debug the epipolar-march misses: where do exhaustive winners live relative to
the march line, and what are the consistency residuals at the true cell?"""

import os

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from depthrenderer_tpu import animation
import experiments.epipolar_proto as P


def main():
    verts, base, n = P.load_scene()
    sway = animation.default_sway(5.0)
    t_anim = 1.25
    anim = np.asarray(sway.transform_at(t_anim))
    mvp = base @ anim
    sx, sy, z = P.project(verts, mvp)
    g_px, dx_px = P.parallax_dir(verts, mvp, n)

    col_x = sx.mean(axis=0)
    row_y = sy.mean(axis=1)
    cell_w = (col_x[-1] - col_x[0]) / (n - 1)
    cell_h = (row_y[0] - row_y[-1]) / (n - 1)
    g_cells = g_px * cell_w / cell_h * (-1.0)
    print(f"g_px={g_px:.4f} dx_px={dx_px:.2f} cell_w={cell_w:.3f} "
          f"cell_h={cell_h:.3f} g_cells={g_cells:.4f}")

    SUB = 32
    ys, xs = np.mgrid[0:P.H:SUB, 0:P.W:SUB]
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    qx = xs + 0.5
    qy = P.H - (ys + 0.5)
    c0 = np.clip(np.interp(qx, col_x, np.arange(n)), 0, n - 2).astype(np.int32)
    r0 = np.clip(np.interp(qy, row_y[::-1], np.arange(n, dtype=np.float64)[::-1]),
                 0, n - 2)

    # exhaustive winner
    ex_z = np.full(qx.shape, np.inf, np.float32)
    ex_id = np.full(qx.shape, -1, np.int64)
    CH = 1024
    for s in range(0, len(qx), CH):
        sl = slice(s, s + CH)
        rr, cc2 = [], []
        for dr in range(-P.EX_R, P.EX_R + 1):
            for dc in range(-P.EX_C, P.EX_C + 1):
                rr.append(np.round(r0[sl]).astype(np.int32) + dr)
                cc2.append(c0[sl] + dc)
        zz, ii = P.exact_tests(sx, sy, z, n, qx[sl], qy[sl],
                               np.stack(rr), np.stack(cc2))
        ex_z[sl] = zz
        ex_id[sl] = ii

    cov = ex_id >= 0
    tri = ex_id[cov]
    cell = tri // 2
    r_ex = (cell // (n - 1)).astype(np.int64)
    c_ex = (cell % (n - 1)).astype(np.int64)
    t_ex = c_ex - c0[cov]
    r_line = r0[cov] + t_ex * g_cells
    rdev = r_ex - r_line
    print("col offset t_ex percentiles:",
          np.percentile(t_ex, [0.5, 5, 50, 95, 99.5]).round(1))
    print("row deviation from line:   ",
          np.percentile(rdev, [0.5, 5, 50, 95, 99.5]).round(2))

    # consistency residuals at the true cell corner
    fx = sx[r_ex, c_ex] - qx[cov]
    fy = sy[r_ex, c_ex] - qy[cov]
    print("fx at true cell:", np.percentile(fx, [0.5, 5, 50, 95, 99.5]).round(2))
    print("fy at true cell:", np.percentile(fy, [0.5, 5, 50, 95, 99.5]).round(2))

    # residuals at the MARCH point for the true t (integer line row)
    rt = np.clip(np.round(r0[cov] + t_ex * g_cells).astype(np.int64), 0, n - 2)
    fx_m = sx[rt, c_ex] - qx[cov]
    fy_m = sy[rt, c_ex] - qy[cov]
    print("fx at march pt :", np.percentile(fx_m, [0.5, 5, 50, 95, 99.5]).round(2))
    print("fy at march pt :", np.percentile(fy_m, [0.5, 5, 50, 95, 99.5]).round(2))


if __name__ == "__main__":
    main()

def slope_check():
    verts, base, n = P.load_scene()
    from depthrenderer_tpu import animation
    sway = animation.default_sway(5.0)
    for t_anim in (1.25, 3.125):
        anim = np.asarray(sway.transform_at(t_anim))
        mvp = base @ anim
        sx, sy, z = P.project(verts, mvp)
        g_px, dx_px = P.parallax_dir(verts, mvp, n)
        col_x = sx.mean(axis=0)
        row_y = sy.mean(axis=1)
        cell_w = (col_x[-1] - col_x[0]) / (n - 1)
        cell_h = (row_y[0] - row_y[-1]) / (n - 1)
        SUB = 32
        ys, xs = np.mgrid[0:P.H:SUB, 0:P.W:SUB]
        ys, xs = ys.reshape(-1), xs.reshape(-1)
        qx = xs + 0.5
        qy = P.H - (ys + 0.5)
        c0 = np.clip(np.interp(qx, col_x, np.arange(n)), 0, n - 2).astype(np.int32)
        r0 = np.clip(np.interp(qy, row_y[::-1], np.arange(n, dtype=np.float64)[::-1]), 0, n - 2)
        ex_z = np.full(qx.shape, np.inf, np.float32)
        ex_id = np.full(qx.shape, -1, np.int64)
        for s in range(0, len(qx), 1024):
            sl = slice(s, s + 1024)
            rr, cc2 = [], []
            for dr in range(-P.EX_R, P.EX_R + 1):
                for dc in range(-P.EX_C, P.EX_C + 1):
                    rr.append(np.round(r0[sl]).astype(np.int32) + dr)
                    cc2.append(c0[sl] + dc)
            zz, ii = P.exact_tests(sx, sy, z, n, qx[sl], qy[sl], np.stack(rr), np.stack(cc2))
            ex_z[sl] = zz
            ex_id[sl] = ii
        cov = ex_id >= 0
        cell = ex_id[cov] // 2
        r_ex = (cell // (n - 1)).astype(np.int64)
        c_ex = (cell % (n - 1)).astype(np.int64)
        t_ex = (c_ex - c0[cov]).astype(np.float64)
        dr_raw = (r_ex - r0[cov]).astype(np.float64)
        A = np.stack([t_ex, np.ones_like(t_ex)], 1)
        coef, *_ = np.linalg.lstsq(A, dr_raw, rcond=None)
        resid = dr_raw - A @ coef
        pred = -g_px * cell_w / cell_h
        print(f"t={t_anim}: fitted slope {coef[0]:+.4f} intercept {coef[1]:+.2f} "
              f"| model slope {pred:+.4f} | resid p0.5/99.5 "
              f"{np.percentile(resid,[0.5,50,99.5]).round(2)}")

slope_check()
