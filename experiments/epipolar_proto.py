"""Numpy prototype of the epipolar-march inverse rasteriser (round-2 kernel design).

Algorithm per pixel:
1. Separable monotone anchors (R0(y), C0(x)) from the mean projected grid.
2. March the epipolar line: candidate cols c_t = C0 + t (t in [-TLO, THI]), rows
   r_t = R0 + t*g with g = per-frame parallax slope (vertical/horizontal). At each
   step fetch sx, sy, z at the integer cell corner; a step is a *hit hypothesis*
   when the fetched corner is screen-consistent (|sx - qx|, |sy - qy| within a
   cell-size tolerance).
3. Keep the best NH hypotheses by fetched z; exact-test the 3x3 cell patch (2 tris
   each) around each hypothesis with the oracle's edge functions; min-z wins.

Validation: agreement with a windowed-exhaustive reference on a pixel subsample,
with mismatches broken down by cause. This pins the kernel's candidate
completeness BEFORE the Pallas implementation (same role as ops/raster_inverse.py
played for the Newton design, ROADMAP.md).
"""

import os
import time

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops import common

W, H, D = 1920, 1080, 10
TLO, THI = 64, 48     # march range in cells (measured spread: lo -78..hi +42 p99.9)
NH = 3                # hypotheses kept
TOL_X = 4.0           # screen-consistency tolerance (px) for a hit hypothesis
TOL_Y = 4.0
SUB = 16              # pixel subsample stride for the exhaustive check
EX_C, EX_R = 96, 32   # exhaustive window half-extent (cols, rows)


def load_scene():
    colour = dio.load_colour("/root/reference/samples/00000_colors.png")
    depth = dio.load_depth("/root/reference/samples/00000_depth.png")
    depth = dio.resize(depth, colour.shape)
    verts, uvs, _ = meshgen.grid_mesh(depth, D)
    n = 2**D + 1
    verts = np.asarray(verts).reshape(n, n, 3).copy()
    verts[..., 2] *= 4.0
    aspect = colour.shape[1] / colour.shape[0]
    proj = np.asarray(transforms.perspective(18.0, aspect))
    base = np.asarray(transforms.translation(dz=-10.0))
    return verts, proj @ base, n


def project(verts, mvp):
    sx, sy, z, invw = (np.asarray(a) for a in common.project_vertices(
        verts.reshape(-1, 3), mvp.astype(np.float32), W, H))
    n = verts.shape[0]
    return sx.reshape(n, n), sy.reshape(n, n), z.reshape(n, n)


def parallax_dir(verts, mvp, n):
    """Per-frame parallax slope g = dy/dx of the epipolar direction (screen px)."""
    c = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 2.0]], np.float32)
    sx, sy, _, _ = (np.asarray(a) for a in common.project_vertices(c, mvp.astype(np.float32), W, H))
    dx, dy = sx[1] - sx[0], sy[1] - sy[0]
    if abs(dx) < 1e-6:
        return 0.0, dy
    return dy / dx, dx


def march(sx, sy, z, n, qx, qy, r0, c0, g_cells):
    """Vectorised epipolar march; returns NH hypothesis (r, c) int arrays."""
    P = qx.shape[0]
    best_z = np.full((NH, P), np.inf, np.float32)
    best_rc = np.zeros((NH, P, 2), np.int32)
    for t in range(-TLO, THI + 1):
        ct = np.clip(c0 + t, 0, n - 2)
        rt = np.clip(np.round(r0 + t * g_cells).astype(np.int32), 0, n - 2)
        fx = sx[rt, ct] - qx
        fy = sy[rt, ct] - qy
        zt = z[rt, ct]
        hit = (np.abs(fx) < TOL_X) & (np.abs(fy) < TOL_Y)
        key = np.where(hit, zt, np.inf).astype(np.float32)
        # insert into top-NH (by z, distinct cells assumed via distinct t)
        for h in range(NH):
            better = key < best_z[h]
            nk = np.where(better, best_z[h], key)
            best_z[h] = np.where(better, key, best_z[h])
            swap_rc = best_rc[h].copy()
            best_rc[h] = np.where(better[:, None], np.stack([rt, ct], -1), best_rc[h])
            key = nk
            rt = np.where(better, swap_rc[:, 0], rt)
            ct = np.where(better, swap_rc[:, 1], ct)
    return best_z, best_rc


def exact_tests(sx, sy, z, n, qx, qy, cand_r, cand_c):
    """Oracle-exact coverage over candidate cells; returns (best_z, best_cell_id)."""
    P = qx.shape[0]
    bz = np.full(P, np.inf, np.float32)
    bid = np.full(P, -1, np.int64)
    for j in range(cand_r.shape[0]):
        r = np.clip(cand_r[j], 0, n - 2)
        c = np.clip(cand_c[j], 0, n - 2)
        x00, x01, x10, x11 = sx[r, c], sx[r, c + 1], sx[r + 1, c], sx[r + 1, c + 1]
        y00, y01, y10, y11 = sy[r, c], sy[r, c + 1], sy[r + 1, c], sy[r + 1, c + 1]
        z00, z01, z10, z11 = z[r, c], z[r, c + 1], z[r + 1, c], z[r + 1, c + 1]
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
            valid = area2 > 1e-12
            inv_a = np.where(valid, 1.0 / np.where(valid, area2, 1.0), 0.0)
            e0 = (cx - bx) * (qy - by) - (cy - by) * (qx - bx)
            e1 = (ax - cx) * (qy - cy) - (ay - cy) * (qx - cx)
            e2 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
            l0, l1, l2 = e0 * inv_a, e1 * inv_a, e2 * inv_a
            zz = l0 * az + l1 * bz_ + l2 * cz
            cov = valid & (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & (zz >= -1) & (zz <= 1)
            tid = 2 * (r.astype(np.int64) * (n - 1) + c) + diag
            better = cov & ((zz < bz) | ((zz == bz) & (tid < bid)))
            bz = np.where(better, zz.astype(np.float32), bz)
            bid = np.where(better, tid, bid)
    return bz, bid


def run_frame(verts, base, n, t_anim, sway):
    anim = np.asarray(sway.transform_at(t_anim))
    mvp = base @ anim
    sx, sy, z = project(verts, mvp)
    g_px, dx_px = parallax_dir(verts, mvp, n)

    col_x = sx.mean(axis=0)
    row_y = sy.mean(axis=1)
    cell_w = (col_x[-1] - col_x[0]) / (n - 1)
    cell_h = (row_y[0] - row_y[-1]) / (n - 1)
    g_cells = g_px * cell_w / cell_h * (-1.0)  # rows grow downward as y falls

    ys, xs = np.mgrid[0:H:SUB, 0:W:SUB]
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    qx = xs + 0.5
    qy = H - (ys + 0.5)
    c0 = np.clip(np.interp(qx, col_x, np.arange(n)), 0, n - 2).astype(np.int32)
    r0 = np.clip(np.interp(qy, row_y[::-1], np.arange(n, dtype=np.float64)[::-1]),
                 0, n - 2)

    hz, hrc = march(sx, sy, z, n, qx, qy, r0, c0, g_cells)

    # candidate patches: 3x3 around each hypothesis (+ the anchor itself)
    offs = [(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)]
    cr, cc = [], []
    for h in range(NH):
        for dr, dc in offs:
            cr.append(hrc[h, :, 0] + dr)
            cc.append(hrc[h, :, 1] + dc)
    for dr, dc in offs:
        cr.append(np.round(r0).astype(np.int32) + dr)
        cc.append(c0 + dc)
    inv_z, inv_id = exact_tests(sx, sy, z, n, qx, qy,
                                np.stack(cr), np.stack(cc))

    # exhaustive reference (windowed) in pixel chunks
    ex_z = np.full(qx.shape, np.inf, np.float32)
    ex_id = np.full(qx.shape, -1, np.int64)
    CH = 2048
    for s in range(0, len(qx), CH):
        sl = slice(s, s + CH)
        rr, cc2 = [], []
        for dr in range(-EX_R, EX_R + 1):
            for dc in range(-EX_C, EX_C + 1):
                rr.append(np.round(r0[sl]).astype(np.int32) + dr)
                cc2.append(c0[sl] + dc)
        zz, ii = exact_tests(sx, sy, z, n, qx[sl], qy[sl],
                             np.stack(rr), np.stack(cc2))
        ex_z[sl] = zz
        ex_id[sl] = ii

    cov_ex = ex_id >= 0
    match = (inv_id == ex_id) | (~cov_ex & (inv_id == -1))
    zmatch = match | (np.abs(inv_z - ex_z) < 1e-6)  # distinct tri, same depth (tie)
    mism = ~zmatch
    print(f"t={t_anim:5.3f}: exh-covered {cov_ex.mean()*100:5.2f}% | "
          f"id-match {match.mean()*100:6.3f}% | z-match {zmatch.mean()*100:6.3f}% | "
          f"miss {mism.sum()}/{len(qx)}")
    if mism.sum():
        # classify: did we find nothing (hole) or the wrong sheet?
        hole = mism & (inv_id == -1)
        wrong = mism & (inv_id >= 0)
        dz = (inv_z - ex_z)[wrong]
        print(f"         holes {hole.sum()}, wrong-sheet {wrong.sum()} "
              f"(dz p50 {np.percentile(dz, 50) if wrong.sum() else 0:.4f})")
    return zmatch.mean()


if __name__ == "__main__":
    verts, base, n = load_scene()
    sway = animation.default_sway(5.0)
    t0 = time.time()
    for t_anim in (0.0, 1.25, 3.125, 2.0):
        run_frame(verts, base, n, t_anim, sway)
    print(f"total {time.time()-t0:.1f}s")
