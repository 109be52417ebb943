"""Verify the false-near-coverage hypothesis for the residual scan flip class.

At scan-vs-grid flipped pixels where the scan is nearer, decode the scan
winner's grid cell from its interpolated UV (u = c/(n-1), v = 1 - r/(n-1)),
project that cell's true corners on the host in f64, and exact-test the pixel
against the cell's two triangles. If no triangle of the 3x3 cell
neighbourhood covers the pixel at a z near the scan's winner z, the scan
fabricated coverage (phantom cell from wrong strip corners). Reports the
fraction confirmed false and the distribution of the offending cells' grid
rows (e.g. clustering at window starts would implicate the capture ring).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--view", type=int, default=40)
    ap.add_argument("--identity", action="store_true",
                    help="Use the true identity view (proj @ cam — the "
                         "frontal GL-golden pose) instead of a sway frame.")
    ap.add_argument("--nearer-only", action="store_true",
                    help="Sample only flips where the scan winner is NEARER "
                         "than the grid's (the frontal false-coverage class).")
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
    if args.identity:
        mvp1 = (proj @ cam).astype(np.float32)[None]
    else:
        mvp1 = mvps[args.view:args.view + 1]

    gcfg = measured_config(mvps, np.asarray(vgrid_np), W, H, quantile=1.0,
                           row_anchors=2)
    scfg = raster_scan.suggest_scan_config(n, W, H)

    gt = np.asarray(render_frames_grid(
        mvp1, vgrid, uvgrid, tex_dev, W, H, gcfg, frame_batch=1))[0]
    raw = raster_scan.render_frames_scan(
        mvp1, vgrid, uvgrid, tex_dev, W, H, scfg, frame_batch=1, raw_u32=True)
    st = raster_scan.unpack_raw_frames(np.asarray(raw), W, H)[0]

    # attrs: (1, nbands, 8, 8, WL) planes [u, v, zm, cov, z, bml, 0, 0]
    ht, wt = H, W
    rpt = max(-(-ht // 8) * 8, scfg.tex_rows)
    cpt = max(-(-wt // 128) * 128, scfg.tex_cols)
    texq = raster_scan._pack_texture(tex_dev, rpt, cpt)
    minv = np.linalg.inv(np.asarray(mvp1[0], np.float64))
    minv_rows = jnp.asarray(
        np.concatenate([minv[2], minv[3]]).astype(np.float32))[None]
    prep = raster_scan._prep_scan_batched(jnp.asarray(mvp1), vgrid, W, H, scfg)
    win, w0, bounds, canch, mid, _ = prep
    bands = np.asarray(raster_scan._raster_scan_pallas(
        win, texq, (ht, wt), minv_rows, w0, bounds, canch, mid, W, H, n, n,
        scfg))
    nbands = -(-H // 8)
    WL = bands.shape[-1]
    planes = bands[0].transpose(1, 0, 2, 3).reshape(8, nbands * 8, WL)
    u_im = planes[0][:H, :W]
    v_im = planes[1][:H, :W]
    z_im = planes[4][:H, :W]  # NDC winner z

    d = np.abs(st.astype(int) - gt.astype(int)).max(-1)
    flips = d > 8
    print(f"flips: {flips.mean() * 100:.3f}%")
    if args.nearer_only:
        gz = np.asarray(render_frames_grid(
            mvp1, vgrid, uvgrid, tex_dev, W, H, gcfg, frame_batch=1,
            mode="debug_z"))[0][..., 0].astype(np.float32) / 255.0
        zm_im = planes[2][:H, :W]  # scan winner model z
        nearer = (zm_im - gz) < -4.0 / 255.0
        flips = flips & nearer
        print(f"scan-NEARER flips: {flips.mean() * 100:.3f}%")

    # Host-side f64 projection of every grid vertex.
    P = np.asarray(mvp1[0], np.float64)
    vv = vgrid_np.reshape(-1, 3)
    clip = np.concatenate([vv, np.ones((len(vv), 1))], 1) @ P.T
    wq = clip[:, 3]
    inv_w = np.where(np.abs(wq) > 1e-30, 1.0 / wq, 0.0)
    sx = ((clip[:, 0] * inv_w) + 1) * 0.5 * W
    sy = ((clip[:, 1] * inv_w) + 1) * 0.5 * H
    zn = clip[:, 2] * inv_w
    SX = sx.reshape(n, n)
    SY = sy.reshape(n, n)
    ZN = zn.reshape(n, n)

    ys, xs = np.nonzero(flips)
    rng = np.random.default_rng(0)
    take = rng.choice(len(ys), size=min(4000, len(ys)), replace=False)
    confirmed_false = 0
    covered_ok = 0
    bad_rows = []
    bad_cols = []
    dz_err = []
    for idx in take:
        py, px = ys[idx], xs[idx]
        u, v = float(u_im[py, px]), float(v_im[py, px])
        zwin = float(z_im[py, px])
        if zwin > 1e30:
            continue  # scan background at a flip: a miss, not false coverage
        c0 = u * (n - 1)
        r0 = (1.0 - v) * (n - 1)
        qx = px + 0.5
        qy = H - (py + 0.5)
        found = False
        for rr in range(int(np.floor(r0)) - 1, int(np.floor(r0)) + 2):
            for cc in range(int(np.floor(c0)) - 1, int(np.floor(c0)) + 2):
                if not (0 <= rr < n - 1 and 0 <= cc < n - 1):
                    continue
                # two triangles (a,b,c),(c,b,d): a=(rr,cc) b=(rr+1,cc)
                # c=(rr,cc+1) d=(rr+1,cc+1)
                corners = [(rr, cc), (rr + 1, cc), (rr, cc + 1),
                           (rr + 1, cc + 1)]
                pts = [(SX[r_, c_], SY[r_, c_], ZN[r_, c_])
                       for r_, c_ in corners]
                for tri in ((0, 1, 2), (2, 1, 3)):
                    (x0, y0, z0), (x1, y1, z1), (x2, y2, z2) = (
                        pts[tri[0]], pts[tri[1]], pts[tri[2]])
                    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
                    if area <= 1e-12:
                        continue
                    e0 = (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
                    e1 = (x0 - x2) * (qy - y2) - (y0 - y2) * (qx - x2)
                    e2 = (x1 - x0) * (qy - y0) - (y1 - y0) * (qx - x0)
                    if e0 >= 0 and e1 >= 0 and e2 >= 0:
                        zz = (e0 * z0 + e1 * z1 + e2 * z2) / area
                        if abs(zz - zwin) < 0.02:
                            found = True
        if found:
            covered_ok += 1
        else:
            confirmed_false += 1
            bad_rows.append(r0)
            bad_cols.append(c0)
            dz_err.append(zwin)
    tot = confirmed_false + covered_ok
    print(f"sampled scan-covered flips: {tot}; genuinely covered "
          f"{covered_ok / tot * 100:.1f}%, FALSE coverage "
          f"{confirmed_false / tot * 100:.1f}%")
    if bad_rows:
        br = np.asarray(bad_rows)
        print("false-cov winner grid rows quantiles:",
              np.percentile(br, [0, 10, 50, 90, 100]).round(1))
        print("false-cov winner grid cols quantiles:",
              np.percentile(np.asarray(bad_cols),
                            [0, 10, 50, 90, 100]).round(1))
        # row position within the band window: near kb (ring warm-up zone)?
        print("false-cov winner z quantiles:",
              np.percentile(np.asarray(dz_err), [0, 50, 100]).round(3))


if __name__ == "__main__":
    main()
