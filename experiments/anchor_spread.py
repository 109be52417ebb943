"""Measure the per-pixel candidate spread for the inverse-mapping kernel.

For frames of the default sway path at d10/1080p: per pixel column x, the range
of grid cols whose cell bbox covers x (and same for rows), both absolute and
relative to the separable monotone anchor. This sizes the kernel's candidate
patch (B, K) and tells whether an epipolar mechanism is required.
"""

import os

os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops import common

W, H, D = 1920, 1080, 10

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
sway = animation.default_sway(5.0)

for t in (0.0, 1.25, 2.5, 3.125):  # includes extreme yaw (t=1.25) + mixed
    anim = np.asarray(sway.transform_at(t))
    mvp = (proj @ base @ anim).astype(np.float32)
    sx, sy, z, invw = (np.asarray(a) for a in common.project_vertices(
        verts.reshape(-1, 3), mvp, W, H))
    sx = sx.reshape(n, n)
    sy = sy.reshape(n, n)

    # cell bboxes
    cx0 = np.minimum.reduce([sx[:-1, :-1], sx[1:, :-1], sx[:-1, 1:], sx[1:, 1:]])
    cx1 = np.maximum.reduce([sx[:-1, :-1], sx[1:, :-1], sx[:-1, 1:], sx[1:, 1:]])
    cy0 = np.minimum.reduce([sy[:-1, :-1], sy[1:, :-1], sy[:-1, 1:], sy[1:, 1:]])
    cy1 = np.maximum.reduce([sy[:-1, :-1], sy[1:, :-1], sy[:-1, 1:], sy[1:, 1:]])

    # front-facing only (either diagonal tri CCW)
    a2a = (sx[1:, :-1] - sx[:-1, :-1]) * (sy[:-1, 1:] - sy[:-1, :-1]) - (
        sy[1:, :-1] - sy[:-1, :-1]) * (sx[:-1, 1:] - sx[:-1, :-1])
    a2b = (sx[1:, :-1] - sx[:-1, 1:]) * (sy[1:, 1:] - sy[:-1, 1:]) - (
        sy[1:, :-1] - sy[:-1, 1:]) * (sx[1:, 1:] - sx[:-1, 1:])
    facing = (a2a > 0) | (a2b > 0)

    # separable anchors
    col_x = sx.mean(axis=0)
    row_y = sy.mean(axis=1)
    qx = np.arange(W) + 0.5
    qy = H - (np.arange(H) + 0.5)
    c_anchor = np.interp(qx, col_x, np.arange(n))
    r_anchor = np.interp(qy, row_y[::-1], np.arange(n)[::-1])

    def spread(lo, hi, anchor, extent, name):
        i0 = np.clip(np.floor(lo).astype(int), 0, extent - 1)
        i1 = np.clip(np.ceil(hi).astype(int), 0, extent - 1)
        mn = np.full(extent, 1 << 20)
        mx = np.full(extent, -(1 << 20))
        # offsets of cell index relative to anchor at covered pixels
        ci = np.broadcast_to(np.arange(n - 1)[None, :], lo.shape)
        m = facing & (i1 >= i0)
        i0m, i1m, cim = i0[m], i1[m], ci[m] if name == "col" else \
            np.broadcast_to(np.arange(n - 1)[:, None], lo.shape)[m]
        np.minimum.at(mn, i0m, cim)
        np.minimum.at(mn, i1m, cim)
        np.maximum.at(mx, i0m, cim)
        np.maximum.at(mx, i1m, cim)
        cov = mx >= mn
        lo_off = (mn - anchor)[cov]
        hi_off = (mx - anchor)[cov]
        print(f"  {name}: rel-anchor offsets p0.1/p50/p99.9:"
              f" lo {np.percentile(lo_off, 0.1):7.1f}/{np.percentile(lo_off, 50):6.1f}"
              f" hi {np.percentile(hi_off, 50):6.1f}/{np.percentile(hi_off, 99.9):7.1f}"
              f"  | worst lo {lo_off.min():7.1f} hi {hi_off.max():7.1f}"
              f"  | span p99.9 {np.percentile(mx[cov]-mn[cov], 99.9):6.1f}"
              f" max {(mx[cov]-mn[cov]).max():6.1f}")

    print(f"t={t}: yaw/pitch deg ~ {np.rad2deg(np.sin(2*np.pi*(-t/5+0.5))*np.deg2rad(2.5)):+.2f}")
    spread(cx0, cx1, c_anchor, W, "col")
    spread(cy0, cy1, r_anchor, H, "row")
