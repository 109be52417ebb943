"""Classify the column-scan prototype's holes: band miss / bracket miss /
march miss / hypothesis-rank miss."""
import os
os.environ["DEPTHRENDERER_PLATFORM"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from depthrenderer_tpu import animation
import experiments.epipolar_proto as P1
import experiments.epipolar_proto2 as P2

verts, basemat, n = P1.load_scene()
sway = animation.default_sway(5.0)
t_anim = 3.125
SUB = 16
anim = np.asarray(sway.transform_at(t_anim)); mvp = basemat @ anim
sx, sy, z = P1.project(verts, mvp)
col_x = sx.mean(axis=0); row_y = sy.mean(axis=1)
ys = np.arange(0, P1.H, SUB); xs = np.arange(0, P1.W, SUB)
qy_rows = P1.H - (ys + 0.5); qx_cols = xs + 0.5
r0 = np.clip(np.interp(qy_rows, row_y[::-1], np.arange(n, dtype=np.float64)[::-1]), 0, n - 2)
RMAX = 48
r_lo = np.clip(np.round(r0).astype(int) - RMAX // 2, 0, n - 1 - RMAX)
r_hi = r_lo + RMAX - 1
base, sxc, zc = P2.column_solve(sx, sy, z, n, qy_rows, r_lo, r_hi)
c0 = np.clip(np.interp(qx_cols, col_x, np.arange(n)), 0, n - 2).astype(int)

# run the full prototype pieces to get inv winner (copy of run_frame core)
CW = 192
c_lo = np.clip(c0 - CW // 2, 0, n - 1 - CW)
HY, HX = len(ys), len(xs)
hyp_c = np.zeros((P2.NH, HY, HX), np.int32)
hyp_z = np.full((P2.NH, HY, HX), np.inf, np.float32)
for yi in range(HY):
    cols = c_lo[None, :] + np.arange(CW)[:, None]
    for br in range(P2.NBR):
        sxv = sxc[yi, br][cols]; zv = zc[yi, br][cols]
        f0 = sxv[:-1] - qx_cols[None, :]; f1 = sxv[1:] - qx_cols[None, :]
        hit = (f0 * f1 <= 0) & np.isfinite(zv[:-1])
        key = np.where(hit, zv[:-1], np.inf).astype(np.float32)
        for t in range(CW - 1):
            k = key[t]; c_t = cols[t]
            for h in range(P2.NH):
                better = k < hyp_z[h, yi]
                k2 = np.where(better, hyp_z[h, yi], k)
                hyp_z[h, yi] = np.where(better, k, hyp_z[h, yi])
                c2 = np.where(better, hyp_c[h, yi], c_t)
                hyp_c[h, yi] = np.where(better, c_t, hyp_c[h, yi])
                k = k2; c_t = c2
qx_g, qy_g = np.meshgrid(qx_cols, qy_rows)
qx_f, qy_f = qx_g.reshape(-1), qy_g.reshape(-1)
cr, cc = [], []
for h in range(P2.NH):
    for br in range(P2.NBR):
        for dc in (-1, 0, 1):
            c_h = np.clip(hyp_c[h] + dc, 0, n - 2)
            b_h = base[np.arange(HY)[:, None], br, c_h]
            for drr in (-1, 0, 1):
                cr.append(np.clip(np.where(b_h < 0, 0, b_h + drr), 0, n - 2).reshape(-1))
                cc.append(c_h.reshape(-1))
inv_z, inv_id = P1.exact_tests(sx, sy, z, n, qx_f, qy_f, np.stack(cr), np.stack(cc))

r0_f = np.repeat(r0, HX); c0_f = np.tile(c0, HY)
ex_z = np.full(qx_f.shape, np.inf, np.float32); ex_id = np.full(qx_f.shape, -1, np.int64)
for s in range(0, len(qx_f), 1024):
    sl = slice(s, s + 1024)
    rr2, cc2 = [], []
    for dr in range(-P2.EX_R, P2.EX_R + 1):
        for dc in range(-P2.EX_C, P2.EX_C + 1):
            rr2.append(np.round(r0_f[sl]).astype(np.int32) + dr)
            cc2.append(c0_f[sl].astype(np.int32) + dc)
    zz, ii = P1.exact_tests(sx, sy, z, n, qx_f[sl], qy_f[sl], np.stack(rr2), np.stack(cc2))
    ex_z[sl] = zz; ex_id[sl] = ii

cov_ex = ex_id >= 0
match = (inv_id == ex_id) | (~cov_ex & (inv_id == -1))
hole = ~match & (inv_id == -1) & cov_ex
print(f"holes {hole.sum()}/{len(qx_f)}")
h_idx = np.where(hole)[0]
cell = ex_id[h_idx] // 2
r_ex = (cell // (n - 1)).astype(int); c_ex = (cell % (n - 1)).astype(int)
yi = h_idx // HX; xi = h_idx % HX

in_band = (r_ex >= r_lo[yi]) & (r_ex + 1 <= r_hi[yi])
print("winner row within solve band:", in_band.mean().round(3))
in_march = (c_ex >= c_lo[xi]) & (c_ex < c_lo[xi] + CW - 1)
print("winner col within march win :", in_march.mean().round(3))

# bracket presence: any slot at (yi, c_ex) or c_ex+1 with base in [r_ex-1, r_ex+1]
bra = base[yi][:, np.arange(len(h_idx))] if False else np.stack(
    [base[yi, br, c_ex] for br in range(P2.NBR)])
bra2 = np.stack([base[yi, br, c_ex + 1] for br in range(P2.NBR)])
near = (np.abs(bra - r_ex) <= 1).any(0) | (np.abs(bra2 - r_ex) <= 1).any(0)
print("bracket near winner row     :", near.mean().round(3))

# march found a hypothesis within +-1 col of winner?
hc = np.stack([hyp_c[h, yi, xi] for h in range(P2.NH)])
hyp_near = (np.abs(hc - c_ex) <= 1).any(0)
print("hypothesis within +-1 col   :", hyp_near.mean().round(3))
both = in_band & in_march
print("holes with band&march ok    :", both.mean().round(3))
print("  of those, bracket near    :", near[both].mean().round(3))
print("  of those, hyp near        :", hyp_near[both].mean().round(3))
# winner z vs hypothesis z (did a nearer crossing shadow it?)
print("ex_z of holes p50:", np.percentile(ex_z[h_idx], [5,50,95]).round(3))
