"""Localise the texture_z-vs-attrs quality-pipeline flip gap at 1080p/d10.

Renders ONE sway frame three ways (lossless grid, attrs-merged quality,
texture_z-merged quality) and classifies the texture_z flips vs the grid by
whether the attrs pipeline agrees with the grid there (pure shading flip) or
not (winner flip), and by which pass won the pixel.
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops import raster_scan as rs
from depthrenderer_tpu.ops.raster_grid import measured_config, render_frames_grid

W, H, D = 1920, 1080, 10
n = 2**D + 1
colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"), (H, W))
texture = dio.resize(colour, (H, W)).astype(np.float32)
verts, uvs, _ = meshgen.grid_mesh(depth, D)
verts = np.asarray(verts).copy(); verts[:, 2] *= 4.0
vg = jax.device_put(verts.reshape(n, n, 3))
uvg = jax.device_put(np.asarray(uvs).reshape(n, n, 2))
tex = jax.device_put(texture)

sway = animation.default_sway(5.0)
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
view = np.asarray(sway.batch(animation.frame_times(64, 60.0)))[0]
mvp = (proj @ cam @ view).astype(np.float32)

cfgq = rs.suggest_scan_config(n, W, H, quality=True)
cfg1 = __import__("dataclasses").replace(cfgq, row_edge=False,
                                         tex_rows=128, tex_cols=384)
cfg2 = rs.suggest_scan_config(n, H, W, sr=cfgq.sr, off=cfgq.off,
                              dmax=cfgq.dmax, tex_rows=192, tex_cols=384)

mvps = jnp.asarray(np.repeat(mvp[None], 8, axis=0))
S = np.asarray(rs._ROW_EDGE_SWAP, np.float64)
mvps2 = jnp.asarray(np.einsum("ij,tjk->tik", S,
                              np.asarray(mvps, np.float64)).astype(np.float32))
vg_t = jnp.transpose(vg, (1, 0, 2))

# attrs pipeline
b1, _ = rs._scan_attrs_grouped(mvps, vg, W, H, cfg1, False, 8)
b2, _ = rs._scan_attrs_grouped(mvps2, vg_t, H, W, cfg2, False, 8)
merged = rs._merge_row_edge(b1, b2, W, H)
attrs_q = np.asarray(rs._shade_scan_batched(merged, tex, W, H, "texture"))[0]
# which pass won per pixel (replicate the merge's win2)
a1 = np.asarray(b1).transpose(0, 1, 3, 2, 4).reshape(8, -1, 8, b1.shape[4])[0][:H, :, :W]
a2 = np.asarray(b2).transpose(0, 1, 3, 2, 4).reshape(8, -1, 8, b2.shape[4])[0][:W, :, :H].transpose(2, 1, 0)
win2 = (a2[:, 3] > 0.5) & (a2[:, 4] < a1[:, 4])

# texture_z pipeline
r1, z1, _ = rs._scan_rgba_z_grouped(mvps, vg, tex, W, H, cfg1, False, 8)
r2, z2, _ = rs._scan_rgba_z_grouped(mvps2, vg_t, jnp.transpose(tex, (1, 0, 2)),
                                    H, W, cfg2, False, 8)
raw = rs._merge_row_edge_raw(r1, z1, r2, z2, W, H)
tz_q = np.asarray(rs._assemble_rgba_batched(raw, W, H))[0]
win2r = np.asarray(z2)[0, :W, :H].T < np.asarray(z1)[0, :H, :W]

# lossless grid
cfg_ll = measured_config(np.asarray(mvps[:1]), np.asarray(vg), W, H,
                         quantile=1.0, row_anchors=2)
grid = np.asarray(render_frames_grid(mvps[:1], vg, uvg, tex, W, H, cfg_ll,
                                     frame_batch=1))[0]

def fl(a, b):
    return (np.abs(a.astype(int) - b.astype(int)).max(-1) > 8)

f_tz = fl(tz_q, grid); f_at = fl(attrs_q, grid); f_x = fl(tz_q, attrs_q)
print("tz-vs-grid flips:   ", f_tz.mean())
print("attrs-vs-grid flips:", f_at.mean())
print("tz-vs-attrs flips:  ", f_x.mean())
print("win2 (attrs) rate:", win2.mean(), " win2 (raw) rate:", win2r.mean(),
      " disagree:", (win2 != win2r).mean())
only_tz = f_tz & ~f_at
print("flips only in tz:", only_tz.mean())
for name, m in [("only_tz & win2r", only_tz & win2r),
                ("only_tz & ~win2r", only_tz & ~win2r)]:
    print(name, m.mean())
