"""Score the PROVABLY lossless control against the real-GL goldens.

The round-3 story called scan's 26.9/26.1 dB at 4K/d12 a "~0.5-px fill-rule
floor" with no on-config lossless comparison (VERDICT r3 missing #2). This
renders render_frame_grid_exact at the committed 4K/d12 golden views and
reports ITS masked PSNR vs GL — the honest floor. Also re-scores the
1080p/d10 goldens with the now-truly-lossless control (the round-3 "grid
floor" 43.1/37.5 dB was measured with the anchor-dropping control).
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from depthrenderer_tpu import io as dio, meshgen, transforms
from depthrenderer_tpu.evaluate import masked_psnr
from depthrenderer_tpu.ops.raster_grid import render_frame_grid_exact

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
from make_gl_golden import bench_view, production_scene  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    (3840, 2160, 12, 16, 0.25, [
        ("frontal", "gl_sample_4k_d12_frontal.png"),
        ("sway:40", "gl_sample_4k_d12_sway40.png")]),
    (1920, 1080, 10, 2, None, [
        ("frontal", "gl_sample_d10_1080p_frontal.png"),
        ("sway:40", "gl_sample_d10_1080p_sway40.png")]),
]

for W, H, D, strips, cull, goldens in CONFIGS:
    n = 2**D + 1
    texture, depth, verts, uvs, indices, proj, cam = production_scene(W, H, D)
    vg = jax.device_put(verts.reshape(n, n, 3).astype(np.float32))
    uvg = jax.device_put(uvs.reshape(n, n, 2).astype(np.float32))
    tex = jax.device_put(texture.astype(np.float32))
    for view, fname in goldens:
        mvp = bench_view(proj, cam, view)
        golden = np.asarray(Image.open(os.path.join(ROOT, "tests/goldens",
                                                    fname)))
        frame = render_frame_grid_exact(mvp, vg, uvg, tex, W, H,
                                        strips=strips,
                                        edge_cull_threshold=cull)
        away = masked_psnr(frame, golden, depth=depth)
        overall = masked_psnr(frame, golden)
        print(f"{W}x{H} d{D} {view}: exact control vs GL "
              f"overall {overall:.2f} dB, masked {away:.2f} dB", flush=True)
