"""Time one interpret-mode scan render at d8/VGA (feasibility of a pytest
GL gate, VERDICT r3 next-round #3) and record its masked PSNR vs the
committed golden."""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image
from jax.experimental.pallas import tpu as pltpu

from depthrenderer_tpu import io as dio, meshgen, transforms
from depthrenderer_tpu.evaluate import masked_psnr
from depthrenderer_tpu.ops import raster_scan

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "tests/goldens/gl_sample_d8_frontal.png")
SAMPLES = "/root/reference/samples"

colour = dio.load_colour(f"{SAMPLES}/00000_colors.png")
depth = dio.resize(dio.load_depth(f"{SAMPLES}/00000_depth.png"), colour.shape)
golden = np.asarray(Image.open(GOLDEN))
H, W = golden.shape[:2]
D = 8
n = 2**D + 1
verts, uvs, _ = (np.asarray(a) for a in meshgen.grid_mesh(depth, D))
verts = verts.copy()
verts[:, 2] *= 4.0
proj = np.asarray(transforms.perspective(18.0, W / H))
mvp = (proj @ np.asarray(transforms.translation(dz=-10.0))).astype(np.float32)

cfg = raster_scan.suggest_scan_config(n, W, H)
print("config:", cfg, flush=True)

t0 = time.perf_counter()
with pltpu.force_tpu_interpret_mode():
    frame = np.asarray(raster_scan.render_frames_scan(
        mvp[None], verts.reshape(n, n, 3), uvs.reshape(n, n, 2),
        colour.astype(np.float32), W, H, cfg, frame_batch=1,
        interpret=True))[0]
t1 = time.perf_counter()
print(f"compile+run: {t1 - t0:.1f}s", flush=True)

away = masked_psnr(frame, golden, depth=depth)
overall = masked_psnr(frame, golden)
print(f"scan interpret d8/VGA vs GL: overall {overall:.2f} dB, "
      f"masked {away:.2f} dB", flush=True)

# Second run: cached-compile cost (what a warm CI pays).
t0 = time.perf_counter()
with pltpu.force_tpu_interpret_mode():
    frame2 = np.asarray(raster_scan.render_frames_scan(
        mvp[None], verts.reshape(n, n, 3), uvs.reshape(n, n, 2),
        colour.astype(np.float32), W, H, cfg, frame_batch=1,
        interpret=True))[0]
print(f"second run: {time.perf_counter() - t0:.1f}s", flush=True)
