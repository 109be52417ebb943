"""Mid-tier knob A/B: fps + GL masked PSNR per (pass1, pass2) config combo.

Round-5 ask #3 harness: the shipped mid tier (`--patch --colfix 3`) measured
26.1 fps at 40.23/40.76 dB; its stage profile (patch_profile.py, colfix=3)
is pass1 22.3 / flags 1.7 / pass2-real 18.2 (zero-flag floor 7.0) / merge
1.9 ms. This sweeps the cheap knobs on BOTH passes and prints the frontier.

Combos come from MID_LADDER_COMBOS: semicolon-separated entries
"label | pass1 k=v,... | pass2 k=v,..." (pass2 overrides go through
DEPTHRENDERER_PATCH_CFG2). Default: the shipped point + the candidates.

TPU-side; run alone (one TPU process at a time).
"""

import dataclasses
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from PIL import Image

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.evaluate import masked_psnr
from depthrenderer_tpu.ops import raster_scan
from depthrenderer_tpu.ops.raster_scan import (render_frames_scan,
                                               suggest_scan_config,
                                               unpack_raw_frames)

W, H, D, T = 1920, 1080, 10, 64
n = 2**D + 1
colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   (H, W))
texture = dio.resize(colour, (H, W)).astype(np.float32)
verts, uvs, _ = (np.asarray(a) for a in meshgen.grid_mesh(depth, D))
verts = verts.copy()
verts[:, 2] *= 4.0
vgrid = jax.device_put(jnp.asarray(verts.reshape(n, n, 3), jnp.float32))
uvgrid = jax.device_put(jnp.asarray(np.asarray(uvs).reshape(n, n, 2),
                                    jnp.float32))
tex = jax.device_put(jnp.asarray(texture, jnp.float32))

proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
sway = animation.default_sway(5.0)
times = animation.frame_times(T, 60.0)
vs = np.asarray(sway.batch(times))
mvps = np.einsum("ij,jk,tkl->til", proj, cam, vs).astype(np.float32)
sway64_40 = np.asarray(animation.default_sway(5.0).batch(
    animation.frame_times(64, 60.0)))[40]
GOLDENS = {
    "frontal": ("tests/goldens/gl_sample_d10_1080p_frontal.png",
                (proj @ cam).astype(np.float32)),
    "sway40": ("tests/goldens/gl_sample_d10_1080p_sway40.png",
               (proj @ cam @ sway64_40).astype(np.float32)),
}

DEFAULT_COMBOS = (
    "ship | patch=1,colfix=3 | ;"
    "p2cfx1 | patch=1,colfix=3 | colfix=1;"
    "p1cfx1 | patch=1,colfix=1 | ;"
    "p2sr6 | patch=1,colfix=3 | sr=6,off=2;"
    "p1cfx2 | patch=1,colfix=2 | "
)


def parse_overrides(s):
    out = {}
    for kv in s.split(","):
        kv = kv.strip()
        if not kv:
            continue
        k, v = kv.split("=")
        out[k.strip()] = None if v.strip().lower() == "none" else int(v)
    return out


def run_combo(label, p1_ov, p2_env):
    if p2_env:
        os.environ["DEPTHRENDERER_PATCH_CFG2"] = p2_env
    else:
        os.environ.pop("DEPTHRENDERER_PATCH_CFG2", None)
    cfg = suggest_scan_config(n, W, H, **parse_overrides(p1_ov))
    render = lambda m: render_frames_scan(  # noqa: E731
        jnp.asarray(m), vgrid, uvgrid, tex, W, H, cfg,
        frame_batch=16, raw_u32=True)
    t0 = time.perf_counter()
    jax.block_until_ready(render(mvps))
    print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(render(mvps))
        best = max(best, T / (time.perf_counter() - t0))
    psnrs = {}
    for view, (path, mvp_v) in GOLDENS.items():
        if not os.path.exists(path):
            continue
        golden = np.asarray(Image.open(path))
        mq = np.repeat(mvp_v[None], 16, axis=0)
        fq = unpack_raw_frames(np.asarray(render(mq))[:1], W, H)[0]
        psnrs[view] = masked_psnr(fq, golden, depth=dio.resize(
            dio.load_depth("/root/reference/samples/00000_depth.png"),
            golden.shape[:2]))
    print(f"[{label}] {best:.1f} fps | GL masked "
          + " ".join(f"{v} {p:.2f} dB" for v, p in psnrs.items()), flush=True)
    return best, psnrs


for entry in os.environ.get("MID_LADDER_COMBOS", DEFAULT_COMBOS).split(";"):
    parts = [p.strip() for p in entry.split("|")]
    if len(parts) != 3 or not parts[0]:
        continue
    run_combo(parts[0], parts[1], parts[2])
