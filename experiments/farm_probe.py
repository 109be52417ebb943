"""Farm render-path probe (round 5, session 3): the sharded farm measures
13 scene-views/s RENDER-ONLY at 640x480/d8 on the 1-device mesh while the
host-orchestrated scan path does ~59 fps at 1080p/d10 (a ~20x bigger
problem). Suspect: the all-in-one shard_map jit (prep + pallas + unpack
fused -> layout copies, the round-2 lesson) + lax.map over scenes.

Times, on chip at the EXACT bench_farm workload (8 scenes x 16 views,
640x480, d8): (a) the sharded path as the bench runs it, (b) sequential
host-orchestrated render_frames_scan per scene (async dispatch, one
16-frame group each), (c) b + device-side YUV420 pack.

TPU-side; run alone.
"""
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

from depthrenderer_tpu import animation, io as dio, meshgen, transforms
from depthrenderer_tpu.ops.raster_grid import measured_config
from depthrenderer_tpu.ops.raster_scan import (render_frames_scan,
                                               suggest_scan_config)
from depthrenderer_tpu.parallel import make_render_mesh, render_scenes_sharded

S, V, W, H, D = 8, 16, 640, 480, 8
n = 2**D + 1
colour = dio.load_colour("/root/reference/samples/00000_colors.png")
depth = dio.resize(dio.load_depth("/root/reference/samples/00000_depth.png"),
                   (H, W))
texture = dio.resize(colour, (H, W)).astype(np.float32)

rng = np.random.default_rng(0)
base = depth.astype(np.int32)
_, uvs, _ = meshgen.grid_mesh(depth, D)
uvgrid = np.asarray(uvs).reshape(n, n, 2)


def scene_vgrid():
    d = np.clip(base + rng.integers(-12, 13, base.shape), 0, 255)
    v, _, _ = meshgen.grid_mesh(d.astype(np.uint8), D)
    v = np.asarray(v).reshape(n, n, 3).copy()
    v[..., 2] *= 4.0
    return v


vgrids = np.stack([scene_vgrid() for _ in range(S)])
sway = animation.default_sway(5.0)
times = animation.frame_times(V, 60.0)
views = np.asarray(sway.batch(times))
proj = np.asarray(transforms.perspective(18.0, W / H))
cam = np.asarray(transforms.translation(dz=-10.0))
mvps1 = (proj[None] @ (cam[None] @ views)).astype(np.float32)
mvps = np.broadcast_to(mvps1, (S, V, 4, 4)).copy()

config = measured_config(mvps1, vgrids[0], W, H)
mesh = make_render_mesh()
uv_b = np.broadcast_to(uvgrid, (S,) + uvgrid.shape)
tex_b = np.broadcast_to(texture, (S,) + texture.shape)


def timeit(label, fn, reps=3):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"[{label}] {best:.2f}s = {S * V / best:.1f} scene-views/s",
        flush=True)


# (a) the sharded path, GS=2 groups as bench_farm dispatches it
def sharded():
    outs = []
    for s0 in range(0, S, 2):
        outs.append(render_scenes_sharded(
            mesh, mvps[s0:s0 + 2], vgrids[s0:s0 + 2], uv_b[s0:s0 + 2],
            tex_b[s0:s0 + 2], W, H, config, frame_batch=min(4, V),
            impl="scan"))
    return outs


timeit("sharded GS=2", sharded)

# (b) host-orchestrated per scene: separately-jitted stages, async groups
scfg = suggest_scan_config(n, W, H)
print("scan cfg:", scfg, flush=True)
vg_d = [jax.device_put(jnp.asarray(v, jnp.float32)) for v in vgrids]
uv_d = jax.device_put(jnp.asarray(uvgrid, jnp.float32))
tex_d = jax.device_put(jnp.asarray(texture, jnp.float32))
mv = jnp.asarray(mvps1)


def host_loop(raw):
    outs = [render_frames_scan(mv, v, uv_d, tex_d, W, H, scfg,
                               frame_batch=16, raw_u32=raw)
            for v in vg_d]
    return outs


timeit("host-loop rgba", lambda: host_loop(False))

# (c) + device-side YUV420 (what the farm reads back)
timeit("host-loop yuv420",
       lambda: [dio.rgba_to_yuv420(f) for f in host_loop(False)])
