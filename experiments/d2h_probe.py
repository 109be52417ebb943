"""Device->host transfer scaling probe (round 5, preset-5 farm de-bottleneck).

The farm's readback of (S, V, H, W, 4) uint8 frames through the remote-TPU
tunnel measured ~16 MB/s serial (ROADMAP round-1 note). If that ceiling is
per-TRANSFER protocol latency rather than wire bandwidth, concurrent
transfers raise farm throughput. Measures:

  1. serial per-scene np.asarray
  2. one whole-array np.asarray
  3. copy_to_host_async on every scene, then consume
  4. 2/4 host threads pulling scene shards concurrently

Run alone on the TPU box: python experiments/d2h_probe.py
"""

import concurrent.futures as cf
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

S, V, H, W = 8, 16, 480, 640
NB = S * V * H * W * 4

x = jax.device_put(jnp.arange(NB, dtype=jnp.uint8).reshape(S, V, H, W, 4))
x.block_until_ready()
print(f"payload: {NB/2**20:.0f} MiB ({S} scenes x {V} views VGA RGBA)")


def timeit(name, fn, reps=2):
    fn()  # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>28}: {best:6.2f}s = {NB/2**20/best:6.1f} MiB/s")
    return best


timeit("serial per-scene asarray", lambda: [np.asarray(x[s]) for s in range(S)])
timeit("whole-array asarray", lambda: np.asarray(x))


def async_then_consume():
    shards = [x[s] for s in range(S)]
    for sh in shards:
        sh.copy_to_host_async()
    return [np.asarray(sh) for sh in shards]


timeit("copy_to_host_async all", async_then_consume)

for nthreads in (2, 4):
    def pooled(nt=nthreads):
        with cf.ThreadPoolExecutor(nt) as ex:
            return list(ex.map(lambda s: np.asarray(x[s]), range(S)))

    timeit(f"{nthreads}-thread pooled asarray", pooled)
