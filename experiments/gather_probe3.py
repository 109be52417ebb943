"""Probe 3: per-op cost of the Mosaic lane-dynamic gather (take_along_axis axis=1).

Probe 2 established: supported ONLY for same-shape (S, 128) operands gathering
along a 128-lane row. This probe isolates per-op cost: unrolled gathers with
precomputed indices (no index math in the loop), vs an FMA-only baseline loop,
for S = 8 / 16 / 32, plus a packed-u32 variant (4 bytes/lane) to test whether
cost is per-op or per-byte.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OUTER = 512     # fori iterations
UNROLL = 8      # gathers per iteration
NIDX = 16       # distinct index sets cycled via static unroll slot


def _time(fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(fn)(*args))
    t1 = time.perf_counter()
    return (t1 - t0), out


def probe(name, build):
    try:
        fn, args, lookups = build()
        dt, out = _time(fn, *args)
        ops = OUTER * UNROLL
        print(f"{name}: OK  {dt*1e3:8.3f} ms  {dt/ops*1e9:7.1f} ns/op "
              f"{lookups*ops/dt/1e9:8.2f} G lookups/s (sum {float(jnp.sum(out)):.2e})")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL  {repr(e)[:200]}")
    sys.stdout.flush()


def build_gather(S, dtype=jnp.float32):
    tab = jnp.asarray(np.random.rand(S, 128), jnp.float32)
    if dtype == jnp.uint32:
        tab = (tab * 1e6).astype(jnp.uint32)
    idx = jnp.asarray(np.random.randint(0, 128, (NIDX, S, 128)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, acc):
            for u in range(UNROLL):
                g = jnp.take_along_axis(t, idx_ref[u], axis=1)
                if dtype == jnp.uint32:
                    g = g.astype(jnp.float32)
                acc = acc + g
            return acc

        out_ref[:] = jax.lax.fori_loop(
            0, OUTER, body, jnp.zeros((S, 128), jnp.float32))

    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    return lambda: (fn, (tab, idx), S * 128)


def build_baseline(S):
    tab = jnp.asarray(np.random.rand(S, 128), jnp.float32)
    idx = jnp.asarray(np.random.rand(NIDX, S, 128), jnp.float32)

    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, acc):
            for u in range(UNROLL):
                acc = acc + t * idx_ref[u]
            return acc

        out_ref[:] = jax.lax.fori_loop(
            0, OUTER, body, jnp.zeros((S, 128), jnp.float32))

    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    return lambda: (fn, (tab, idx), S * 128)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    probe("baseline fma  (8,128)", build_baseline(8))
    probe("gather f32    (8,128)", build_gather(8))
    probe("gather f32   (16,128)", build_gather(16))
    probe("gather f32   (32,128)", build_gather(32))
    probe("gather u32    (8,128)", build_gather(8, jnp.uint32))
