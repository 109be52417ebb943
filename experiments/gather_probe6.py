"""Probe 6: honest timing of the (8,128) lane gather.

Earlier probes gave contradictory numbers (94 ns vs 10 us per op for the *same*
code modulo an &127) — consistent with the axon result-dedup trap: a timed call
on identical buffers can return a cached result. Here every timed call uses a
fresh input buffer (ring of 4), and we report the min/mean of 6 timed calls.
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

OUTER = 512
UNROLL = 64
NBUF = 4
CALLS = 6


def _time(fn, arg_sets):
    for a in arg_sets:
        jax.block_until_ready(jax.jit(fn)(*a))
    ts = []
    for c in range(CALLS):
        a = arg_sets[c % NBUF]
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(fn)(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def probe(name, build):
    try:
        fn, arg_sets = build()
        tmin, tmean = _time(fn, arg_sets)
        ops = OUTER * UNROLL
        print(f"{name}: min {tmin*1e3:8.3f} ms mean {tmean*1e3:8.3f} ms "
              f"-> {tmin/ops*1e9:7.1f} ns/op {1024*ops/tmin/1e9:7.2f} G lookups/s")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL  {repr(e)[:200]}")
    sys.stdout.flush()


def pc(kernel, nin):
    def fn(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nin,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
    return fn


def build_gather(mask):
    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, acc):
            for u in range(UNROLL):
                ix = idx_ref[u]
                if mask:
                    ix = jax.lax.bitwise_and(ix, 127)
                acc = acc + jnp.take_along_axis(t, ix, axis=1)
            return acc

        out_ref[:] = jax.lax.fori_loop(0, OUTER, body,
                                       jnp.zeros((8, 128), jnp.float32))

    rng = np.random.default_rng(0)
    sets = []
    for _ in range(NBUF):
        tab = jnp.asarray(rng.random((8, 128)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 128, (UNROLL, 8, 128)), jnp.int32)
        sets.append((tab, idx))
    return lambda: (pc(kernel, 2), sets)


def build_fma():
    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, acc):
            for u in range(UNROLL):
                acc = acc + t * idx_ref[u]
            return acc

        out_ref[:] = jax.lax.fori_loop(0, OUTER, body,
                                       jnp.zeros((8, 128), jnp.float32))

    rng = np.random.default_rng(1)
    sets = []
    for _ in range(NBUF):
        tab = jnp.asarray(rng.random((8, 128)), jnp.float32)
        idx = jnp.asarray(rng.random((UNROLL, 8, 128)), jnp.float32)
        sets.append((tab, idx))
    return lambda: (pc(kernel, 2), sets)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    probe("fma baseline       ", build_fma())
    probe("gather raw idx     ", build_gather(False))
    probe("gather &127        ", build_gather(True))
