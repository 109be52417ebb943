"""Probe 5: (a) dense-unroll marginal cost of the (8,128) lane gather;
(b) pltpu.roll with a traced (per-tile scalar) shift; (c) gather of int32
tables (for packed data); (d) bitcast u32<->f32 round-trip in-kernel.
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

OUTER = 64
UNROLL = 64


def _time(fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(fn)(*args))
    t1 = time.perf_counter()
    return (t1 - t0), out


def probe(name, build):
    try:
        fn, args = build()
        dt, out = _time(fn, *args)
        ops = OUTER * UNROLL
        print(f"{name}: OK  {dt*1e3:8.3f} ms  {dt/ops*1e9:7.1f} ns/op "
              f"{1024*ops/dt/1e9:8.2f} G lookups/s (sum {float(jnp.sum(out)):.2e})")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL  {repr(e)[:220]}")
    sys.stdout.flush()


def make(kernel, *arrays, out_shape=(8, 128), dtype=jnp.float32):
    def fn(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(arrays),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
    return fn, arrays


# (a) dense gathers: UNROLL distinct resident idx sets, no index math.
def build_dense(extra_mask):
    tab = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 128, (UNROLL, 8, 128)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, acc):
            for u in range(UNROLL):
                ix = idx_ref[u]
                if extra_mask:
                    ix = jax.lax.bitwise_and(ix, 127)
                acc = acc + jnp.take_along_axis(t, ix, axis=1)
            return acc

        out_ref[:] = jax.lax.fori_loop(0, OUTER, body,
                                       jnp.zeros((8, 128), jnp.float32))

    return lambda: make(kernel, tab, idx)


# (a2) same but 8 independent tables (checks table-switch cost)
def build_dense_multi():
    tab = jnp.asarray(np.random.rand(8, 8, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 128, (UNROLL, 8, 128)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        ts = [tab_ref[j] for j in range(8)]

        def body(i, acc):
            for u in range(UNROLL):
                ix = jax.lax.bitwise_and(idx_ref[u], 127)
                acc = acc + jnp.take_along_axis(ts[u % 8], ix, axis=1)
            return acc

        out_ref[:] = jax.lax.fori_loop(0, OUTER, body,
                                       jnp.zeros((8, 128), jnp.float32))

    return lambda: make(kernel, tab, idx)


# (b) pltpu.roll with traced shift
def build_roll():
    tab = jnp.asarray(np.random.rand(8, 256), jnp.float32)
    sh = jnp.asarray(np.random.randint(0, 256, (UNROLL, 1)), jnp.int32)

    def kernel(tab_ref, sh_ref, out_ref):
        t = tab_ref[:]

        def body(i, acc):
            for u in range(UNROLL):
                r = pltpu.roll(t, sh_ref[u, 0], axis=1)
                acc = acc + r[:, :128]
            return acc

        out_ref[:] = jax.lax.fori_loop(0, OUTER, body,
                                       jnp.zeros((8, 128), jnp.float32))

    return lambda: make(kernel, tab, sh)


# (c) int32 table gather
def build_int_gather():
    tab = jnp.asarray(np.random.randint(0, 1 << 20, (8, 128)), jnp.int32)
    idx = jnp.asarray(np.random.randint(0, 128, (UNROLL, 8, 128)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, acc):
            for u in range(UNROLL):
                ix = jax.lax.bitwise_and(idx_ref[u], 127)
                acc = acc + jnp.take_along_axis(t, ix, axis=1)
            return acc

        out_ref[:] = jax.lax.fori_loop(0, OUTER, body,
                                       jnp.zeros((8, 128), jnp.int32))

    return lambda: make(kernel, tab, idx, dtype=jnp.int32)


# (d) bitcast round trip f32 table -> u32 -> unpack bytes
def build_bitcast():
    tab = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 128, (UNROLL, 8, 128)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, acc):
            for u in range(UNROLL):
                ix = jax.lax.bitwise_and(idx_ref[u], 127)
                g = jnp.take_along_axis(t, ix, axis=1)
                b = pltpu.bitcast(g, jnp.int32)
                lo = (b & 0xFFFF).astype(jnp.float32)
                acc = acc + lo
            return acc

        out_ref[:] = jax.lax.fori_loop(0, OUTER, body,
                                       jnp.zeros((8, 128), jnp.float32))

    return lambda: make(kernel, tab, idx)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    probe("dense gather, no remask ", build_dense(False))
    probe("dense gather, &127      ", build_dense(True))
    probe("dense gather, 8 tables  ", build_dense_multi())
    probe("roll traced shift       ", build_roll())
    probe("int32 table gather      ", build_int_gather())
    probe("gather + bitcast unpack ", build_bitcast())
