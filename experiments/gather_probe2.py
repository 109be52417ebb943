"""Probe 2: find the exact 2D gather form Mosaic accepts (follow-up to probe 1:
jnp.take of a 1D table said 'Only 2D gather is supported', so some 2D form works).
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

ITERS = 256
S, L = 128, 128


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
        lookups = ITERS * S * L
        print(f"{name}: OK  {dt*1e3:8.3f} ms  {lookups/dt/1e9:8.2f} G lookups/s"
              f"  (checksum {float(jnp.sum(out)):.3e})")
    except Exception as e:  # noqa: BLE001
        msg = repr(e).replace("\n", " ")[:260]
        print(f"{name}: FAIL  {msg}")
    sys.stdout.flush()


def make(kernel, tab, idx, out_shape=(S, L)):
    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    return fn, (tab, idx)


# A2: take_along_axis axis=1, SAME shape (128,128) table and idx
def build_a2():
    tab = jnp.asarray(np.random.rand(S, L), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, L, (S, L)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = (idx_ref[:] + i) % L
            return acc + jnp.take_along_axis(tab_ref[:], ix, axis=1)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, L), jnp.float32))
    return make(kernel, tab, idx)


# B2: take_along_axis axis=0, SAME shape
def build_b2():
    tab = jnp.asarray(np.random.rand(S, L), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, S, (S, L)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = (idx_ref[:] + i) % S
            return acc + jnp.take_along_axis(tab_ref[:], ix, axis=0)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, L), jnp.float32))
    return make(kernel, tab, idx)


# C2: jnp.take with 2D table along axis 0, idx (S, L)? -> out 3D; instead
# gather rows: out[s, l] = tab[idx[s, l] , l] via jnp.take? covered by B2.
# Try: tab rows 512 (more rows than sublanes), axis=0 take_along_axis.
def build_b3():
    tab = jnp.asarray(np.random.rand(512, L), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 512, (512, L)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = (idx_ref[:] + i) % 512
            return acc + jnp.take_along_axis(tab_ref[:], ix, axis=0)[:S]
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, L), jnp.float32))
    return make(kernel, tab, idx)


# A3: axis=1 with wider table, idx lane count == table lane count (512)
def build_a3():
    tab = jnp.asarray(np.random.rand(S, 512), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 512, (S, 512)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = (idx_ref[:] + i) % 512
            return acc + jnp.take_along_axis(tab_ref[:], ix, axis=1)[:, :L]
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, L), jnp.float32))
    return make(kernel, tab, idx)


# E: lax.gather via jnp.take axis=0 of 2D table with 1D-per-row semantics:
# out[s, l] = tab[idx1[s, 0], l] — row broadcast gather (dynamic row select per
# sublane), idx shape (S, 1).
def build_rowsel():
    tab = jnp.asarray(np.random.rand(512, L), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 512, (S, 1)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = (idx_ref[:] + i) % 512
            ixb = jnp.broadcast_to(ix, (S, L))
            return acc + jnp.take_along_axis(tab_ref[:], ixb, axis=0)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, L), jnp.float32))
    return make(kernel, tab, idx)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    probe("A2 taa axis=1 same-shape (128,128)", build_a2)
    probe("B2 taa axis=0 same-shape (128,128)", build_b2)
    probe("B3 taa axis=0 (512,128) idx(512,128)", build_b3)
    probe("A3 taa axis=1 (128,512) idx(128,512)", build_a3)
    probe("E  row-select taa axis=0 idx bcast", build_rowsel)
