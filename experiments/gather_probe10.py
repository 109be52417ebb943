"""Probe 10: is the gather loop actually executing? Correctness vs numpy and
time-vs-OUTER scaling in one process."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL = 32


def make_fn(outer):
    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, accs):
            accs = list(accs)
            for u in range(UNROLL):
                ix = jax.lax.bitwise_and(idx_ref[u] + i, 127)
                g = jnp.take_along_axis(t, ix, axis=1)
                accs[u % 4] = accs[u % 4] + g
            return tuple(accs)

        z = jnp.zeros((8, 128), jnp.float32)
        a = jax.lax.fori_loop(0, outer, body, (z, z, z, z))
        out_ref[:] = a[0] + a[1] + a[2] + a[3]

    @jax.jit
    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    return fn


def ref(tab, idx, outer):
    acc = np.zeros((8, 128), np.float32)
    for i in range(outer):
        for u in range(UNROLL):
            ix = (idx[u] + i) & 127
            acc += np.take_along_axis(tab, ix, axis=1)
    return acc


rng = np.random.default_rng(0)
tab = rng.random((8, 128)).astype(np.float32)
idx = rng.integers(0, 128, (UNROLL, 8, 128)).astype(np.int32)

# correctness at OUTER=3
fn3 = make_fn(3)
got = np.asarray(jax.block_until_ready(fn3(jnp.asarray(tab), jnp.asarray(idx))))
want = ref(tab, idx, 3)
print("correct @outer=3:", np.allclose(got, want, rtol=1e-5), flush=True)

# scaling
for outer in (1024, 8192, 65536):
    fn = make_fn(outer)
    bufs = [(jnp.asarray(rng.random((8, 128)).astype(np.float32)),
             jnp.asarray(rng.integers(0, 128, (UNROLL, 8, 128)).astype(np.int32)))
            for _ in range(4)]
    jax.block_until_ready(fn(*bufs[0]))
    ts = []
    for b in bufs[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*b))
        ts.append(time.perf_counter() - t0)
    ops = outer * UNROLL
    tmin = min(ts)
    print(f"outer={outer:6d}: min {tmin*1e3:9.3f} ms  {tmin/ops*1e9:8.2f} ns/op",
          flush=True)
