"""Probe 8: gather cost with loop-VARIANT indices (prevents hoisting) and 4
rotating accumulators (measures throughput, not add latency). The baseline does
identical index arithmetic but converts instead of gathering, so the difference
isolates the gather instruction itself.
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

OUTER = 2048
UNROLL = 32
NBUF = 6
CALLS = 5


def _time(fn, arg_sets):
    jax.block_until_ready(jax.jit(fn)(*arg_sets[0]))
    ts = []
    for c in range(CALLS):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(fn)(*arg_sets[1 + c]))
        ts.append(time.perf_counter() - t0)
    return min(ts), sum(ts) / len(ts)


def probe(name, build):
    try:
        fn, arg_sets = build()
        tmin, tmean = _time(fn, arg_sets)
        ops = OUTER * UNROLL
        print(f"{name}: min {tmin*1e3:8.3f} ms mean {tmean*1e3:8.3f} ms "
              f"-> {tmin/ops*1e9:7.2f} ns/op {1024*ops/tmin/1e9:7.1f} G lookups/s")
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL  {repr(e)[:200]}")
    sys.stdout.flush()


def pc(kernel):
    def fn(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
    return fn


def sets(seed):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(NBUF):
        tab = jnp.asarray(rng.random((8, 128)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 128, (UNROLL, 8, 128)), jnp.int32)
        out.append((tab, idx))
    return out


def build(do_gather):
    def kernel(tab_ref, idx_ref, out_ref):
        t = tab_ref[:]

        def body(i, accs):
            accs = list(accs)
            for u in range(UNROLL):
                ix = jax.lax.bitwise_and(idx_ref[u] + i, 127)
                if do_gather:
                    g = jnp.take_along_axis(t, ix, axis=1)
                else:
                    g = ix.astype(jnp.float32)
                accs[u % 4] = accs[u % 4] + g
            return tuple(accs)

        z = jnp.zeros((8, 128), jnp.float32)
        a = jax.lax.fori_loop(0, OUTER, body, (z, z, z, z))
        out_ref[:] = a[0] + a[1] + a[2] + a[3]

    return lambda: (pc(kernel), sets(0))


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    probe("baseline (idx math + convert)", build(False))
    probe("gather   (idx math + gather) ", build(True))
