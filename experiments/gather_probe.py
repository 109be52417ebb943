"""Probe: which dynamic-gather forms does Mosaic lower inside a Pallas TPU kernel,
and at what throughput?

Round-2 design question (ROADMAP.md "the gather problem"): the inverse-mapping
rasteriser needs per-pixel reads of a VMEM-resident window table at computed
(row, col) indices. Candidate mechanisms, most-preferred first:

  A. jnp.take_along_axis(table, idx, axis=-1)   — per-lane dynamic gather
  B. jnp.take_along_axis(table, idx, axis=0)    — per-sublane dynamic gather
  C. jnp.take(flat_table, idx2d)                — general flat gather
  D. one-hot MXU contraction                     — known-good fallback

Each is compiled standalone; failures print the Mosaic error. Throughput is
measured with an in-kernel fori_loop whose index perturbs the gather indices
(prevents hoisting), 8 output accumulation.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 256
S, L = 128, 128  # gather output shape per iteration (sublanes x lanes)


def _time(fn, *args):
    out = jax.block_until_ready(jax.jit(fn)(*args))
    # two fresh timing calls (identical-buffer retiming is unreliable on axon)
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
        msg = repr(e).replace("\n", " ")[:300]
        print(f"{name}: FAIL  {msg}")
    sys.stdout.flush()


# ---------------------------------------------------------------- variant A
def build_lane_gather():
    # table row r: 512 lanes of data; idx picks per-lane within the row.
    tab = jnp.asarray(np.random.rand(S, 512), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 512, (S, L)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = (idx_ref[:] + i) % 512
            return acc + jnp.take_along_axis(tab_ref[:], ix, axis=1)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, L), jnp.float32))

    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    return fn, (tab, idx)


# ---------------------------------------------------------------- variant B
def build_sublane_gather():
    # gather rows: out[s, l] = tab[idx[s, l], l]
    tab = jnp.asarray(np.random.rand(512, L), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 512, (S, L)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            ix = (idx_ref[:] + i) % 512
            return acc + jnp.take_along_axis(tab_ref[:], ix, axis=0)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, L), jnp.float32))

    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    return fn, (tab, idx)


# ---------------------------------------------------------------- variant C
def build_flat_take():
    tab = jnp.asarray(np.random.rand(8, 2048), jnp.float32)  # 16K entries
    idx = jnp.asarray(np.random.randint(0, 16384, (S, L)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        flat = tab_ref[:].reshape(-1)

        def body(i, acc):
            ix = (idx_ref[:] + i) % 16384
            return acc + jnp.take(flat, ix)
        out_ref[:] = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((S, L), jnp.float32))

    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    return fn, (tab, idx)


# ---------------------------------------------------------------- variant D
def build_onehot_mxu():
    # (P, CELLS) one-hot @ (CELLS, 8) table — the ROADMAP fallback, f32.
    P, CELLS, W = 1024, 1536, 8
    tab = jnp.asarray(np.random.rand(CELLS, W), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, CELLS, (P, 1)), jnp.int32)

    def kernel(tab_ref, idx_ref, out_ref):
        cell_iota = jax.lax.broadcasted_iota(jnp.int32, (P, CELLS), 1)

        def body(i, acc):
            oh = (cell_iota == ((idx_ref[:] + i) % CELLS)).astype(jnp.float32)
            got = jax.lax.dot_general(
                oh, tab_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return acc + got
        out_ref[:] = jax.lax.fori_loop(0, ITERS // 8, body,
                                       jnp.zeros((P, W), jnp.float32))

    def fn(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    return fn, (tab, idx)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, jax.devices()[0])
    probe("A lane   take_along_axis(axis=1)", build_lane_gather)
    probe("B sublane take_along_axis(axis=0)", build_sublane_gather)
    probe("C flat   jnp.take(1D, 2D idx)   ", build_flat_take)
    probe("D onehot MXU f32 (eff lookups)  ", build_onehot_mxu)
