"""Hardware probe for the scan-rasteriser march kernel mechanics (v5e).

Questions (each gates a design choice in ops/raster_scan.py):
 P1. Does an in-kernel (8, 256) -> (256, 8) transpose compile + produce correct
     values? (march wants the crossing curve sublane-major for the dense-outer
     (256 cols x 128 px) formulation; fallback = pltpu.roll loop)
 P2. Dense-outer top-2-by-key extraction over the sublane axis of (256, 128):
     min + arg-extraction via iota, mask, second min. Correctness vs numpy.
 P3. The 2-subtable mod-128 gather: take_along_axis on (8,128) halves + select,
     idx in [0, 256). Correctness vs numpy.
 P4. Timing slopes for P2/P3 bodies (trip-count method; axon tunnel lies at
     sub-ms scales -- only slopes are trustworthy, see ROADMAP.md).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")


def probe(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
        print(f"[ok] {name}")
        return out
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:180]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")
        return None


# ---------- P1: transpose ----------
def transpose_kernel(x_ref, o_ref):
    o_ref[:] = jnp.transpose(x_ref[:], (1, 0))


def p1():
    x = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)
    f = pl.pallas_call(
        transpose_kernel,
        out_shape=jax.ShapeDtypeStruct((256, 8), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = probe("P1 transpose (8,256)->(256,8)", jax.jit(f), x)
    if out is not None:
        ok = np.array_equal(np.asarray(out), np.asarray(x).T)
        print(f"     values {'exact' if ok else 'WRONG'}")


# ---------- P2: dense-outer top-2 over sublanes ----------
def march_kernel(curve_ref, zc_ref, qx_ref, o_ref, *, trips):
    curve_t = jnp.transpose(curve_ref[:], (1, 0))  # (256, 8)
    zc_t = jnp.transpose(zc_ref[:], (1, 0))
    iota = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0).astype(jnp.float32)
    BIG = 3.0e38

    def one(y, qx_shift):
        c = curve_t[:, y:y + 1]                                 # (256, 1)
        zz = zc_t[:, y:y + 1]
        f = c - (qx_ref[0:1, :] + qx_shift)                     # (256, 128)
        f2 = pltpu.roll(f, 255, 0)  # -1 mod 256 (shift must be non-negative)
        hit = (f * f2 <= 0.0) & (zz < BIG)
        key = jnp.where(hit, zz, BIG)
        m1 = jnp.min(key, axis=0, keepdims=True)                # (1, 128)
        o1 = jnp.min(jnp.where(key == m1, iota, BIG), axis=0, keepdims=True)
        key2 = jnp.where(iota == o1, BIG, key)
        m2 = jnp.min(key2, axis=0, keepdims=True)
        o2 = jnp.min(jnp.where(key2 == m2, iota, BIG), axis=0, keepdims=True)
        return o1, m1, o2, m2

    def body(t, acc):
        rows = []
        for y in range(8):
            o1, m1, o2, m2 = one(y, 0.001 * t)
            rows.append(jnp.concatenate([o1, m1, o2, m2], axis=0))  # (4,128)
        return acc + jnp.concatenate(rows, axis=0)  # (32, 128)

    o_ref[:] = jax.lax.fori_loop(0, trips, body, jnp.zeros((32, 128), jnp.float32))


def p2(trips):
    k = functools.partial(march_kernel, trips=trips)
    f = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return jax.jit(f)


def p2_run():
    rng = np.random.default_rng(0)
    curve = np.sort(rng.uniform(0, 1920, (8, 256)).astype(np.float32), axis=1)
    zc = rng.uniform(-1, 1, (8, 256)).astype(np.float32)
    qx = (np.arange(128) * 15.0 + 0.5).astype(np.float32).reshape(1, 128)
    qx = np.broadcast_to(qx, (8, 128)).copy()
    out = probe("P2 march top-2 (trips=1)", p2(1), curve, zc, qx)
    if out is None:
        return
    # numpy reference for y=0, trip t=0
    f = curve[0][:, None] - (qx[0:1, :] + 0.0)
    f2 = np.concatenate([f[1:], f[:1]])
    hit = (f * f2) <= 0
    key = np.where(hit, zc[0][:, None], 3.0e38)
    m1 = key.min(axis=0)
    o1 = np.where(key == m1[None, :], np.arange(256)[:, None], 3.0e38).min(axis=0)
    ok = np.allclose(np.asarray(out)[0], o1) and np.allclose(np.asarray(out)[1], m1)
    print(f"     y0 top-1 values {'exact' if ok else 'WRONG'}")
    # timing slope
    f1 = p2(50)
    f2_ = p2(250)
    for fn in (f1, f2_):
        jax.block_until_ready(fn(curve, zc, qx))
    t0 = time.perf_counter()
    jax.block_until_ready(f1(curve, zc, qx))
    t1 = time.perf_counter()
    jax.block_until_ready(f2_(curve, zc, qx))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / 200
    print(f"     per-trip (8y x 2-ish slots worth): {per*1e6:.1f} us "
          f"-> per (y, top2-march-256): {per*1e6/8:.2f} us")


# ---------- P3: 2-subtable mod-128 gather ----------
def gather_kernel(tab_ref, idx_ref, o_ref, *, trips):
    sub0 = tab_ref[:, 0:128]
    sub1 = tab_ref[:, 128:256]

    def body(t, acc):
        idx = jnp.clip(idx_ref[:] + t, 0, 255)
        lo = jnp.clip(idx, 0, 127)
        hi = jnp.clip(idx - 128, 0, 127)
        g = jnp.where(idx < 128,
                      jnp.take_along_axis(sub0, lo, axis=1),
                      jnp.take_along_axis(sub1, hi, axis=1))
        return acc + g

    o_ref[:] = jax.lax.fori_loop(0, trips, body, jnp.zeros((8, 128), jnp.float32))


def gather_kernel_b(tab_ref, idx_ref, o_ref, *, trips):
    sub0 = tab_ref[:, 0:128]
    sub1 = tab_ref[:, 128:256]

    def body(t, acc):
        idx = jax.lax.bitwise_and(idx_ref[:] + t, 255)
        lo = jax.lax.bitwise_and(idx, 127)
        g0 = jnp.take_along_axis(sub0, lo, axis=1)
        g1 = jnp.take_along_axis(sub1, lo, axis=1)
        return acc + jnp.where(idx < 128, g0, g1)

    o_ref[:] = jax.lax.fori_loop(0, trips, body, jnp.zeros((8, 128), jnp.float32))


def gather_kernel_c(tab_ref, idx_ref, o_ref, *, trips):
    sub0 = tab_ref[:, 0:128]

    def body(t, acc):
        idx = jax.lax.bitwise_and(idx_ref[:] + t, 127)
        return acc + jnp.take_along_axis(sub0, idx, axis=1)

    o_ref[:] = jax.lax.fori_loop(0, trips, body, jnp.zeros((8, 128), jnp.float32))


def p3x_run(kern, label):
    rng = np.random.default_rng(1)
    tab = rng.uniform(0, 1, (8, 256)).astype(np.float32)
    idx = rng.integers(0, 255, (8, 128)).astype(np.int32)

    def mk(trips):
        return jax.jit(pl.pallas_call(
            functools.partial(kern, trips=trips),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    out = probe(f"{label} (trips=1)", mk(1), tab, idx)
    if out is None:
        return
    f1, f2_ = mk(1000), mk(5000)
    for fn in (f1, f2_):
        jax.block_until_ready(fn(tab, idx))
    ts = []
    for fn in (f1, f2_, f1, f2_):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(tab, idx))
        ts.append(time.perf_counter() - t0)
    per = (min(ts[1], ts[3]) - min(ts[0], ts[2])) / 4000
    print(f"     per-trip: {per*1e9:.1f} ns")


def p3_run():
    rng = np.random.default_rng(1)
    tab = rng.uniform(0, 1, (8, 256)).astype(np.float32)
    idx = rng.integers(0, 255, (8, 128)).astype(np.int32)

    def mk(trips):
        return jax.jit(pl.pallas_call(
            functools.partial(gather_kernel, trips=trips),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))

    out = probe("P3 mod-128 two-subtable gather (trips=1)", mk(1), tab, idx)
    if out is None:
        return
    ref = np.take_along_axis(np.asarray(tab), np.clip(idx, 0, 255), axis=1)
    ok = np.allclose(np.asarray(out), ref)
    print(f"     values {'exact' if ok else 'WRONG'}")
    f1, f2_ = mk(200), mk(1000)
    for fn in (f1, f2_):
        jax.block_until_ready(fn(tab, idx))
    t0 = time.perf_counter()
    jax.block_until_ready(f1(tab, idx))
    t1 = time.perf_counter()
    jax.block_until_ready(f2_(tab, idx))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / 800
    print(f"     per 256-col gathered (8,128) value: {per*1e9:.1f} ns")


if __name__ == "__main__":
    print("devices:", jax.devices())
    p1()
    p2_run()
    p3_run()
    p3x_run(gather_kernel_b, "P3b and-mask dual gather+select")
    p3x_run(gather_kernel_c, "P3c and-mask single gather")
