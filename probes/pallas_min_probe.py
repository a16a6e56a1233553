#!/usr/bin/env python3
"""Bisect the remote-compile HTTP 500 on Mosaic kernels: start from a
trivial kernel and add one feature at a time (grid, index_map pipeline,
scalar prefetch, DMA, dynamic index_map) to find exactly which construct
kills tpu_compile_helper."""

import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, flush=True)


def sync(x):
    return np.asarray(x)


def step(name, fn):
    try:
        t0 = time.time()
        r = fn()
        log(f"{name}: OK ({time.time()-t0:.1f}s) {r}")
    except Exception as e:
        log(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


# T1: trivial elementwise kernel, no grid
def t1():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    x = jnp.zeros((8, 128), jnp.float32)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    return float(sync(jax.jit(f)(x)).sum())


# T2: u32 elementwise
def t2():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.uint32(1)

    x = jnp.zeros((8, 128), jnp.uint32)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32))
    return int(sync(jax.jit(f)(x)).sum())


# T3: gridded pipeline with index_map
def t3():
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.uint32(1)

    x = jnp.zeros((1024, 128), jnp.uint32)
    f = pl.pallas_call(
        k,
        grid=(8,),
        in_specs=[pl.BlockSpec((128, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((128, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.uint32),
    )
    return int(sync(jax.jit(f)(x)).sum())


# T4: scalar prefetch present (unused in index_map)
def t4():
    def k(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + s_ref[0].astype(jnp.uint32)

    x = jnp.zeros((1024, 128), jnp.uint32)
    s = jnp.arange(8, dtype=jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(8,),
        in_specs=[pl.BlockSpec((128, 128), lambda i, s_ref: (i, 0))],
        out_specs=pl.BlockSpec((128, 128), lambda i, s_ref: (i, 0)),
    )
    f = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.uint32),
    )
    return int(sync(jax.jit(lambda s, x: f(s, x))(s, x)).sum())


# T5: scalar-prefetch-driven input index_map (the gather essence),
# block (128,128) — all dims tile-aligned
def t5():
    def k(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:]

    x = jnp.arange(1024 * 128, dtype=jnp.uint32).reshape(1024, 128)
    s = jnp.asarray([3, 1, 7, 0, 2, 2, 5, 4], jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(8,),
        in_specs=[pl.BlockSpec((128, 128), lambda i, s_ref: (s_ref[i], 0))],
        out_specs=pl.BlockSpec((128, 128), lambda i, s_ref: (i, 0)),
    )
    f = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((1024, 128), jnp.uint32),
    )
    out = sync(jax.jit(lambda s, x: f(s, x))(s, x))
    want = np.asarray(x).reshape(8, 128, 128)[np.asarray(s)].reshape(1024, 128)
    return bool(np.array_equal(out, want))


# T6: whole-array ANY input, copy via DMA with static index
def t6():
    def k(x_hbm, o_ref, sem):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, 128), :], o_ref, sem
        ).start()
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, 128), :], o_ref, sem
        ).wait()

    x = jnp.arange(1024 * 128, dtype=jnp.uint32).reshape(1024, 128)
    f = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = sync(jax.jit(f)(x))
    return bool(np.array_equal(out, np.asarray(x)[:128]))


# T7: same but dynamic index from scalar prefetch
def t7():
    def k(s_ref, x_hbm, o_ref, sem):
        j = s_ref[0]
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(j, 128), :], o_ref, sem
        ).start()
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(j, 128), :], o_ref, sem
        ).wait()

    x = jnp.arange(1024 * 128, dtype=jnp.uint32).reshape(1024, 128)
    s = jnp.asarray([256], jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.uint32),
    )
    out = sync(jax.jit(lambda s, x: f(s, x))(s, x))
    return bool(np.array_equal(out, np.asarray(x)[256:384]))


# T8: dynamic single-ROW DMA (the gather's actual unit): (1,8) row
def t8():
    def k(s_ref, x_hbm, o_ref, sem):
        j = s_ref[0]
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(j, 1), :], o_ref.at[pl.ds(0, 1), :], sem
        ).start()
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(j, 1), :], o_ref.at[pl.ds(0, 1), :], sem
        ).wait()

    x = jnp.arange(1024 * 8, dtype=jnp.uint32).reshape(1024, 8)
    s = jnp.asarray([77], jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.uint32),
    )
    out = sync(jax.jit(lambda s, x: f(s, x))(s, x))
    return bool(np.array_equal(out[0], np.asarray(x)[77]))


# T9: fori_loop of dynamic row DMAs (serial, 1 sem)
def t9():
    R = 64

    def k(s_ref, x_hbm, o_ref, sem):
        def body(r, _):
            j = s_ref[r]
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(j, 1), :], o_ref.at[pl.ds(r, 1), :], sem
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, R, body, 0)

    x = jnp.arange(1024 * 8, dtype=jnp.uint32).reshape(1024, 8)
    s_np = np.random.default_rng(0).integers(0, 1024, R, dtype=np.int32)
    s = jnp.asarray(s_np)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((R, 8), jnp.uint32),
    )
    out = sync(jax.jit(lambda s, x: f(s, x))(s, x))
    return bool(np.array_equal(out, np.asarray(x)[s_np]))


# t8/t9 showed the compiler crash is sub-tile DMA: (1,8) units die. The
# workaround layout views the (N,8) pool as (N//16, 128) — 16 groups per
# full-lane row — so the gather unit becomes a (1,128) slice. t10 checks a
# single dynamic (1,128) DMA compiles; t10b checks (8,128) from an
# unaligned row; t11 measures the K-outstanding pipelined gather rate.


def t10():
    def k(s_ref, x_hbm, o_ref, sem):
        j = s_ref[0]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(j, 1), :], o_ref.at[pl.ds(0, 1), :], sem
        )
        cp.start()
        cp.wait()

    x = jnp.arange(1024 * 128, dtype=jnp.uint32).reshape(1024, 128)
    s = jnp.asarray([77], jnp.int32)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    )
    out = sync(jax.jit(lambda s, x: f(s, x))(s, x))
    return bool(np.array_equal(out[0], np.asarray(x)[77]))


def t10b():
    def k(s_ref, x_hbm, o_ref, sem):
        j = s_ref[0]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(j, 8), :], o_ref, sem
        )
        cp.start()
        cp.wait()

    x = jnp.arange(1024 * 128, dtype=jnp.uint32).reshape(1024, 128)
    s = jnp.asarray([77], jnp.int32)  # deliberately not 8-aligned
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        k, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32),
    )
    out = sync(jax.jit(lambda s, x: f(s, x))(s, x))
    return bool(np.array_equal(out, np.asarray(x)[77:85]))


def t11(W=1 << 18, CHUNK=2048, K=8, G=1 << 18, reps=5):
    """Full-rate probe: gather W random (1,128) rows from a G-row table
    (G=256K rows = 128 MB) with K outstanding DMAs, idx in SMEM blocks."""
    import functools

    def k(idx_ref, x_hbm, o_ref, sem):
        def cp(r):
            j = idx_ref[r]
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j, 1), :], o_ref.at[pl.ds(r, 1), :],
                sem.at[r % K],
            )

        def body(r, _):
            @pl.when(r < CHUNK)
            def _():
                cp(r).start()

            @pl.when(r >= K)
            def _():
                cp(r - K).wait()

            return 0

        jax.lax.fori_loop(0, CHUNK + K, body, 0)

    x = jnp.arange(G, dtype=jnp.uint32)[:, None] * jnp.ones(
        (1, 128), jnp.uint32
    )
    idx_np = np.random.default_rng(0).integers(0, G, W, dtype=np.int32)
    idx = jnp.asarray(idx_np)
    f = pl.pallas_call(
        k,
        grid=(W // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((W, 128), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
    )
    fj = jax.jit(lambda i, t: f(i, t)[:, 0].sum(dtype=jnp.uint32))
    want = np.uint32(idx_np.astype(np.uint64).sum() & 0xFFFFFFFF)
    got = sync(fj(idx, x))
    t0 = time.time()
    for _ in range(reps):
        sync(fj(idx, x))
    dt = (time.time() - t0) / reps
    return (f"OK={got == want} {dt*1e9/W:6.2f} ns/row "
            f"({dt*1e3:.2f} ms for {W} rows)")


def t11s():
    return t11(CHUNK=8192, K=16)


def t12(W=1 << 18, CHUNK=256, K=8, G=1 << 18, reps=5):
    """t11 with the chunk loop FULLY UNROLLED (straight-line starts/waits;
    Mosaic only supports unroll=1 or full) — measures whether the 137
    ns/row of t11 is scalar LOOP overhead or DMA issue cost."""

    def k(idx_ref, x_hbm, o_ref, sem):
        def cp(r):
            j = idx_ref[r]
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j, 1), :], o_ref.at[pl.ds(r, 1), :],
                sem.at[r % K],
            )

        for r in range(CHUNK + K):
            if r < CHUNK:
                cp(r).start()
            if r >= K:
                cp(r - K).wait()

    x = jnp.arange(G, dtype=jnp.uint32)[:, None] * jnp.ones(
        (1, 128), jnp.uint32
    )
    idx_np = np.random.default_rng(0).integers(0, G, W, dtype=np.int32)
    idx = jnp.asarray(idx_np)
    f = pl.pallas_call(
        k,
        grid=(W // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((W, 128), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
    )
    fj = jax.jit(lambda i, t: f(i, t)[:, 0].sum(dtype=jnp.uint32))
    want = np.uint32(idx_np.astype(np.uint64).sum() & 0xFFFFFFFF)
    got = sync(fj(idx, x))
    t0 = time.time()
    for _ in range(reps):
        sync(fj(idx, x))
    dt = (time.time() - t0) / reps
    return (f"OK={got == want} {dt*1e9/W:6.2f} ns/row "
            f"({dt*1e3:.2f} ms for {W} rows)")


def t11g():
    return t11(G=1 << 15, CHUNK=8192, K=16)  # 16 MB table




# --- round-4 additions (2026-08-20): VERDICT r3 #2 — multi-outstanding sweep


def t13():
    """K-sweep at fixed CHUNK: if 137 ns/row were single-copy LATENCY, time
    per row would fall ~1/K as outstanding copies rise; if the scalar core's
    issue chain (SMEM load + 2 address computes + start + wait) is the wall,
    the curve is flat in K."""
    rows = []
    for k in (1, 2, 4, 8, 16, 32):
        rows.append(f"K={k:>2}: {t11(W=1 << 17, CHUNK=2048, K=k, reps=3)}")
    return "\n  ".join(rows)


def t14(W=1 << 17, CHUNK=2048, K=16, G=1 << 18, U=4, reps=3):
    """Manual U-row unroll inside the issue loop: amortizes the fori_loop
    trip overhead over U starts (t12's unroll=all crashes the remote
    compiler; a hand-written 4x body is the legal middle ground)."""
    def k_fn(idx_ref, x_hbm, o_ref, sem):
        def cp(r):
            j = idx_ref[r]
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(j, 1), :], o_ref.at[pl.ds(r, 1), :],
                sem.at[r % K],
            )

        def body(b, _):
            for u in range(U):
                r = b * U + u

                @pl.when(r < CHUNK)
                def _():
                    cp(r).start()

                @pl.when((r >= K) & (r < CHUNK + K))
                def _():
                    cp(r - K).wait()

            return 0

        jax.lax.fori_loop(0, (CHUNK + K + U - 1) // U, body, 0)

    x = jnp.arange(G, dtype=jnp.uint32)[:, None] * jnp.ones(
        (1, 128), jnp.uint32
    )
    idx_np = np.random.default_rng(0).integers(0, G, W, dtype=np.int32)
    idx = jnp.asarray(idx_np)
    f = pl.pallas_call(
        k_fn,
        grid=(W // CHUNK,),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((W, 128), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
    )
    fj = jax.jit(lambda i, t: f(i, t)[:, 0].sum(dtype=jnp.uint32))
    want = np.uint32(idx_np.astype(np.uint64).sum() & 0xFFFFFFFF)
    got = sync(fj(idx, x))
    t0 = time.time()
    for _ in range(reps):
        sync(fj(idx, x))
    dt = (time.time() - t0) / reps
    return (f"OK={got == want} {dt*1e9/W:6.2f} ns/row "
            f"(U={U}, {dt*1e3:.2f} ms for {W} rows)")


def t14b():
    return t14(U=8)


if __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    only = sys.argv[1:] or None
    for name, fn in list(globals().items()):
        if name.startswith("t") and name[1:2].isdigit() and callable(fn):
            if only and name not in only:
                continue
            step(name, fn)
