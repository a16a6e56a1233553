#!/usr/bin/env python3
"""Round-3 gather-lowering probes (VERDICT r2 next-step #2).

Measures, on the real TPU:
  P1  standalone (1,8)-row gather rate vs table size (the ~58 ns/row wall)
  P2  in-loop fused gather rate vs table size (fast for small pools)
  P3  in-loop gather from a *dynamic-sliced small window* of a big pool —
      if this runs at the small-pool rate, spatial paging (bucket rays by
      subtree, gather from a VMEM-sized slice) breaks the deep-scene wall
  P4  Mosaic kernel retries (the three round-2 shapes + a pipelined
      multi-outstanding per-row DMA kernel)

Writes incremental results to stdout (run with output redirected).
"""

import functools
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp


def sync(x):
    return np.asarray(x)


def timeit(fn, *args, reps=5):
    sync(fn(*args))  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        r = sync(fn(*args))
    return (time.time() - t0) / reps, r


def log(msg):
    print(msg, flush=True)


W = 1 << 18  # 256K output rows


def p1_standalone():
    log("== P1 standalone row gather ==")

    @jax.jit
    def g(table, idx):
        return table[idx].sum(dtype=jnp.uint32)

    for logG in (15, 17, 19, 20, 21, 22):
        G = 1 << logG
        table = jnp.arange(G * 8, dtype=jnp.uint32).reshape(G, 8)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, G, W, dtype=np.int32)
        )
        dt, _ = timeit(g, table, idx)
        log(f"G={G:>8} ({G*32/1e6:6.1f} MB): {dt*1e9/W:6.1f} ns/row")


def p2_inloop(n_iters=16):
    log("== P2 in-loop fused gather ==")

    @jax.jit
    def g(table, idx):
        G = table.shape[0]

        def body(i, carry):
            idx, acc = carry
            rows = table[idx]
            s = rows.sum(1, dtype=jnp.uint32)
            acc = acc + s
            idx = (idx * jnp.uint32(2654435761) + s) % jnp.uint32(G)
            return idx, acc

        idx, acc = jax.lax.fori_loop(
            0, n_iters, body, (idx, jnp.zeros(W, jnp.uint32))
        )
        return acc.sum(dtype=jnp.uint32)

    for logG in (15, 17, 19, 20, 21, 22):
        G = 1 << logG
        table = jnp.arange(G * 8, dtype=jnp.uint32).reshape(G, 8)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, G, W, dtype=np.uint32)
        )
        dt, _ = timeit(g, table, idx)
        log(
            f"G={G:>8} ({G*32/1e6:6.1f} MB): "
            f"{dt*1e9/(W*n_iters):6.2f} ns/row/iter ({dt*1e3:.1f} ms total)"
        )


def p3_sliced_window(n_iters=16):
    log("== P3 in-loop gather from dynamic-sliced window of big pool ==")
    Gbig = 1 << 22  # 128 MB pool

    for logS in (15, 16, 17):
        S = 1 << logS

        @jax.jit
        def g(pool, base, idx):
            win = jax.lax.dynamic_slice(pool, (base, 0), (S, 8))

            def body(i, carry):
                idx, acc = carry
                rows = win[idx]
                s = rows.sum(1, dtype=jnp.uint32)
                acc = acc + s
                idx = (idx * jnp.uint32(2654435761) + s) % jnp.uint32(S)
                return idx, acc

            idx, acc = jax.lax.fori_loop(
                0, n_iters, body, (idx, jnp.zeros(W, jnp.uint32))
            )
            return acc.sum(dtype=jnp.uint32)

        pool = jnp.arange(Gbig * 8, dtype=jnp.uint32).reshape(Gbig, 8)
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, S, W, dtype=np.uint32)
        )
        base = jnp.int32(1 << 20)
        dt, _ = timeit(g, pool, base, idx)
        log(
            f"window={S:>6} rows ({S*32/1e6:5.1f} MB) of 128MB pool: "
            f"{dt*1e9/(W*n_iters):6.2f} ns/row/iter ({dt*1e3:.1f} ms)"
        )
    del pool


def p3b_switch_window(n_iters=16):
    """Like P3 but the window is selected by a traced bucket id via a
    reshape — models per-octant paging where the slice base is data-
    dependent (post-compaction majority octant)."""
    log("== P3b in-loop gather, window chosen per outer step ==")
    Gbig = 1 << 22
    S = 1 << 16
    n_outer = 4

    @jax.jit
    def g(pool, bases, idx):
        def outer(o, carry):
            idx, acc = carry
            base = bases[o]
            win = jax.lax.dynamic_slice(pool, (base, 0), (S, 8))

            def body(i, carry):
                idx, acc = carry
                rows = win[idx]
                s = rows.sum(1, dtype=jnp.uint32)
                acc = acc + s
                idx = (idx * jnp.uint32(2654435761) + s) % jnp.uint32(S)
                return idx, acc

            return jax.lax.fori_loop(0, n_iters, body, (idx, acc))

        idx, acc = jax.lax.fori_loop(
            0, n_outer, outer, (idx, jnp.zeros(W, jnp.uint32))
        )
        return acc.sum(dtype=jnp.uint32)

    pool = jnp.arange(Gbig * 8, dtype=jnp.uint32).reshape(Gbig, 8)
    bases = jnp.asarray([0, 1 << 18, 1 << 20, 1 << 21], jnp.int32)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, S, W, dtype=np.uint32)
    )
    dt, _ = timeit(g, pool, bases, idx)
    log(
        f"4 outer windows x {n_iters} iters: "
        f"{dt*1e9/(W*n_iters*4):6.2f} ns/row/iter ({dt*1e3:.1f} ms)"
    )


def p4_mosaic():
    log("== P4 Mosaic kernels ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 1 << 20  # 32 MB table — the deep-scene class
    table = jnp.arange(G * 8, dtype=jnp.uint32).reshape(G, 8)
    idx_np = np.random.default_rng(0).integers(0, G, W, dtype=np.int32)
    idx = jnp.asarray(idx_np)
    want = np.asarray(table)[idx_np]

    # -- shape A: per-row DMA loop, K outstanding ------------------------
    CHUNK = 2048
    K = 8  # outstanding DMAs

    def dma_kernel(idx_ref, table_hbm, out_ref, sem):
        def start(r):
            j = idx_ref[r]
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(j, 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sem.at[r % K],
            ).start()

        def wait(r):
            j = idx_ref[r]
            pltpu.make_async_copy(
                table_hbm.at[pl.ds(j, 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sem.at[r % K],
            ).wait()

        for r0 in range(K):
            start(r0)

        def body(r, _):
            wait(r)
            @pl.when(r + K < CHUNK)
            def _():
                start(r + K)
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

    try:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(W // CHUNK,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (CHUNK, 8), lambda i, idx_ref: (i, 0),
                memory_space=pltpu.ANY,
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        )

        def krn(idx_ref, table_ref, out_ref, sem):
            base = pl.program_id(0) * CHUNK

            def start(r):
                j = idx_ref[base + r]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(j, 1), :],
                    out_ref.at[pl.ds(r, 1), :],
                    sem.at[r % K],
                ).start()

            def wait(r):
                j = idx_ref[base + r]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(j, 1), :],
                    out_ref.at[pl.ds(r, 1), :],
                    sem.at[r % K],
                ).wait()

            for r0 in range(K):
                start(r0)

            def body(r, _):
                wait(r)
                @pl.when(r + K < CHUNK)
                def _():
                    start(r + K)
                return 0

            jax.lax.fori_loop(0, CHUNK, body, 0)

        f = pl.pallas_call(
            krn,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((W, 8), jnp.uint32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )
        fj = jax.jit(lambda i, t: f(i, t))
        out = sync(fj(idx, table))
        ok = np.array_equal(out, want)
        dt, _ = timeit(lambda: fj(idx, table))
        log(f"A per-row DMA K={K}: OK={ok} {dt*1e9/W:6.1f} ns/row")
    except Exception as e:
        log(f"A per-row DMA FAILED: {type(e).__name__}: {str(e)[:300]}")

    # -- shape B: scalar-prefetch index_map, (1,8) blocks ----------------
    try:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(W,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8), lambda i, idx_ref: (idx_ref[i], 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 8), lambda i, idx_ref: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        )

        def krn_b(idx_ref, row_ref, out_ref):
            out_ref[:] = row_ref[:]

        f = pl.pallas_call(
            krn_b,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((W, 8), jnp.uint32),
        )
        fj = jax.jit(lambda i, t: f(i, t))
        out = sync(fj(idx, table))
        ok = np.array_equal(out, want)
        dt, _ = timeit(lambda: fj(idx, table))
        log(f"B blockspec-indexed: OK={ok} {dt*1e9/W:6.1f} ns/row")
    except Exception as e:
        log(f"B blockspec-indexed FAILED: {type(e).__name__}: {str(e)[:300]}")

    # -- shape C: VMEM-resident table + jnp.take (small table only) ------
    try:
        Gs = 1 << 15  # 1 MB
        ts = jnp.arange(Gs * 8, dtype=jnp.uint32).reshape(Gs, 8)
        idxs_np = np.random.default_rng(0).integers(0, Gs, W, dtype=np.int32)
        idxs = jnp.asarray(idxs_np)
        wants = np.asarray(ts)[idxs_np]
        BLK = 4096

        def krn_c(idx_ref, table_ref, out_ref):
            out_ref[:] = table_ref[idx_ref[:, 0]]

        f = pl.pallas_call(
            krn_c,
            grid=(W // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Gs, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, 8), jnp.uint32),
        )
        fj = jax.jit(lambda i, t: f(i, t))
        out = sync(fj(idxs.reshape(-1, 1), ts))
        ok = np.array_equal(out, wants)
        dt, _ = timeit(lambda: fj(idxs.reshape(-1, 1), ts))
        log(f"C vmem take 1MB table: OK={ok} {dt*1e9/W:6.1f} ns/row")
    except Exception as e:
        log(f"C vmem take FAILED: {type(e).__name__}: {str(e)[:300]}")


def p5_mosaic_round3():
    """Round-3 retries: the ANY-space rejection in shape A was about the
    OUTPUT block spec (ANY outputs need whole-array blocks + trivial
    index_map), not the per-row DMA from the HBM table. Shape D keeps the
    table in ANY/HBM (whole-array ref, legal) and makes the output a
    pipelined VMEM block; the kernel issues K outstanding per-row
    HBM->VMEM DMAs. Shape E exploits the 'equal to the array dims' escape
    hatch of the divisibility rule: table reshaped (G,1,8) with (1,1,8)
    blocks, one pipeline-managed row DMA per grid step."""
    log("== P5 Mosaic kernels (round-3 shapes) ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 1 << 20  # 32 MB table — the deep-scene class
    table = jnp.arange(G * 8, dtype=jnp.uint32).reshape(G, 8)
    idx_np = np.random.default_rng(0).integers(0, G, W, dtype=np.int32)
    idx = jnp.asarray(idx_np)
    want = np.asarray(table)[idx_np]

    # -- shape D: VMEM output block, K outstanding per-row DMAs ----------
    for CHUNK, K in ((2048, 8), (2048, 16), (8192, 16)):
        try:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(W // CHUNK,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (CHUNK, 8), lambda i, idx_ref: (i, 0),
                ),
                scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
            )

            def krn(idx_ref, table_ref, out_ref, sem, CHUNK=CHUNK, K=K):
                base = pl.program_id(0) * CHUNK

                def cp(r):
                    j = idx_ref[base + r]
                    return pltpu.make_async_copy(
                        table_ref.at[pl.ds(j, 1), :],
                        out_ref.at[pl.ds(r, 1), :],
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

            f = pl.pallas_call(
                krn,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((W, 8), jnp.uint32),
            )
            fj = jax.jit(lambda i, t: f(i, t))
            out = sync(fj(idx, table))
            ok = np.array_equal(out, want)
            dt, _ = timeit(lambda: fj(idx, table))
            log(f"D vmem-out DMA CHUNK={CHUNK} K={K}: OK={ok} "
                f"{dt*1e9/W:6.1f} ns/row")
        except Exception as e:
            log(f"D vmem-out DMA CHUNK={CHUNK} K={K} FAILED: "
                f"{type(e).__name__}: {str(e)[:300]}")

    # -- shape E: (G,1,8) table, (1,1,8) blocks (equal-dims rule) --------
    try:
        t3 = table.reshape(G, 1, 8)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(W,),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 8), lambda i, idx_ref: (idx_ref[i], 0, 0),
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 8), lambda i, idx_ref: (i, 0, 0),
            ),
        )

        def krn_e(idx_ref, row_ref, out_ref):
            out_ref[:] = row_ref[:]

        f = pl.pallas_call(
            krn_e,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((W, 1, 8), jnp.uint32),
        )
        fj = jax.jit(lambda i, t: f(i, t).reshape(W, 8))
        out = sync(fj(idx, t3))
        ok = np.array_equal(out, want)
        dt, _ = timeit(lambda: fj(idx, t3))
        log(f"E equal-dims pipeline: OK={ok} {dt*1e9/W:6.1f} ns/row")
    except Exception as e:
        log(f"E equal-dims pipeline FAILED: {type(e).__name__}: "
            f"{str(e)[:300]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    t0 = time.time()
    log(f"devices: {jax.devices()}")
    if which in ("all", "p1"):
        p1_standalone()
    if which in ("all", "p2"):
        p2_inloop()
    if which in ("all", "p3"):
        p3_sliced_window()
        p3b_switch_window()
    if which in ("all", "p4"):
        p4_mosaic()
    if which in ("all", "p5"):
        p5_mosaic_round3()
    log(f"total {time.time()-t0:.1f}s")
