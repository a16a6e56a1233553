#!/usr/bin/env python3
"""Warp-lookup packing probe: the deep-frame profile bills ~47 ms of warp
table gathers + ~21 ms of {1,0}->{0,1} layout copies to the per-iteration
(w,8)-row warp fetch (PERF.md). Under the row-count model the (2^15, 8)
table is fast, but its gather output layout forces copies. A/B the lookup
in-loop at stage width: plain (rows,8)+mux vs packed (rows/9,72)+one-hot,
each mixed with a big-pool row gather like the real body."""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

W = 1 << 19   # ~stage width n/4 at 1080p
ITERS = 16
LEVELS = 6


def bench(packed):
    side = 1 << LEVELS
    ncells = side ** 3                  # 2^18 cells
    table = (jnp.arange(ncells, dtype=jnp.uint32) * jnp.uint32(2654435761)
             ) >> jnp.uint32(3)
    G = 1 << 20                          # 33.6 MB pool, packed as the body
    pool = (jnp.arange(G, dtype=jnp.uint32)[:, None] * jnp.uint32(7)
            + jnp.arange(8, dtype=jnp.uint32)[None, :])
    pad_g = (-G) % 9
    pool72 = jnp.concatenate(
        [pool, jnp.zeros((pad_g, 8), jnp.uint32)], axis=0).reshape(-1, 72)

    if packed:
        padc = (-(ncells // 8)) % 9
        t72 = jnp.concatenate(
            [table.reshape(-1, 8),
             jnp.zeros((padc, 8), jnp.uint32)], axis=0).reshape(-1, 72)
    else:
        t2d = table.reshape(-1, 8)

    def g(flat, gi, ci):
        def body(i, carry):
            flat, gi, ci, acc = carry
            # pool fetch (the body's main gather, pack9 style)
            r = pool72[gi // 9]
            idx = (gi % 9) * 8 + ci
            oh = (jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                  == idx[:, None])
            word = jnp.sum(jnp.where(oh, r, jnp.uint32(0)), axis=1,
                           dtype=jnp.uint32)
            # warp lookup
            if packed:
                wr = t72[flat // 72]
                woh = (jax.lax.broadcasted_iota(jnp.int32, wr.shape, 1)
                       == (flat % 72)[:, None])
                wv = jnp.sum(jnp.where(woh, wr, jnp.uint32(0)), axis=1,
                             dtype=jnp.uint32)
            else:
                rows = t2d[flat // 8]
                b2 = (flat & 4) != 0
                r4 = jnp.where(b2[:, None], rows[:, 4:8], rows[:, 0:4])
                b1 = (flat & 2) != 0
                r2 = jnp.where(b1[:, None], r4[:, 2:4], r4[:, 0:2])
                wv = jnp.where((flat & 1) != 0, r2[:, 1], r2[:, 0])
            acc = acc + word + wv
            gi = ((gi.astype(jnp.uint32) * jnp.uint32(2654435761) + word)
                  % jnp.uint32(G)).astype(jnp.int32)
            ci = (word % jnp.uint32(8)).astype(jnp.int32)
            flat = ((flat.astype(jnp.uint32) + wv)
                    % jnp.uint32(ncells)).astype(jnp.int32)
            return flat, gi, ci, acc

        flat, gi, ci, acc = jax.lax.fori_loop(
            0, ITERS, body, (flat, gi, ci, jnp.zeros(W, jnp.uint32)))
        return acc.sum(dtype=jnp.uint32)

    rng = np.random.default_rng(0)
    flat0 = jnp.asarray(rng.integers(0, ncells, W, dtype=np.int32))
    gi0 = jnp.asarray(rng.integers(0, G, W, dtype=np.int32))
    ci0 = jnp.asarray(rng.integers(0, 8, W, dtype=np.int32))
    f = jax.jit(g)
    acc = int(np.asarray(f(flat0, gi0, ci0)))
    t0 = time.time()
    for _ in range(4):
        np.asarray(f(flat0, gi0, ci0))
    ns = (time.time() - t0) / 4 / (W * ITERS) * 1e9
    print(f"{'packed72' if packed else 'plain8+mux'}: {ns:6.2f} "
          f"ns/(pool+warp fetch)  acc={acc}", flush=True)
    return acc


def main():
    a = bench(False)
    b = bench(True)
    assert a == b, (a, b)
    print("chains identical", flush=True)


if __name__ == "__main__":
    main()
