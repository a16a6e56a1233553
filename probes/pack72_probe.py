#!/usr/bin/env python3
"""Packed-pool feasibility: the gather fast/slow break is on ROW COUNT
(<= 2^17 rows fast — probes/row_width_probe.py grid), so packing 9 groups
per 72-wide row divides rows by 9 and can pull big pools back into the
fast class. This probe prices the full in-loop trade at matched semantic
work (word-chained group-index updates): (w,8) gather + 8-way one-hot
select vs (w,72) gather + 72-way one-hot select, at deep-class sizes.
Chains are value-identical across variants (asserted)."""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

W = 1 << 18
ITERS = 16


def make(logN, packed):
    N = 1 << logN

    if packed:
        nrows = -(-N // 9)
        g9 = (jnp.arange(nrows, dtype=jnp.uint32)[:, None] * 9
              + jnp.arange(9, dtype=jnp.uint32)[None, :])      # group ids
        table = (jnp.repeat(g9, 8, axis=1) * jnp.uint32(7)
                 + jnp.tile(jnp.arange(8, dtype=jnp.uint32), 9)[None, :])
    else:
        table = (jnp.arange(N, dtype=jnp.uint32)[:, None] * jnp.uint32(7)
                 + jnp.arange(8, dtype=jnp.uint32)[None, :])

    def g(table, gi, ci):
        def body(i, carry):
            gi, ci, acc = carry
            if packed:
                r = table[gi // 9]
                idx = (gi % 9) * 8 + ci
                oh = (jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                      == idx[:, None])
            else:
                r = table[gi]
                oh = (jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                      == ci[:, None])
            word = jnp.sum(jnp.where(oh, r, jnp.uint32(0)), axis=1,
                           dtype=jnp.uint32)
            acc = acc + word
            gi = ((gi.astype(jnp.uint32) * jnp.uint32(2654435761) + word)
                  % jnp.uint32(N)).astype(jnp.int32)
            ci = (word % jnp.uint32(8)).astype(jnp.int32)
            return gi, ci, acc

        gi, ci, acc = jax.lax.fori_loop(
            0, ITERS, body, (gi, ci, jnp.zeros(W, jnp.uint32)))
        return acc.sum(dtype=jnp.uint64)

    return jax.jit(g), table


def main():
    rng = np.random.default_rng(0)
    for logN in (17, 18, 20):          # 4.2 / 8.4 / 33.6 MB pools
        gi0 = jnp.asarray(rng.integers(0, 1 << logN, W, dtype=np.int32))
        ci0 = jnp.asarray(rng.integers(0, 8, W, dtype=np.int32))
        accs = {}
        for packed in (False, True):
            f, table = make(logN, packed)
            accs[packed] = int(np.asarray(f(table, gi0, ci0)))
            t0 = time.time()
            for _ in range(4):
                np.asarray(f(table, gi0, ci0))
            ns = (time.time() - t0) / 4 / (W * ITERS) * 1e9
            print(f"N=2^{logN} ({(1 << logN) * 32 / 1e6:6.1f} MB) "
                  f"{'packed72' if packed else 'plain8  '}: "
                  f"{ns:6.2f} ns/group-fetch", flush=True)
        assert accs[False] == accs[True], accs
        print(f"  chains identical (acc={accs[False]})", flush=True)


if __name__ == "__main__":
    main()
