#!/usr/bin/env python3
"""Pack-width sweep: groups-per-row K in {1 (plain), 9, 17, 36} at mega-pool
sizes -- wider packs divide table rows further (3.1M-group island pool needs
K>=27 to reach the fast <2^17-row class) but pay a wider one-hot select.
Same chained-fetch semantic work as probes/pack72_probe.py."""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

W = 1 << 18
ITERS = 16


def make(logN, K):
    N = 1 << logN

    if K == 1:
        table = (jnp.arange(N, dtype=jnp.uint32)[:, None] * jnp.uint32(7)
                 + jnp.arange(8, dtype=jnp.uint32)[None, :])
    else:
        nrows = -(-N // K)
        gk = (jnp.arange(nrows, dtype=jnp.uint32)[:, None] * K
              + jnp.arange(K, dtype=jnp.uint32)[None, :])
        table = (jnp.repeat(gk, 8, axis=1) * jnp.uint32(7)
                 + jnp.tile(jnp.arange(8, dtype=jnp.uint32), K)[None, :])

    def g(table, gi, ci):
        def body(i, carry):
            gi, ci, acc = carry
            if K == 1:
                r = table[gi]
                idx = ci
            else:
                r = table[gi // K]
                idx = (gi % K) * 8 + ci
            oh = (jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
                  == idx[:, None])
            word = jnp.sum(jnp.where(oh, r, jnp.uint32(0)), axis=1,
                           dtype=jnp.uint32)
            acc = acc + word
            gi = ((gi.astype(jnp.uint32) * jnp.uint32(2654435761) + word)
                  % jnp.uint32(N)).astype(jnp.int32)
            ci = (word % jnp.uint32(8)).astype(jnp.int32)
            return gi, ci, acc

        gi, ci, acc = jax.lax.fori_loop(
            0, ITERS, body, (gi, ci, jnp.zeros(W, jnp.uint32)))
        return acc.sum(dtype=jnp.uint32)

    return jax.jit(g), table


def main():
    rng = np.random.default_rng(0)
    for logN in (20, 22):              # 33.6 MB / 134 MB pools
        gi0 = jnp.asarray(rng.integers(0, 1 << logN, W, dtype=np.int32))
        ci0 = jnp.asarray(rng.integers(0, 8, W, dtype=np.int32))
        accs = {}
        for K in (1, 9, 17, 36):
            f, table = make(logN, K)
            try:
                accs[K] = int(np.asarray(f(table, gi0, ci0)))
                t0 = time.time()
                for _ in range(4):
                    np.asarray(f(table, gi0, ci0))
                ns = (time.time() - t0) / 4 / (W * ITERS) * 1e9
                rows = (1 << logN) if K == 1 else -(-(1 << logN) // K)
                print(f"N=2^{logN} K={K:3d} (rows 2^{np.log2(rows):5.2f}): "
                      f"{ns:6.2f} ns/group-fetch", flush=True)
            except Exception as e:
                print(f"N=2^{logN} K={K}: FAIL {type(e).__name__} "
                      f"{str(e)[:80]}", flush=True)
        vals = set(accs.values())
        print(f"  chains identical: {len(vals) == 1}", flush=True)


if __name__ == "__main__":
    main()
