#!/usr/bin/env python3
"""In-loop gather rate vs ROW WIDTH (fat-node feasibility): if a (W,72)-row
gather costs ~the same per row as the (W,8) group row, a fat table
(own row + the 8 children's group rows per group) could resolve TWO levels
per gather and compress deep-scene descents. Tables sized to the deep bench
class (32 MB base -> 288 MB fat) and the issue-bound regime."""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

W = 1 << 18
ITERS = 16


def bench(logG, width):
    G = 1 << logG

    def g(table, idx):
        def body(i, carry):
            idx, acc = carry
            rows = table[idx]
            s = rows.sum(1, dtype=jnp.uint32)
            acc = acc + s
            idx = (idx * jnp.uint32(2654435761) + s) % jnp.uint32(G)
            return idx, acc

        idx, acc = jax.lax.fori_loop(
            0, ITERS, body, (idx, jnp.zeros(W, jnp.uint32))
        )
        return acc.sum(dtype=jnp.uint32)

    f = jax.jit(g)
    table = (jnp.arange(G, dtype=jnp.uint32)[:, None]
             + jnp.arange(width, dtype=jnp.uint32)[None, :])
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, G, W, dtype=np.int32))
    np.asarray(f(table, idx))
    t0 = time.time()
    for _ in range(4):
        np.asarray(f(table, idx))
    ns = (time.time() - t0) / 4 / (W * ITERS) * 1e9
    print(f"G=2^{logG} width={width:3d} ({G*width*4/1e6:7.1f} MB): "
          f"{ns:6.2f} ns/row ({ns/width*8:6.2f} per 8-wide-equiv)",
          flush=True)


def main():
    for logG, width in (
        (15, 8), (15, 16), (15, 32), (15, 72),      # small base
        (20, 8), (20, 16), (20, 32), (20, 72),      # 32 MB base class
        (22, 8), (22, 72),                          # 128 MB / 1.2 GB
    ):
        try:
            bench(logG, width)
        except Exception as e:
            print(f"G=2^{logG} width={width}: FAIL {type(e).__name__} "
                  f"{str(e)[:100]}", flush=True)


def grid():
    """Disentangle the fast/slow gather break: ROW COUNT vs BYTES.
    (2^15,72)=9.4MB measured fast while (2^20,8)=34MB is slow -- if the
    break tracks rows, packing gray-zone pools into fewer wider rows
    recovers the fast class."""
    for logG in (15, 16, 17, 18, 19, 20):
        for width in (8, 72):
            try:
                bench(logG, width)
            except Exception as e:
                print(f"G=2^{logG} width={width}: FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    if __import__("sys").argv[-1] == "grid":
        grid()
    else:
        main()
