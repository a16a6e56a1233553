#!/usr/bin/env python3
"""Stage-transition gather packing: compaction/compose gathers pull (w,8)
rows from (n>=2M, 8) STATE/RESULT mats -- the same >2^17-row slow class as
big pools (row_width_probe grid). The mat reshaped (n/9, 72) is the same
buffer; the output row then needs a 9-way slice select. Measures chained
one-shot gathers (transition-like, not in-loop) at w=n/4 from an n=2M mat,
plain vs packed, f32 state-mat dtype."""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

N = (1 << 21) + 27  # ~2M rows, not a multiple of 9
W = N // 4
CHAIN = 8


def bench(packed):
    mat = (jnp.arange(N, dtype=jnp.float32)[:, None]
           + jnp.arange(8, dtype=jnp.float32)[None, :] * 0.125)
    if packed:
        pad = (-N) % 9
        mat72 = jnp.concatenate(
            [mat, jnp.zeros((pad, 8), jnp.float32)], axis=0).reshape(-1, 72)

    def g(idx):
        def body(i, carry):
            idx, acc = carry
            if packed:
                r72 = mat72[idx // 9]
                oh = (jax.lax.broadcasted_iota(
                    jnp.int32, (W, 9), 1) == (idx % 9)[:, None])
                rows = jnp.sum(
                    jnp.where(oh[:, :, None], r72.reshape(W, 9, 8), 0.0),
                    axis=1)
            else:
                rows = mat[idx]
            s = rows.sum(1)
            acc = acc + s
            idx = ((idx.astype(jnp.uint32) * jnp.uint32(2654435761)
                    + s.astype(jnp.uint32)) % jnp.uint32(N)).astype(jnp.int32)
            return idx, acc

        idx, acc = jax.lax.fori_loop(0, CHAIN, body,
                                     (idx, jnp.zeros(W, jnp.float32)))
        return acc.sum()

    f = jax.jit(g)
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, N, W, dtype=np.int32))
    acc = float(np.asarray(f(idx0)))
    t0 = time.time()
    for _ in range(4):
        np.asarray(f(idx0))
    ns = (time.time() - t0) / 4 / (W * CHAIN) * 1e9
    print(f"{'packed72' if packed else 'plain8  '}: {ns:6.2f} ns/row "
          f"(acc={acc:.1f})", flush=True)
    return acc


def main():
    a = bench(False)
    b = bench(True)
    assert abs(a - b) < 1e6 * 1, (a, b)
    print("sums match", flush=True)


if __name__ == "__main__":
    main()
