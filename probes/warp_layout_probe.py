#!/usr/bin/env python3
"""Deep-frame profile shows the warp-table gathers emit {1,0}-layout rows
that XLA copies to {0,1} (~21 ms/frame of pure layout copies: copy.14784
etc.). The warp table itself sits in {1,0} while the pool is {0,1}. Does
jax.experimental.layout.with_layout_constraint on the table (or a
different table shape) change the gather output layout and kill the
copies? Measures an n/2-wide in-loop dual gather (pool row + warp row)
mimicking the warp_in_body iteration."""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp
from jax.experimental import layout as jl

W = 1036800
G = 988377          # deep10 pool groups
WT = 32768          # warp table rows (64^3 / 8)
ITERS = 16


def make_args(seed=0):
    rng = np.random.default_rng(seed)
    pool = jnp.asarray(rng.integers(0, 2**32, (G, 8), dtype=np.uint32))
    warp = jnp.asarray(rng.integers(0, 2**32, (WT, 8), dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, G, W, dtype=np.int32))
    widx = jnp.asarray(rng.integers(0, WT, W, dtype=np.int32))
    return pool, warp, idx, widx


def body_fn(pool, warp, idx, widx, acc):
    rows = pool[idx]
    wrows = warp[widx]
    s = rows.sum(1, dtype=jnp.uint32) + wrows.sum(1, dtype=jnp.uint32)
    acc = acc + s
    idx = (idx + s.astype(jnp.int32)) % G
    widx = (widx + 7) % WT
    return idx, widx, acc


def run(name, f, args):
    jf = jax.jit(f)
    txt = jf.lower(*args).compile().as_text()
    ncopy = len(re.findall(r"= u32\[\d+,8\][^\n]*copy\(", txt))
    out = np.asarray(jf(*args))
    t0 = time.time()
    for _ in range(5):
        np.asarray(jf(*args))
    dt = (time.time() - t0) / 5
    print(f"{name}: {dt*1e3:7.1f} ms ({dt*1e9/(W*ITERS):5.2f} ns/row/iter), "
          f"row copies in HLO: {ncopy}", flush=True)
    return out


def loop_plain(pool, warp, idx, widx):
    def b(i, c):
        return body_fn(pool, warp, *c)
    _, _, acc = jax.lax.fori_loop(
        0, ITERS, b, (idx, widx, jnp.zeros(W, jnp.uint32)))
    return acc.sum(dtype=jnp.uint32)


def loop_constrained(pool, warp, idx, widx):
    warp = jl.with_layout_constraint(
        warp, jl.Layout(major_to_minor=(0, 1)))
    def b(i, c):
        return body_fn(pool, warp, *c)
    _, _, acc = jax.lax.fori_loop(
        0, ITERS, b, (idx, widx, jnp.zeros(W, jnp.uint32)))
    return acc.sum(dtype=jnp.uint32)


def loop_concat(pool, warp, idx, widx):
    # Append warp rows to the pool; one table, one layout.
    big = jnp.concatenate([pool, warp], axis=0)
    def b(i, c):
        i1, wi, acc = c
        return body_fn(big, big, i1, wi + G, acc)[0:2] + (
            body_fn(big, big, i1, wi + G, acc)[2],)
    def b2(i, c):
        i1, wi, acc = c
        rows = big[i1]
        wrows = big[wi + G]
        s = rows.sum(1, dtype=jnp.uint32) + wrows.sum(1, dtype=jnp.uint32)
        return (i1 + s.astype(jnp.int32)) % G, (wi + 7) % WT, acc + s
    _, _, acc = jax.lax.fori_loop(
        0, ITERS, b2, (idx, widx, jnp.zeros(W, jnp.uint32)))
    return acc.sum(dtype=jnp.uint32)


args = make_args()
a = run("plain dual-table", loop_plain, args)
b = run("warp layout {0,1}", loop_constrained, args)
c = run("concat one-table", loop_concat, args)
print("equal:", int(a) == int(b) == int(c))
