#!/usr/bin/env python3
"""Is the fit-advancement cond's 1-D live-count reduce the ~0.35 ms/trip
op the profile suggests, and does a minor-axis 2-D reshape fix it?

Shapes: bool[518400] (the n/4 stage mask) summed inside a while loop that
mimics acond: trip = tiny body + full mask reduce in the cond.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp


def sync(x):
    return np.asarray(x)


W = 518400
TRIPS = 100


def run(name, count_fn):
    mask = jnp.ones(W, jnp.bool_)

    @jax.jit
    def loop(mask):
        def body(s):
            m, it = s
            # minimal body: flip nothing, touch the mask cheaply
            return m, it + 1

        def cond(s):
            m, it = s
            return (count_fn(m) > 0) & (it < TRIPS)

        return jax.lax.while_loop(cond, body, (mask, jnp.int32(0)))[1]

    sync(loop(mask))
    t0 = time.time()
    for _ in range(5):
        sync(loop(mask))
    dt = (time.time() - t0) / 5
    print(f"{name}: {dt*1e3/TRIPS:7.3f} ms/trip ({dt*1e3:.1f} ms total)",
          flush=True)


run("1-D sum(int32 cast)", lambda m: jnp.sum(m.astype(jnp.int32)))
run("2-D (4050,128) minor", lambda m: jnp.sum(
    m.reshape(4050, 128).astype(jnp.int32)))
run("2-D (648,800) minor", lambda m: jnp.sum(
    m.reshape(648, 800).astype(jnp.int32)))
run("2-D rowsum-then-sum", lambda m: jnp.sum(
    m.reshape(4050, 128).astype(jnp.int32).sum(1)))
run("any()", lambda m: jnp.any(m).astype(jnp.int32) * W)


def run_scalar(name, body_extra):
    """Cond reads a carried scalar; body optionally recomputes it."""
    mask = jnp.ones(W, jnp.bool_)

    @jax.jit
    def loop(mask):
        def body(s):
            m, it, cnt = s
            cnt = body_extra(m, cnt)
            return m, it + 1, cnt

        def cond(s):
            return (s[2] > 0) & (s[1] < TRIPS)

        return jax.lax.while_loop(
            cond, body, (mask, jnp.int32(0), jnp.int32(W)))[1]

    sync(loop(mask))
    t0 = time.time()
    for _ in range(5):
        sync(loop(mask))
    dt = (time.time() - t0) / 5
    print(f"{name}: {dt*1e3/TRIPS:7.3f} ms/trip ({dt*1e3:.1f} ms total)",
          flush=True)


run_scalar("scalar cond, no body count", lambda m, c: c)
run_scalar("scalar cond, body 1-D sum", lambda m, c: jnp.sum(
    m.astype(jnp.int32)))
