#!/usr/bin/env python3
"""Deep10 schedule sweep: fused-sibling tail effect + narrower wide-branch
tails (the tail while-loop was 267 ms of the 661 ms frame, profiled)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays
from deep_paging_probe import deep_tree

W, H = 1920, 1080
FRAMES = 3


def log(m):
    print(m, flush=True)


t = deep_tree()
words = jnp.asarray(t.to_words())
log(f"deep10 nodes={len(t)}")
_, ci = camera_matrices(
    np.array([0.2, 0.3, -2.4], np.float32),
    np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = d.reshape(-1, 3)
n = flat.shape[0]
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))
dj = jnp.asarray(flat)


def bench(tag, **kw):
    def run():
        res, _ = tracer.trace_staged(
            words, oj, dj, beam_shape=(H, W, 8), **kw)
        return res.hit.sum()
    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"{tag}: {dt*1e3:.1f} ms (hits {h0})")


def bench_shadows(tag):
    from octree_tracer_tpu.render import tracer as tr

    sun = jnp.asarray(tr.DEFAULT_SUN)
    oj2, dj2 = jnp.asarray(o), jnp.asarray(d)  # d: (H, W, 3)

    def run():
        img, res, _ = tr.render_frame(
            words, oj2, dj2, sun, shadows=True, mode="beam")
        return res.hit.sum()

    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"{tag}: {dt*1e3:.1f} ms (hits {h0})")


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("all", "base"):
    bench("adaptive switch (fused tail)")
if which == "shadows":
    bench_shadows("deep10 + shadows frame")
if which in ("all", "s1"):
    bench("wide, tail n/32",
          schedule=((32, None), (64, n // 4), (None, n // 32)))
if which in ("all", "s2"):
    bench("wide, 4-stage",
          schedule=((32, None), (64, n // 4), (96, n // 16),
                    (None, n // 64)))
if which in ("all", "s3"):
    bench("earlier compaction",
          schedule=((16, None), (48, n // 2), (64, n // 8),
                    (None, n // 32)))
