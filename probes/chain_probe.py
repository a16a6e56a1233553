#!/usr/bin/env python3
"""End-to-end regression probe for the two-level guarded tail chain:
deep10 (shadow set, primary set, full frame) + monu10 (primaries, full
frame). Run after any tail/schedule change."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays
from deep_paging_probe import deep_tree

W, H = 1920, 1080
FRAMES = 3
n = W * H


def log(m):
    print(m, flush=True)


def bench_frame(tag, words, oj, dj, sun, shadows):
    def run():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=shadows, mode="beam")
        return res.hit.sum()
    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"{tag}: {dt*1e3:.1f} ms (hits {h0})")
    return dt


sun = jnp.asarray(tracer.DEFAULT_SUN)
which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "deep"):
    t = deep_tree()
    dwords = jnp.asarray(t.to_words())
    log(f"deep10 nodes={len(t)}")
    _, ci = camera_matrices(
        np.array([0.2, 0.3, -2.4], np.float32),
        np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
    o, d = generate_rays(ci, W, H)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    flat = jnp.asarray(d.reshape(-1, 3))
    ojb = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))

    def run_pr():
        res, _ = tracer.trace_staged(
            dwords, ojb, flat, beam_shape=(H, W, 8), beam_raw=True)
        return res.hit.sum()

    h0 = int(np.asarray(run_pr()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run_pr())
    log(f"deep10 primary set: {(time.time()-t0)/FRAMES*1e3:.1f} ms"
        f" (hits {h0})")
    bench_frame("deep10 frame+shadows", dwords, oj, dj, sun, True)

if which in ("all", "monu"):
    mwords = jnp.asarray(load_file(
        "/root/reference/files/monu10.vox").to_words())
    pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
    look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
    _, ci = camera_matrices(pos, look, 70.0, W, H)
    o, d = generate_rays(ci, W, H)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    bench_frame("monu10 primaries", mwords, oj, dj, sun, False)
    bench_frame("monu10 frame+shadows", mwords, oj, dj, sun, True)
