#!/usr/bin/env python3
"""Interleaved monu10 primary micro-sweep (one process, alternating):
beam budget x first-stage iterations, raw trace_staged. Cross-process
drift is ±15% on this tunnel; only same-process interleaves count."""

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

W, H = 1920, 1080
n = W * H

words = jnp.asarray(load_file("/root/reference/files/monu10.vox", 10).to_words())
_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))

CASES = {
    "b16 24/48 (cur)": dict(beam_iters=16),
    "b12": dict(beam_iters=12),
    "b20": dict(beam_iters=20),
    "b16 20/48": dict(
        beam_iters=16,
        schedule=((20, n // 4), (48, n // 16), (None, n // 64))),
    "b16 24/40": dict(
        beam_iters=16,
        schedule=((24, n // 4), (40, n // 16), (None, n // 64))),
    "b12 20/40": dict(
        beam_iters=12,
        schedule=((20, n // 4), (40, n // 16), (None, n // 64))),
}


def run_case(kw):
    res = tracer.trace_staged(
        words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
    return res[0].hit.sum()


for name, kw in CASES.items():
    h = int(np.asarray(run_case(kw)))
    print(f"{name} compiled (hits {h})", flush=True)

for rep in range(2):
    for name, kw in CASES.items():
        t0 = time.time()
        for _ in range(4):
            np.asarray(run_case(kw))
        dt = (time.time() - t0) / 4
        print(f"rep{rep} {name}: {dt*1e3:.1f} ms", flush=True)
