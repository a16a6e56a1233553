#!/usr/bin/env python3
"""Interleaved same-process A/B of stage/beam unroll factors on the bench
camera (monu10 primaries, trace_staged beam_raw). New evidence for
retrying the round-2 'unroll +5%' dead end: cond_reduce_probe measured
~0.26 ms/trip of pure while-trip overhead (scalar cond, trivial body,
layout-independent), so at ~60-80 sequential trips per frame, halving the
trip count is worth ~8-10 ms of a 107 ms frame. Unroll composes the body
k times per trip; the fit test then runs every k iterations (bounded
overshoot, bit-identical results — compaction timing only)."""

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

_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(np.asarray(o)).reshape(1, 3), (n, 3))

t = load_file("/root/reference/files/monu10.vox", 10)
words = jnp.asarray(t.to_words())

CASES = [
    ("u1 b1 (default)", dict(unroll=1, beam_unroll=1)),
    ("u2 b1", dict(unroll=2, beam_unroll=1)),
    ("u4 b1", dict(unroll=4, beam_unroll=1)),
    ("u1 b2", dict(unroll=1, beam_unroll=2)),
    ("u2 b2", dict(unroll=2, beam_unroll=2)),
    ("u1 b4", dict(unroll=1, beam_unroll=4)),
    ("u2 b4", dict(unroll=2, beam_unroll=4)),
]

fns = {}
for name, kw in CASES:
    def mk(kw):
        def f():
            res = tracer.trace_staged(
                words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
            return res[0].hit.sum()
        return f
    fns[name] = mk(kw)

base_hits = None
for name, _ in CASES:
    h = int(np.asarray(fns[name]()))
    if base_hits is None:
        base_hits = h
    tag = "" if h == base_hits else f"  HITS DIFFER ({h} vs {base_hits})"
    print(f"warm {name}: hits={h}{tag}", flush=True)

R = 4
acc = {name: [] for name, _ in CASES}
for r in range(R):
    for name, _ in CASES:
        t0 = time.time()
        np.asarray(fns[name]())
        acc[name].append(time.time() - t0)
for name, _ in CASES:
    ts = sorted(acc[name])
    print(f"{name}: med {np.median(acc[name])*1e3:7.1f} ms "
          f"min {ts[0]*1e3:7.1f}", flush=True)
