#!/usr/bin/env python3
"""Robustness check of the mild schedule trim (stage 1: 24 -> 20 iters,
beam budget unchanged) across scenes, interleaved in one process. The
aggressive b12/(20,40) winner on monu10 cliffs catastrophically on
defualt (+470 ms) and deep (+1 s) — knife-edge, rejected."""

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
n = W * H

_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))

TRIM = ((20, n // 4), (48, n // 16), (None, n // 64))


def run(words, kw):
    res = tracer.trace_staged(
        words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
    return res[0].hit.sum()


def interleave(tag, words, cases, frames=3, reps=2):
    for name, kw in cases.items():
        int(np.asarray(run(words, kw)))
    for rep in range(reps):
        for name, kw in cases.items():
            t0 = time.time()
            for _ in range(frames):
                np.asarray(run(words, kw))
            dt = (time.time() - t0) / frames
            print(f"{tag} rep{rep} {name}: {dt*1e3:.1f} ms", flush=True)


for name, path in (
    ("monu10", "/root/reference/files/monu10.vox"),
    ("phantom", "/root/reference/files/phantom_mansion.vox"),
    ("defualt", "/root/reference/files/defualt.vox"),
):
    words = jnp.asarray(load_file(path, 10).to_words())
    interleave(name, words, {"cur": {}, "trim 20/48": dict(schedule=TRIM)})

words = jnp.asarray(deep_tree().to_words())
interleave("deep10(m10cam)", words,
           {"cur": {}, "trim 20/48": dict(schedule=TRIM)})
