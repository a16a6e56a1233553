#!/usr/bin/env python3
"""Same-process fit vs static A/B on the exact bench deep10 frame
(render_frame, shadows, deep camera) — the bench numbers moved 874 -> 1112
across processes and the drift is +-15%."""

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

t = deep_tree()
words = jnp.asarray(t.to_words())
print(f"deep10 nodes={len(t)}", flush=True)
_, ci = camera_matrices(
    np.array([0.2, 0.3, -2.4], np.float32),
    np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)


def frame(fit):
    img, res, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=True, mode="beam",
        raw_result=True, u8_image=True, fit_stages=fit)
    return res.hit.sum()


h = {f: int(np.asarray(frame(f))) for f in (True, False)}
assert h[True] == h[False], h
print(f"hits {h[True]}", flush=True)
for rep in range(2):
    for f in (True, False):
        t0 = time.time()
        for _ in range(3):
            np.asarray(frame(f))
        dt = (time.time() - t0) / 3
        print(f"rep{rep} fit={f}: {dt*1e3:.1f} ms", flush=True)
