#!/usr/bin/env python3
"""Interleaved deep10 bench frame: fit+fuse (current default) vs fit+warp —
the warp trade was measured pre-fit; fit's adaptive stages may change it."""

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
warp = tracer.build_warp_table(words, 6)
np.asarray(warp[:8])
print(f"deep10 nodes={len(t)}", flush=True)
_, ci = camera_matrices(
    np.array([0.2, 0.3, -2.4], np.float32),
    np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)

CASES = {
    "fit+fuse (cur)": {},
    "fit+warp": dict(warp_table=warp),
}


def frame(kw):
    img, res, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=True, mode="beam",
        raw_result=True, u8_image=True, **kw)
    return res.hit.sum()


h = {n2: int(np.asarray(frame(kw))) for n2, kw in CASES.items()}
assert len(set(h.values())) == 1, h
print(f"hits {h}", flush=True)
for rep in range(2):
    for n2, kw in CASES.items():
        t0 = time.time()
        for _ in range(3):
            np.asarray(frame(kw))
        dt = (time.time() - t0) / 3
        print(f"rep{rep} {n2}: {dt*1e3:.1f} ms", flush=True)
