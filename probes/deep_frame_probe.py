#!/usr/bin/env python3
"""End-to-end deep10 frame (the bench deep_metric config) after the
big-pool defaults: ladder sparse branches + fused sibling body +
raw_result frame."""

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
warp = tracer.build_warp_table(words, 6)
np.asarray(warp[:8])
_, ci = camera_matrices(
    np.array([0.2, 0.3, -2.4], np.float32),
    np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)


def bench(tag, **kw):
    def run():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=True, mode="beam", **kw)
        return res.hit.sum()
    tc = time.time()
    h0 = int(np.asarray(run()))
    log(f"  [compile+1st {time.time()-tc:.0f} s]")
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"{tag}: {dt*1e3:.1f} ms (hits {h0})")


CASES = {
    "raw": dict(raw_result=True),
    "default": {},
    "rawwarp": dict(raw_result=True, warp_table=None),
}
for c in (sys.argv[1:] or ["rawwarp", "raw"]):
    kw = dict(CASES[c])
    if "warp_table" in kw:
        kw["warp_table"] = warp
    bench(c, **kw)
