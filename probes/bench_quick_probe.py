#!/usr/bin/env python3
"""Quick re-measure of the two monu10 bench frames (primaries / +shadows)
with raw_result + u8_image, exactly as bench.py runs them."""

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
FRAMES = 5

t = load_file("/root/reference/files/monu10.vox", 10)
words = jnp.asarray(t.to_words())
_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)


def bench(tag, **kw):
    def run():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, mode="beam",
            raw_result=True, u8_image=True, **kw)
        return res.hit.sum()
    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    n = W * H
    print(f"{tag}: {dt*1e3:.1f} ms  ({(n + (h0 if 'shadow' in tag else 0))/dt/1e6:.2f} Mrays/s, hits {h0})",
          flush=True)


bench("primaries", shadows=False)
bench("with_shadows", shadows=True)
