#!/usr/bin/env python3
"""Does fit+warp win below the big-pool threshold too? Interleaved
render_frame primaries per scene (the pre-fit verdict was a loss on all
small pools; fit inverted it on deep — 1115 -> 613)."""

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

_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)


def frame(words, shadows, kw):
    img, res, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=shadows, mode="beam",
        raw_result=True, u8_image=True, **kw)
    return res.hit.sum()


for name, path, shadows in (
    ("monu10-pr", "monu10.vox", False),
    ("monu10-sh", "monu10.vox", True),
    ("phantom", "phantom_mansion.vox", False),
    ("defualt", "defualt.vox", False),
):
    words = jnp.asarray(
        load_file(f"/root/reference/files/{path}", 10).to_words())
    warp = tracer.build_warp_table(words, 6)
    np.asarray(warp[:8])
    cases = {"fit": {}, "fit+warp": dict(warp_table=warp)}
    h = {n2: int(np.asarray(frame(words, shadows, kw)))
         for n2, kw in cases.items()}
    assert len(set(h.values())) == 1, (name, h)
    for rep in range(2):
        for n2, kw in cases.items():
            t0 = time.time()
            for _ in range(3):
                np.asarray(frame(words, shadows, kw))
            dt = (time.time() - t0) / 3
            print(f"{name} rep{rep} {n2}: {dt*1e3:.1f} ms", flush=True)
