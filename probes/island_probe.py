#!/usr/bin/env python3
"""Refresh the mega-scene number: the depth-9 procedural island chunk
(~30M nodes, ~122 MB pool — the biggest scene in the repo's records)
rendered at 1080p with shadows on the v14 tracer (big-pool defaults:
straggler ladder + fused sibling; fit advancement; warp table; u8/raw
frames). The round-1 staged tracer measured 7.9 s/frame here."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.gen.procedural import Procedural
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

W, H = 1920, 1080

t0 = time.time()
proc = Procedural(chunk_depth=9)
chunk = proc.generate_chunk(np.array([-1.0, -1.0, -1.0], np.float32), 1)
print(f"generated: {len(chunk)} nodes in {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
words = jnp.asarray(chunk.to_words())
print(f"pool: {words.shape[0]*4/1e6:.1f} MB ({time.time()-t0:.1f}s)",
      flush=True)
warp = tracer.build_warp_table(words, 6)

# Outside camera looking down into the island (the chunk spans [-1,1]^3).
_, ci = camera_matrices(
    np.array([0.3, 1.4, -2.1], np.float32),
    np.array([-0.15, -0.75, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)


def frame(warp_table):
    img, res, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=True, mode="beam",
        raw_result=True, u8_image=True, warp_table=warp_table,
    )
    return res.hit.sum()


for name, wt in (("fit+warp", warp), ("fit+fuse (no warp)", None)):
    hits = int(np.asarray(frame(wt)))
    t0 = time.time()
    for _ in range(3):
        np.asarray(frame(wt))
    dt = (time.time() - t0) / 3
    print(f"island@1080p+shadows {name}: {dt*1e3:7.1f} ms "
          f"({(W*H+hits)/dt/1e6:.2f} Mrays/s incl shadow rays, "
          f"hits {hits})", flush=True)
