#!/usr/bin/env python3
"""What does Settings.feedback_every buy on the real chip? Steady-state
720p+shadows monu10 session: median step wall at feedback_every=1 (the
reference cadence) vs 2 vs 4, same process, pool converged first."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World

world = World(load_blocks=False)
world.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
world.generate_mip_tree(0)
s = Session(world, width=1280, height=720)

for i in range(8):  # converge + compile the with_visits variant
    img, _, _ = s.step()
    np.asarray(img)
print(f"converged: nodes={len(s.octree)}", flush=True)

# Compile the no-visits variant too before timing.
s.settings.feedback_every = 2
for _ in range(2):
    img, _, _ = s.step()
    np.asarray(img)

for every in (1, 2, 4):
    s.settings.feedback_every = every
    ts = []
    for _ in range(12):
        t0 = time.time()
        img, _, _ = s.step()
        np.asarray(img)
        ts.append(time.time() - t0)
    print(f"feedback_every={every}: median {np.median(ts)*1e3:6.1f} ms  "
          f"min {min(ts)*1e3:6.1f}  (nodes {len(s.octree)})", flush=True)
