#!/usr/bin/env python3
"""Interactive Session frame timing on TPU (720p + shadows, monu10),
wall and steady-state, after the round-3 raw_result/u8 frame changes."""

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
print("session up", flush=True)

for i in range(3):  # warm: compile render + adaptive paths as pool grows
    t0 = time.time()
    img, result, stats = s.step()
    np.asarray(img)
    print(f"warm {i}: {time.time()-t0:.2f} s  {stats}", flush=True)

times = []
for i in range(10):
    t0 = time.time()
    img, result, stats = s.step()
    np.asarray(img)  # the viewer's u8 frame fetch
    times.append(time.time() - t0)
print(
    f"steady frame: median {np.median(times)*1e3:.0f} ms  "
    f"min {min(times)*1e3:.0f}  max {max(times)*1e3:.0f}  "
    f"(u8 readback incl.; nodes {len(s.octree)})", flush=True)
