#!/usr/bin/env python3
"""Big-pool interactive session evidence: stream the deep-10 shell scene
(7.9M nodes ground truth) at 720p+shadows until the device pool crosses
BIG_POOL_WORDS, then measure steady-state step wall at feedback_every=4
with auto-warp ON (default) vs OFF (warp_pool_words=None), same process.
Off-frames ride the warp table only when the pool is big — this is the
workload Settings.warp_pool_words exists for."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.world.world import World

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from deep_paging_probe import deep_tree

t0 = time.time()
world = World(load_blocks=False)
world.chunks[0] = deep_tree()
world.generate_mip_tree(0)
print(f"world: {len(world.chunks[0])} nodes ({time.time()-t0:.0f}s)",
      flush=True)

s = Session(world, width=1280, height=720, pool_capacity=10_000_000)
# Fly INTO the scene so the LOD engine streams deep detail.
s.character.pos = np.array([0.0, 0.0, -1.3], np.float32)
s.character.look = np.array([0.0, 0.0, 1.0], np.float32)

i = 0
while s.device_words.shape[0] < (1 << 22) and i < 60:
    img, _, _ = s.step()
    np.asarray(img)
    i += 1
    if i % 10 == 0:
        print(f"grow {i}: nodes={len(s.octree)} "
              f"pool={s.device_words.shape[0]*4/1e6:.0f} MB", flush=True)
print(f"pool big after {i} steps: {s.device_words.shape[0]*4/1e6:.0f} MB, "
      f"{len(s.octree)} nodes", flush=True)

s.settings.feedback_every = 4
for warp_words in (1 << 22, None, 1 << 22):  # interleave-ish: on, off, on
    s.settings.warp_pool_words = warp_words
    for _ in range(4):  # warm the variant's compile
        img, _, _ = s.step()
        np.asarray(img)
    ts = []
    for _ in range(12):
        t1 = time.time()
        img, _, _ = s.step()
        np.asarray(img)
        ts.append(time.time() - t1)
    tag = "warp auto" if warp_words else "warp off "
    print(f"{tag}: median {np.median(ts)*1e3:6.1f} ms  "
          f"min {min(ts)*1e3:6.1f}  (nodes {len(s.octree)})", flush=True)
