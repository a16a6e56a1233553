#!/usr/bin/env python3
"""Phase breakdown of the interactive Session step (720p+shadows, monu10,
steady state): device frame vs u8-frame tunnel transfer vs adaptive pass.

The fb4 bench row medians 229 ms wall; the offline 1080p+shadows frame is
173 ms — per-ray the session looks ~2.4x worse despite a 28K-node pool.
This probe splits an off-frame into (a) dispatch+device (sync on a u32
scalar sum of the frame — forces compute, ships 4 bytes) and (b) the full
2.76 MB u8 frame fetch, and times the adaptive frame's update() separately.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World

world = World(load_blocks=False)
world.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
world.generate_mip_tree(0)
s = Session(world, width=1280, height=720)
s.settings.feedback_every = 4

for i in range(12):  # warm + converge LOD
    img, _, _ = s.step()
    np.asarray(img)
print(f"warm done, nodes={len(s.octree)}", flush=True)

# Off-frame phases (frame_count % 4 != 0). s.render() on an off-frame.
dev, xfer, total = [], [], []
for i in range(16):
    if s.frame_count % 4 == 0:   # skip the adaptive frame here
        img, _, _ = s.step()
        np.asarray(img)
        continue
    t0 = time.time()
    img, result = s.render()
    int(np.asarray(jnp.sum(img, dtype=jnp.uint32)))  # device sync, 4 B out
    t1 = time.time()
    np.asarray(img)                                  # the 2.76 MB fetch
    t2 = time.time()
    s.update()                                       # off-frame: no-op
    total.append(time.time() - t0)
    dev.append(t1 - t0)
    xfer.append(t2 - t1)
print(
    f"off-frame: device+dispatch {np.median(dev)*1e3:.1f} ms  "
    f"u8 fetch {np.median(xfer)*1e3:.1f} ms  "
    f"total {np.median(total)*1e3:.1f} ms", flush=True)

# Adaptive-frame phases.
rdr, upd = [], []
for i in range(24):
    if s.frame_count % 4 != 0:
        img, _, _ = s.step()
        np.asarray(img)
        continue
    t0 = time.time()
    img, result = s.render()
    int(np.asarray(jnp.sum(img, dtype=jnp.uint32)))
    t1 = time.time()
    stats = s.update()
    t2 = time.time()
    np.asarray(img)
    rdr.append(t1 - t0)
    upd.append(t2 - t1)
print(
    f"adaptive frame: render(device) {np.median(rdr)*1e3:.1f} ms  "
    f"update() {np.median(upd)*1e3:.1f} ms  stats {stats}", flush=True)
