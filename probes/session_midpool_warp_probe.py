"""Probe (2026-08-20, round 4): auto-warp on MID pools (the converged
deep-world interactive state, ~1M-word bucket) now that (a) pack9
auto-couples to big warp tables and (b) patches invalidate incrementally
instead of forcing a 60-77 ms rebuild.

Round-3 verdict was 'auto-warp rarely triggers interactively and
sub-threshold pools LOSE with warp' — measured on OUTSIDE cameras. The
deep-world fly-through has an inside camera (the class where warp won
10-21% on the bench rows). A/B: warp_pool_words 2^20 vs None at
feedback_every=4, same process, converged pool."""

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
s.character.pos = np.array([0.0, 0.0, -1.3], np.float32)
s.character.look = np.array([0.0, 0.0, 1.0], np.float32)
s.settings.feedback_every = 4

for i in range(40):  # converge
    img, _, _ = s.step()
    np.asarray(img)
print(f"converged: {len(s.octree)} nodes, "
      f"pool {s.device_words.shape[0] * 4 / 1e6:.0f} MB", flush=True)

res = {}
for warp_words in (1 << 20, None, 1 << 20, None):
    s.settings.warp_pool_words = warp_words
    key = "warp" if warp_words else "plain"
    for _ in range(4):
        img, _, _ = s.step()
        np.asarray(img)
    ts = []
    for _ in range(12):
        t1 = time.time()
        img, _, _ = s.step()
        np.asarray(img)
        ts.append((time.time() - t1) * 1e3)
    res.setdefault(key, []).extend(ts)
for k, v in res.items():
    print(f"{k:>5}: median {np.median(v):7.1f} ms  min {min(v):7.1f}")
