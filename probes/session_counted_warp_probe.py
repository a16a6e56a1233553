"""Probe (2026-08-21, round 5): counted frames now ride the combined
warp+skip table (feedback.propagate_visits reconstructs the exact interior
zero-set — VERDICT r4 #3), so the deep-world interactive session's COUNTED
steps should gain what the off-frames gained in round 4, plus free-space
skip on both.

A/B on the converged deep-world fly-through (inside camera, ~1M-word
bucket): warp_pool_words 2^20 (counted+off frames ride the combined table,
closure before selection) vs None (no table anywhere), at fb1 (every frame
counted — the reference cadence) and fb4, interleaved same-process.
Steps are synced on a scalar (res.hit.sum()) so the rows are
tunnel-bandwidth-independent (CLAUDE.md measurement rules)."""

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
for fb in (1, 4):
    s.settings.feedback_every = fb
    for warp_words in (1 << 20, None, 1 << 20, None):
        s.settings.warp_pool_words = warp_words
        key = f"fb{fb}_" + ("warpskip" if warp_words else "plain")
        for _ in range(max(4, fb)):  # warm the cadence + table build
            _, r, _ = s.step()
            float(np.asarray(r.hit.sum()))
        ts = []
        for _ in range(4 * fb + 8):
            t1 = time.time()
            _, r, _ = s.step()
            float(np.asarray(r.hit.sum()))
            ts.append((time.time() - t1) * 1e3)
        res.setdefault(key, []).extend(ts)

for key, ts in res.items():
    print(f"{key:16s}: median {np.median(ts):7.1f} ms  "
          f"p25 {np.percentile(ts, 25):7.1f}  max {max(ts):7.1f}  "
          f"n={len(ts)}", flush=True)
