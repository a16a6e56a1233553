"""Probe (2026-08-20, VERDICT r3 #6): level-7 warp-table rebuild cost.

Measures build_warp_table(level 7) on the deep10 big pool (the auto-warp
class: >= BIG_POOL_WORDS) and reports its share of a big-pool adaptive-class
frame, plus the level-6 table for contrast. The session rebuilds the table
on the first NON-counted frame after any patch (correctness: a patched pool
invalidates stored resume indices), so under streaming churn this cost
recurs once per patch batch.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu import native
from octree_tracer_tpu.core.cpu_octree import CpuOctree
from octree_tracer_tpu.core.voxel import CHUNK_OFFSET
from octree_tracer_tpu.render import tracer


def deep_scene(depth=10):
    side = 1 << depth
    g = np.arange(side, dtype=np.float32)
    cx = (g + 0.5) / side * 2.0 - 1.0
    xs, ys = np.meshgrid(cx, cx, indexing="ij")
    rng2 = 0.9025 - xs * xs - ys * ys
    zs = np.sqrt(np.maximum(rng2, 0.0))
    keep = rng2 > 0
    cells = []
    for sign in (1.0, -1.0):
        zc = np.clip(((sign * zs + 1.0) * (side / 2.0)).astype(np.int64),
                     0, side - 1)
        cells.append(np.stack(
            [np.broadcast_to(np.arange(side), (side, side))[keep],
             np.broadcast_to(np.arange(side)[:, None], (side, side))[keep],
             zc[keep]], axis=1))
    cells = np.unique(np.concatenate(cells, axis=0), axis=0)
    rgb = np.full(cells.shape[0], 0x808080, np.uint32)
    ptrs, vals = native.build_leaves(
        cells.astype(np.float32) / side * 2.0 - 1.0 + 1.0 / side,
        np.full(cells.shape[0], CHUNK_OFFSET, np.uint32), rgb, depth)
    return CpuOctree.from_arrays(ptrs, vals)


def main():
    tree = deep_scene()
    words = jnp.asarray(tree.to_words())
    print(f"pool: {len(tree)} nodes ({words.nbytes / 1e6:.1f} MB)")
    for lvl in (6, 7):
        # Sync on a scalar reduce: block_until_ready lies on the tunneled
        # platform and np.asarray of the 8 MB table measures the tunnel
        # (CLAUDE.md measurement rules).
        t = tracer.build_warp_table(words, lvl)
        float(np.asarray(t.sum(dtype=jnp.uint32)))
        ts = []
        for _ in range(5):
            t0 = time.time()
            t = tracer.build_warp_table(words, lvl)
            float(np.asarray(t.sum(dtype=jnp.uint32)))
            ts.append((time.time() - t0) * 1e3)
        sz = sum(x.nbytes for x in t) if isinstance(t, (tuple, list)) \
            else t.nbytes
        print(f"level {lvl}: rebuild {min(ts):7.1f} ms (median "
              f"{np.median(ts):.1f}), table {sz / 1e6:.1f} MB")
    print("big-pool adaptive-class frame for scale: deep10+shadows "
          "~390-430 ms (BENCH r4) -> level-7 rebuild share = above/frame")


if __name__ == "__main__":
    main()
