#!/usr/bin/env python3
"""Host-side genworld hotspot timing (CPU-only, no jax import): synthesize a
512^3 packed occupancy grid shaped like a terrain shell (realistic node
count), then time otc_build_dense and World.generate_mip_tree — the two
phases profiled at 16.9 s / 50.5 s per chunk before the round-3 rewrite."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from octree_tracer_tpu import native
from octree_tracer_tpu.core.cpu_octree import CpuOctree
from octree_tracer_tpu.world.world import World

assert native.available(), "native lib missing"

depth = 9
side = 1 << depth

# Terrain-like shell: filled below a smooth heightfield, thin surface band
# marked voxel-type 1/2 (matches the SDF output's 2-bit cell encoding).
x = np.arange(side, dtype=np.float32)
hx = (np.sin(x[:, None] * 0.021) * 60 + np.cos(x[None, :] * 0.017) * 45
      + side * 0.5).astype(np.float32)  # (x, y) heightfield
z = np.arange(side, dtype=np.float32)[None, None, :]
below = z < hx[:, :, None]          # filled region
surf = (z > hx[:, :, None] - 6) & below  # ~6-voxel surface band
cells = np.zeros((side, side, side), dtype=np.uint8)
cells[below] = 2
cells[surf] = 1

flat = cells.reshape(-1).astype(np.uint32)
packed = np.zeros(flat.size // 16, dtype=np.uint32)
for lane in range(16):
    packed |= flat[lane::16] << np.uint32(2 * lane)
n_occ = int((flat != 0).sum())
print(f"grid: {n_occ/1e6:.1f}M occupied voxels "
      f"({surf.sum()/1e6:.1f}M surface)", flush=True)

t0 = time.time()
ptrs, vals = native.build_dense(packed, depth)
t1 = time.time()
print(f"otc_build_dense: {t1-t0:.2f} s, {ptrs.size/1e6:.1f}M slots",
      flush=True)

tree = CpuOctree.from_arrays(ptrs, vals)
w = World(load_blocks=False)
w.chunks[0] = tree
t2 = time.time()
w.generate_mip_tree(0)
t3 = time.time()
print(f"generate_mip_tree (native path): {t3-t2:.2f} s", flush=True)

# numpy path for parity + relative cost on a trimmed depth (full depth-9
# numpy mip was ~50 s before; only run it when asked).
if "--numpy" in sys.argv:
    tree2 = CpuOctree.from_arrays(ptrs.copy(), vals.copy())
    w2 = World(load_blocks=False)
    w2.chunks[0] = tree2
    native._lib = None
    native._tried = True
    t4 = time.time()
    w2.generate_mip_tree(0)
    t5 = time.time()
    print(f"generate_mip_tree (numpy path): {t5-t4:.2f} s", flush=True)
    assert np.array_equal(tree.values, tree2.values)
    assert tree.top_mip == tree2.top_mip
    print("numpy/native mip parity OK", flush=True)
