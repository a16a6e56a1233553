#!/usr/bin/env python3
"""Per-phase timing of one production chunk (512^3) through generate_chunk +
mip + save — locates the remaining cost of the 389 s genworld run."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu import native
from octree_tracer_tpu.core.cpu_octree import CpuOctree
from octree_tracer_tpu.gen.procedural import Procedural, _block_grid_packed
from octree_tracer_tpu.world.world import World


def t(tag, t0):
    dt = time.time() - t0
    print(f"{tag}: {dt:.2f} s", flush=True)
    return time.time()


pos = jnp.asarray(np.array([0.0, -1.0, 0.0], np.float32))  # chunk (0,0,1)-ish
# warm compile first
_ = np.asarray(_block_grid_packed(pos, 9, 1))
t0 = time.time()
packed_dev = _block_grid_packed(pos, 9, 1)
packed_dev.block_until_ready()
t0 = t("sdf eval (device)", t0)
packed = np.asarray(packed_dev)
t0 = t(f"readback ({packed.nbytes/1e6:.0f} MB)", t0)
ptrs, vals = native.build_dense(packed, 9)
t0 = t(f"native build_dense ({ptrs.size/1e6:.1f}M slots)", t0)
tree = CpuOctree.from_arrays(ptrs, vals)
t0 = t("from_arrays", t0)
world = World(load_blocks=False)
world.chunks[123] = tree
world.generate_mip_tree(123)
t0 = t("generate_mip_tree", t0)
world.path = "/tmp/ot_phase_world"
os.makedirs(world.path, exist_ok=True)
world.save_chunk(123)
t0 = t("save_chunk", t0)
