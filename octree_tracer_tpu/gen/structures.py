"""Structure stamping: placing block-built props (trees, crystals) in chunks.

A working implementation of the reference's structure placement, which ships
only as commented-out code (reference: src/procedural.rs:223-224, 266-295) and
a dead ``load_structure`` loader (src/cpu_octree.rs:213-230): structures are
lists of (integer offset, block id) stamped into a chunk as block references.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.cpu_octree import CpuOctree
from ..io.vox import load_structure
from ..world.world import DEFAULT_ASSET_ROOT


def load_structure_file(name: str, asset_root: str = DEFAULT_ASSET_ROOT):
    """Load ``structures/<name>.vox`` -> (offsets int32[N,3], block ids)."""
    path = os.path.join(asset_root, "structures", f"{name}.vox")
    with open(path, "rb") as f:
        return load_structure(f.read())


def stamp_structure(
    chunk: CpuOctree,
    base_pos,
    offsets: np.ndarray,
    block_ids: np.ndarray,
    depth: int,
) -> int:
    """Stamp a structure anchored at ``base_pos`` (chunk-local [-1,1] coords):
    each voxel becomes a block reference at ``depth`` via ``put_in_block``
    (reference: src/procedural.rs:266-279). Out-of-chunk voxels are skipped.
    Returns the number of blocks placed."""
    base_pos = np.asarray(base_pos, dtype=np.float32)
    voxel_size = np.float32(2.0 / (1 << depth))
    placed = 0
    for off, block in zip(offsets, block_ids):
        pos = base_pos + off.astype(np.float32) * voxel_size
        if np.any(pos < -1.0) or np.any(pos >= 1.0):
            continue
        chunk.put_in_block(pos, int(block), depth)
        placed += 1
    return placed


def scatter_trees(
    chunk: CpuOctree,
    grass_cells: np.ndarray,
    depth: int,
    seed: int = 0,
    probability: float = 0.01,
    asset_root: str = DEFAULT_ASSET_ROOT,
) -> int:
    """Place tree structures on a random subset of grass-top cells, mirroring
    the reference's 1-in-100 placement rule (src/procedural.rs:280-294).

    ``grass_cells``: integer (x, y, z) cells of grass blocks at ``depth``.
    Returns total blocks stamped."""
    if grass_cells.shape[0] == 0:
        return 0
    offsets, blocks = load_structure_file("tree", asset_root)
    rng = np.random.default_rng(seed)
    pick = rng.random(grass_cells.shape[0]) < probability
    total = 0
    scale = np.float32(2.0 / (1 << depth))
    for cell in grass_cells[pick]:
        base = cell.astype(np.float32) * scale - 1.0
        total += stamp_structure(chunk, base, offsets, blocks, depth)
    return total
