"""Host-side adaptive LOD engine: subdivide hot leaves, collapse cold nodes.

Functional port of the reference's per-frame host logic
(reference: src/adaptive.rs:6-126) against this package's ``Octree`` (streamed
pool with patch journal) and ``World`` (chunk store). The device side feeds it
compacted candidate lists (``adaptive.feedback``); the mutations land in the
octree's patch journal, which the session drains into compact device patches.
"""

from __future__ import annotations

import numpy as np

from ..core.voxel import CHUNK_OFFSET, VOXEL_OFFSET


def process_subdivision(candidates, octree, world) -> int:
    """For each hot-leaf candidate: find the node's ground truth in the world
    and split it with the true children's (mip) colours; chunk references
    subdivide from the chunk's root or trigger an async load
    (reference: src/adaptive.rs:6-68). Returns the number of splits applied."""
    applied = 0
    for node_index in candidates:
        node_index = int(node_index)
        if node_index < 0:
            break  # -1 padding
        if octree.get_node(node_index) < int(VOXEL_OFFSET):
            # Already split this frame ("Doubleup!", src/adaptive.rs:32-35).
            continue

        pos = octree.positions[node_index]
        _, voxel_depth, _ = octree.find_voxel(pos)
        chunk_id, cpu_index, _, _ = world.find_voxel(pos, max_depth=voxel_depth)
        chunk = world.chunks[chunk_id]
        ptr = int(chunk.pointers[cpu_index])

        if ptr < int(CHUNK_OFFSET):
            mask = chunk.get_node_mask(ptr)
            octree.subdivide(node_index, mask, voxel_depth + 1)
            applied += 1
        elif ptr > int(CHUNK_OFFSET):
            ref_id = ptr - int(CHUNK_OFFSET)
            if ref_id in world.chunks:
                mask = world.chunks[ref_id].get_node_mask(0)
                octree.subdivide(node_index, mask, voxel_depth + 1)
                applied += 1
            else:
                world.load_chunk(ref_id)  # async; retried next frame
        # ptr == CHUNK_OFFSET: plain leaf in the world — nothing to split.
    return applied


def process_unsubdivision(candidates, octree, world) -> int:
    """Collapse cold interior nodes: reclaim the child group and stamp the
    world's mip colour; evict generated chunks whose reference collapsed
    (reference: src/adaptive.rs:70-126). Returns collapses applied."""
    applied = 0
    for node_index in candidates:
        node_index = int(node_index)
        if node_index < 0:
            break
        if octree.get_node(node_index) >= int(VOXEL_OFFSET):
            continue  # already a leaf (e.g. collapsed via an ancestor)
        octree.unsubdivide(node_index)

        pos = octree.positions[node_index]
        _, voxel_depth, _ = octree.find_voxel(pos)
        chunk_id, cpu_index, _, _ = world.find_voxel(pos, max_depth=voxel_depth)
        chunk = world.chunks[chunk_id]
        ptr = int(chunk.pointers[cpu_index])
        value = int(chunk.values[cpu_index])

        if ptr > int(CHUNK_OFFSET):
            ref_id = ptr - int(CHUNK_OFFSET)
            if ref_id >= int(CHUNK_OFFSET) // 2:
                # Generated terrain chunk no longer needed at this LOD.
                world.evict_chunk(ref_id)

        octree.set_leaf(node_index, np.uint32(value))
        applied += 1
    return applied
