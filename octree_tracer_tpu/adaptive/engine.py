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
        try:
            chunk_id, cpu_index, _, _ = world.find_voxel(
                pos, max_depth=voxel_depth
            )
        except (KeyError, IndexError):
            # A chunk on the world path is not resident (evicted or still
            # streaming): defer this candidate to a later frame, matching the
            # native engine (the reference panics here, src/adaptive.rs:39).
            continue
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
    (reference: src/adaptive.rs:70-126). Returns collapses applied.

    Missing-chunk and eviction semantics deliberately match the native batch
    engine (native/otcore.cpp ``otc_process_unsubdivision``): a non-resident
    chunk on the world path stamps an empty-black leaf (the reference panics
    here), and evictions apply *after* the whole batch so every candidate sees
    the same resident-chunk snapshot."""
    applied = 0
    evict_ids: list[int] = []
    for node_index in candidates:
        node_index = int(node_index)
        if node_index < 0:
            break
        if octree.get_node(node_index) >= int(VOXEL_OFFSET):
            continue  # already a leaf (e.g. collapsed via an ancestor)
        octree.unsubdivide(node_index)

        pos = octree.positions[node_index]
        _, voxel_depth, _ = octree.find_voxel(pos)
        value = 0
        try:
            chunk_id, cpu_index, _, _ = world.find_voxel(
                pos, max_depth=voxel_depth
            )
        except (KeyError, IndexError):
            pass  # non-resident chunk: stamp empty, like the native engine
        else:
            chunk = world.chunks[chunk_id]
            ptr = int(chunk.pointers[cpu_index])
            value = int(chunk.values[cpu_index])
            if ptr > int(CHUNK_OFFSET):
                ref_id = ptr - int(CHUNK_OFFSET)
                if ref_id >= int(CHUNK_OFFSET) // 2:
                    # Generated terrain chunk no longer needed at this LOD.
                    evict_ids.append(ref_id)

        octree.set_leaf(node_index, np.uint32(value))
        applied += 1
    for ref_id in evict_ids:
        world.evict_chunk(ref_id)
    return applied
