"""World layer: mip trees, cross-chunk lookup, save/load, streaming
(SURVEY.md §4, §5 checkpoint/resume)."""

import os
import time

import numpy as np
import pytest

from octree_tracer_tpu.core import CHUNK_OFFSET, CpuOctree, pack_rgb
from octree_tracer_tpu.world.world import World


def test_mip_average_and_clamp():
    world = World(load_blocks=False)
    chunk = CpuOctree(0)
    chunk.put_in_voxel([0.9, 0.9, 0.9], pack_rgb(100, 0, 0), 2)
    chunk.put_in_voxel([0.9, 0.9, 0.1], pack_rgb(0, 0, 200), 2)
    world.chunks[0] = chunk
    world.generate_mip_tree(0)
    # node 7's children: two filled voxels -> mean (50, 0, 100), clamped >= 1
    assert int(chunk.values[7]) == int(pack_rgb(50, 1, 100))
    # top mip averages the root group's non-empty entries (just node 7)
    assert int(chunk.top_mip) == int(pack_rgb(50, 1, 100))


def test_mip_patches_chunk_refs_with_top_mip():
    world = World(load_blocks=False)
    block = CpuOctree(0)
    block.put_in_voxel([0.5, 0.5, 0.5], pack_rgb(77, 88, 99), 1)
    world.chunks[3] = block
    world.generate_mip_tree(3)

    root = CpuOctree(0)
    root.put_in_block([0.9, 0.9, 0.9], 3, 1)
    world.chunks[0] = root
    world.generate_mip_tree(0)
    assert int(root.values[7]) == int(world.chunks[3].top_mip)


def test_find_voxel_crosses_chunk_ref():
    world = World(load_blocks=False)
    block = CpuOctree(0)
    block.put_in_voxel([0.5, 0.5, 0.5], pack_rgb(1, 2, 3), 1)
    world.chunks[4] = block
    root = CpuOctree(0)
    root.put_in_block([0.9, 0.9, 0.9], 4, 1)
    world.chunks[0] = root

    chunk_id, idx, depth, pos = world.find_voxel([0.9, 0.9, 0.9])
    assert chunk_id == 4
    assert depth == 2
    assert int(block.values[idx]) == int(pack_rgb(1, 2, 3))
    # max_depth stops at the reference level
    chunk_id, idx, depth, _ = world.find_voxel([0.9, 0.9, 0.9], max_depth=1)
    assert (chunk_id, idx, depth) == (0, 7, 1)


def test_save_load_chunk_roundtrip(tmp_path):
    world = World(str(tmp_path), load_blocks=False)
    chunk = CpuOctree(0)
    chunk.put_in_voxel([0.1, 0.1, 0.1], pack_rgb(5, 6, 7), 3)
    world.chunks[0] = chunk
    world.save_chunk(0)

    loaded = World.load_world(str(tmp_path), load_blocks=False)
    assert len(loaded.chunks[0]) == len(chunk)
    np.testing.assert_array_equal(loaded.chunks[0].pointers, chunk.pointers)
    np.testing.assert_array_equal(loaded.chunks[0].values, chunk.values)


def test_async_chunk_streaming(tmp_path):
    world = World(str(tmp_path), load_blocks=False)
    chunk = CpuOctree(0)
    chunk.put_in_voxel([0.1, 0.1, 0.1], pack_rgb(5, 6, 7), 2)
    big_id = int(CHUNK_OFFSET) // 2 + 3
    world.chunks[big_id] = chunk
    world.save_chunk(big_id)
    world.evict_chunk(big_id)
    assert big_id not in world.chunks

    world.load_chunk(big_id)
    deadline = time.time() + 5
    while big_id not in world.chunks and time.time() < deadline:
        time.sleep(0.01)
    assert big_id in world.chunks
    assert len(world.chunks[big_id]) == len(chunk)


def test_block_library_loads():
    world = World(load_blocks=True)
    assert set(range(1, 9)).issubset(world.chunks.keys())
    # every block got a non-black top mip
    for i in range(1, 9):
        assert int(world.chunks[i].top_mip) != 0


def test_load_world_missing_dir():
    with pytest.raises(FileNotFoundError):
        World.load_world("/nonexistent/world/dir", load_blocks=False)


def test_generate_mip_tree_native_matches_numpy(tmp_path, monkeypatch):
    """The native mip fast path (whole-array ref patching + otc_mip_tree)
    must produce the same values/top_mip as the numpy per-level walk."""
    from octree_tracer_tpu import native as native_mod

    rng = np.random.default_rng(3)
    t = CpuOctree(0)
    for c in rng.integers(0, 32, (500, 3)):
        p = c.astype(np.float32) / 32 * 2 - 1
        t.put_in_voxel(p, int(rng.integers(1, 1 << 24)), 5)
    # Chunk references: some to loaded chunks (patched with their top_mip),
    # one to a missing chunk (left untouched by both paths).
    for c, cid in [((2, 3, 4), 9), ((20, 21, 6), 9), ((5, 30, 30), 11),
                   ((31, 0, 17), 999)]:
        p = np.asarray(c, np.float32) / 32 * 2 - 1
        t.put_in_block(p, cid, 5)

    def make_world():
        w = World(load_blocks=False)
        w.chunks[7] = CpuOctree.from_arrays(
            t.pointers.copy(), t.values.copy()
        )
        for cid, mip in ((9, 0x123456), (11, 0xABCDEF)):
            sub = CpuOctree(0)
            sub.put_in_voxel(np.zeros(3, np.float32), 0x777777, 2)
            sub.top_mip = np.uint32(mip)
            w.chunks[cid] = sub
        return w

    wa = make_world()
    wa.generate_mip_tree(7)
    if native_mod.available():
        wb = make_world()
        monkeypatch.setattr(native_mod, "_lib", None)
        monkeypatch.setattr(native_mod, "_tried", True)
        wb.generate_mip_tree(7)
        np.testing.assert_array_equal(
            wa.chunks[7].values, wb.chunks[7].values
        )
        assert wa.chunks[7].top_mip == wb.chunks[7].top_mip
