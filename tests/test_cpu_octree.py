"""Ground-truth chunk octree: insertion, lookup, serialization (SURVEY.md §4.1)."""

import numpy as np

from octree_tracer_tpu.core import CHUNK_OFFSET, CpuOctree, VOXEL_OFFSET, pack_rgb


def test_new_empty():
    t = CpuOctree(0)
    assert len(t) == 8
    assert np.all(t.pointers == CHUNK_OFFSET)
    assert np.all(t.values == 0)


def test_new_masked_block_refs():
    # Bits set become block refs cycling ids 1..8 by slot
    # (reference: src/cpu_octree.rs:32-45).
    t = CpuOctree(0b10000001)
    assert t.pointers[0] == CHUNK_OFFSET + 1
    assert t.pointers[7] == CHUNK_OFFSET + 8
    assert np.all(t.pointers[1:7] == CHUNK_OFFSET)
    assert t.values[0] == pack_rgb(255, 0, 0)


def test_put_in_voxel_and_find():
    t = CpuOctree(0)
    red = pack_rgb(200, 10, 10)
    t.put_in_voxel([0.9, 0.9, 0.9], red, 3)
    idx, depth, pos = t.find_voxel([0.9, 0.9, 0.9])
    assert depth == 3
    assert t.pointers[idx] == CHUNK_OFFSET
    assert t.values[idx] == red
    np.testing.assert_allclose(pos, [0.875, 0.875, 0.875])
    # sibling cells remain empty leaves
    idx2, depth2, _ = t.find_voxel([-0.9, -0.9, -0.9])
    assert depth2 == 1
    assert t.values[idx2] == 0


def test_put_in_voxel_overwrites():
    t = CpuOctree(0)
    t.put_in_voxel([0.1, 0.1, 0.1], 111, 2)
    t.put_in_voxel([0.1, 0.1, 0.1], 222, 2)
    idx, _, _ = t.find_voxel([0.1, 0.1, 0.1])
    assert t.values[idx] == 222


def test_put_in_block():
    t = CpuOctree(0)
    t.put_in_block([-0.9, 0.9, -0.9], 5, 2)
    idx, depth, _ = t.find_voxel([-0.9, 0.9, -0.9])
    assert depth == 2
    assert t.pointers[idx] == CHUNK_OFFSET + 5


def test_get_node_mask():
    t = CpuOctree(0)
    t.put_in_voxel([0.9, 0.9, 0.9], 7, 2)
    group = int(t.pointers[7])
    mask = t.get_node_mask(group)
    assert mask.shape == (8,)
    assert mask[7] == 7


def test_bin_roundtrip():
    t = CpuOctree(0)
    t.put_in_voxel([0.5, -0.5, 0.5], pack_rgb(1, 2, 3), 4)
    data = t.to_bin()
    assert len(data) == 8 * len(t)
    back = CpuOctree.from_bin(data)
    assert len(back) == len(t)
    np.testing.assert_array_equal(back.pointers, t.pointers)
    np.testing.assert_array_equal(back.values, t.values)
    assert int(back.top_mip) == 0  # reference: src/cpu_octree.rs:266-272


def test_to_words():
    t = CpuOctree(0)
    t.put_in_voxel([0.9, 0.9, 0.9], pack_rgb(5, 6, 7), 2)
    words = t.to_words()
    # interior node 7 points at its child group
    assert words[7] == int(t.pointers[7]) << 4
    # filled leaf carries VOXEL_OFFSET + rgb
    idx, _, _ = t.find_voxel([0.9, 0.9, 0.9])
    assert words[idx] == (int(VOXEL_OFFSET) + int(pack_rgb(5, 6, 7))) << 4
    # empty leaf -> empty voxel word
    assert words[0] == int(VOXEL_OFFSET) << 4


def test_free_nodes_keeps_top_mip():
    t = CpuOctree(0, top_mip=pack_rgb(9, 8, 7))
    t.put_in_voxel([0, 0, 0], 5, 2)
    t.free_nodes()
    assert len(t) == 0
    assert int(t.top_mip) == int(pack_rgb(9, 8, 7))
