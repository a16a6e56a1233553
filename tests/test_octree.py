"""Streamed octree invariants: subdivide/unsubdivide, holes, find_voxel,
patch journal (SURVEY.md §4.1)."""

import numpy as np
import pytest

from octree_tracer_tpu.core import Octree, VOXEL_OFFSET, pack_rgb, word_payload


def make_tree():
    return Octree(np.full(8, pack_rgb(10, 20, 30), dtype=np.uint32))


def test_new_root_group():
    t = make_tree()
    assert len(t) == 8
    assert all(t.get_node(i) >= int(VOXEL_OFFSET) for i in range(8))
    np.testing.assert_allclose(t.positions[0], [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(t.positions[7], [0.5, 0.5, 0.5])


def test_subdivide_appends_group():
    t = make_tree()
    mask = np.arange(8, dtype=np.uint32)
    t.subdivide(3, mask, 2)
    assert len(t) == 16
    assert t.get_node(3) == 8  # parent points at new group
    for i in range(8):
        assert t.get_node(8 + i) == int(VOXEL_OFFSET) + i
    # children positions centre on parent's cell
    np.testing.assert_allclose(t.positions[8], t.positions[3] + [-0.25, -0.25, -0.25])


def test_subdivide_twice_raises():
    t = make_tree()
    t.subdivide(0, np.zeros(8, dtype=np.uint32), 2)
    with pytest.raises(ValueError):
        t.subdivide(0, np.zeros(8, dtype=np.uint32), 2)


def test_unsubdivide_reclaims_hole():
    t = make_tree()
    t.subdivide(2, np.ones(8, dtype=np.uint32), 2)
    t.unsubdivide(2)
    assert t.hole_stack == [8]
    assert t.get_node(2) >= int(VOXEL_OFFSET)
    # next subdivision reuses the hole instead of growing
    t.subdivide(5, np.ones(8, dtype=np.uint32), 2)
    assert len(t) == 16
    assert t.get_node(5) == 8
    assert t.hole_stack == []


def test_unsubdivide_leaf_is_noop():
    t = make_tree()
    t.unsubdivide(1)  # mirrors the reference's soft warning path
    assert t.hole_stack == []


def test_find_voxel_descends():
    t = make_tree()
    t.subdivide(7, np.full(8, 7, dtype=np.uint32), 2)
    idx, depth, pos = t.find_voxel([0.9, 0.9, 0.9])
    assert depth == 2
    assert idx == 8 + 7
    np.testing.assert_allclose(pos, [0.75, 0.75, 0.75])
    idx, depth, _ = t.find_voxel([-0.9, -0.9, -0.9])
    assert (idx, depth) == (0, 1)


def test_find_voxel_max_depth():
    t = make_tree()
    t.subdivide(7, np.full(8, 7, dtype=np.uint32), 2)
    idx, depth, _ = t.find_voxel([0.9, 0.9, 0.9], max_depth=1)
    assert (idx, depth) == (7, 1)


def test_patch_journal():
    t = make_tree()
    t.drain_patches()  # clear initial state
    t.subdivide(1, np.arange(8, dtype=np.uint32), 2)
    idx, words = t.drain_patches()
    assert set(idx.tolist()) == {1} | set(range(8, 16))
    assert np.all(words == t.nodes[idx])
    idx2, _ = t.drain_patches()
    assert idx2.size == 0


def test_set_leaf():
    t = make_tree()
    t.set_leaf(4, pack_rgb(9, 9, 9))
    assert t.get_node(4) == int(VOXEL_OFFSET) + int(pack_rgb(9, 9, 9))


def test_expanded_pads_with_zeros():
    t = make_tree()
    out = t.expanded(32)
    assert out.shape == (32,)
    assert np.all(out[8:] == 0)
    assert np.all(out[:8] == t.nodes)


def test_hole_fraction():
    t = make_tree()
    assert t.hole_fraction() == 0.0
    t.subdivide(0, np.zeros(8, dtype=np.uint32), 2)
    t.unsubdivide(0)
    assert t.hole_fraction() == pytest.approx(8 / 16)
