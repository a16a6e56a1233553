"""Unit tests for node/voxel bit formats (SURVEY.md §4.1)."""

import numpy as np

from octree_tracer_tpu.core import (
    CHUNK_OFFSET,
    VOXEL_OFFSET,
    child_offset,
    interior_word,
    is_leaf_word,
    leaf_word,
    pack_rgb,
    unpack_rgb,
    word_counter,
    word_payload,
)


def test_constants():
    assert int(VOXEL_OFFSET) == 134217728  # reference: src/octree.rs:5
    assert int(CHUNK_OFFSET) == 2147483648  # reference: src/cpu_octree.rs:3


def test_rgb_roundtrip():
    for r, g, b in [(0, 0, 0), (255, 0, 0), (1, 2, 3), (255, 255, 255)]:
        v = pack_rgb(r, g, b)
        assert unpack_rgb(v) == (r, g, b)


def test_leaf_word_matches_reference_encoding():
    # Voxel::to_value == (VOXEL_OFFSET + rgb24) << 4 (reference: src/octree.rs:28-30)
    w = leaf_word(pack_rgb(255, 0, 0))
    assert int(w) == (134217728 + 0xFF0000) << 4
    assert is_leaf_word(w)
    assert int(word_counter(w)) == 0
    assert int(word_payload(w)) == 134217728 + 0xFF0000


def test_interior_word():
    w = interior_word(1234)
    assert int(word_payload(w)) == 1234
    assert not is_leaf_word(w)


def test_shader_word_agreement():
    # node(i) = data[i] >> 4 (reference: src/shader.wgsl:119-121) must invert
    # to_value for every colour.
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 1 << 24, 100, dtype=np.uint32)
    words = leaf_word(rgb)
    assert np.all((words >> np.uint32(4)) - VOXEL_OFFSET == rgb)


def test_child_offset_geometry():
    # pos_offset (reference: src/octree.rs:154-161): bit2=x, bit1=y, bit0=z.
    np.testing.assert_allclose(child_offset(0, 1), [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(child_offset(7, 1), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(child_offset(4, 1), [0.5, -0.5, -0.5])  # x bit
    np.testing.assert_allclose(child_offset(2, 1), [-0.5, 0.5, -0.5])  # y bit
    np.testing.assert_allclose(child_offset(1, 1), [-0.5, -0.5, 0.5])  # z bit
    np.testing.assert_allclose(child_offset(7, 3), [0.125, 0.125, 0.125])


def test_child_offset_batched():
    out = child_offset(np.arange(8), 2)
    assert out.shape == (8, 3)
    np.testing.assert_allclose(out[5], [0.25, -0.25, 0.25])
