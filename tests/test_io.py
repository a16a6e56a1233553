"""Loader tests: .vox parse + vectorized build vs insertion oracle, .rsvo
synthetic round-trip (SURVEY.md §4.1)."""

import struct

import numpy as np
import pytest

from octree_tracer_tpu.core import CHUNK_OFFSET, CpuOctree, pack_rgb
from octree_tracer_tpu.io import load_file, load_rsvo
from octree_tracer_tpu.io.vox import (
    VoxError,
    build_octree,
    load_vox,
    parse_vox,
    voxels_to_cells,
)

SMALL = "/root/reference/files/small.vox"


def test_parse_small_vox():
    with open(SMALL, "rb") as f:
        data = f.read()
    size, voxels, palette = parse_vox(data)
    assert size == (8, 8, 8)
    assert voxels.shape == (45, 4)
    assert palette.shape == (256,)


def test_load_small_vox():
    tree = load_file(SMALL)
    assert len(tree) == 256
    filled = (tree.pointers == CHUNK_OFFSET) & (tree.values != 0)
    assert filled.sum() == 45


def test_builder_matches_insertion_loop():
    with open(SMALL, "rb") as f:
        size, voxels, palette = parse_vox(f.read())
    side = size[0]
    cells, rgb = voxels_to_cells(side, voxels, palette)
    depth = side.bit_length() - 1

    fast = build_octree(cells, rgb, depth)
    slow = CpuOctree(0)
    pos = (cells.astype(np.float32) / side) * 2.0 - 1.0
    for i in range(cells.shape[0]):
        slow.put_in_voxel(pos[i], rgb[i], depth)

    assert len(fast) == len(slow)
    # Same leaf value + depth + centre for every inserted voxel and for a grid
    # of random probes (node numbering differs by design: BFS/morton layout).
    rng = np.random.default_rng(0)
    probes = np.concatenate([pos, rng.uniform(-1, 1, (200, 3)).astype(np.float32)])
    for p in probes:
        i1, d1, c1 = fast.find_voxel(p)
        i2, d2, c2 = slow.find_voxel(p)
        assert d1 == d2
        assert fast.values[i1] == slow.values[i2]
        np.testing.assert_allclose(c1, c2)


def test_vox_rejects_non_cube():
    data = _make_vox((4, 4, 2), [])
    with pytest.raises(VoxError):
        load_vox(data)


def test_vox_rejects_non_pow2():
    data = _make_vox((3, 3, 3), [])
    with pytest.raises(VoxError):
        load_vox(data)


def test_vox_coordinate_remap():
    # vox (x,y,z) -> cell (size-1-x, z, y) (reference: src/cpu_octree.rs:192-207)
    data = _make_vox((4, 4, 4), [(0, 1, 2, 1)], palette0=0x00050301)  # abgr
    tree = load_vox(data)
    # cell = (3, 2, 1); pos corner = cell/4*2-1 = (0.5, 0.0, -0.5)
    idx, depth, _ = tree.find_voxel([0.5, 0.0, -0.5])
    assert depth == 2
    assert tree.values[idx] == pack_rgb(1, 3, 5)


def _make_vox(size, voxels, palette0=0xFFFFFFFF):
    """Minimal VOX writer for tests: SIZE + XYZI + RGBA chunks."""
    xyzi = struct.pack("<i", len(voxels)) + b"".join(
        struct.pack("<4B", *v) for v in voxels
    )
    size_c = struct.pack("<3i", *size)
    pal = np.full(256, palette0, dtype="<u4").tobytes()

    def chunk(cid, content, children=b""):
        return cid + struct.pack("<ii", len(content), len(children)) + content + children

    inner = chunk(b"SIZE", size_c) + chunk(b"XYZI", xyzi) + chunk(b"RGBA", pal)
    return b"VOX " + struct.pack("<i", 150) + chunk(b"MAIN", b"", inner)


# -- rsvo ---------------------------------------------------------------------


def _make_rsvo(top_level, node_counts, masks):
    """Synthetic .rsvo: 16 junk bytes, top_level byte, 3 pad, LE u32 counts,
    mask bytes (reference format per src/cpu_octree.rs:128-146)."""
    head = b"\x00" * 16 + bytes([top_level]) + b"\x00" * 3
    counts = b"".join(struct.pack("<I", c) for c in node_counts)
    return head + counts + bytes(masks)


def test_rsvo_single_level():
    # root mask 0b00000101 -> children 0 and 2 filled, truncated at depth 1:
    # they stay block refs with ids slot%8+1.
    data = _make_rsvo(1, [1, 0], [0b00000101])
    tree = load_rsvo(data, 1)
    assert len(tree) == 8
    assert tree.pointers[0] == CHUNK_OFFSET + 1
    assert tree.pointers[2] == CHUNK_OFFSET + 3
    assert np.all(tree.pointers[[1, 3, 4, 5, 6, 7]] == CHUNK_OFFSET)


def test_rsvo_two_levels():
    # root has child 0; level-2 mask fills that child's 8 slots with 0b11.
    data = _make_rsvo(2, [1, 1, 0], [0b00000001, 0b00000011])
    tree = load_rsvo(data, 2)
    assert len(tree) == 16
    assert tree.pointers[0] == 8  # expanded interior
    assert tree.pointers[8] == CHUNK_OFFSET + 1  # slot 8 % 8 + 1
    assert tree.pointers[9] == CHUNK_OFFSET + 2
    assert np.all(tree.pointers[10:16] == CHUNK_OFFSET)


def test_rsvo_truncation():
    # Request depth 1 of a 2-level file: root children stay block refs.
    data = _make_rsvo(2, [1, 1, 0], [0b00000001, 0b00000011])
    tree = load_rsvo(data, 1)
    assert len(tree) == 8
    assert tree.pointers[0] == CHUNK_OFFSET + 1


def test_rsvo_depth_too_large():
    data = _make_rsvo(1, [1, 0], [1])
    with pytest.raises(Exception):
        load_rsvo(data, 5)


def test_rsvo_export_roundtrip():
    from octree_tracer_tpu.io.rsvo_export import save_rsvo

    tree = load_file(SMALL)
    data = save_rsvo(tree)
    back = load_rsvo(data, 3)
    assert len(back) == len(tree)
    # occupancy equivalence over the full 8^3 grid
    for x in range(8):
        for y in range(8):
            for z in range(8):
                p = np.array([x, y, z], np.float32) / 8 * 2 - 1
                i1, d1, _ = tree.find_voxel(p)
                i2, d2, _ = back.find_voxel(p)
                occ1 = (tree.pointers[i1] != CHUNK_OFFSET) or tree.values[i1] != 0
                occ2 = (back.pointers[i2] != CHUNK_OFFSET) or back.values[i2] != 0
                assert occ1 == occ2 and d1 == d2


def test_rsvo_export_truncated_reimport():
    from octree_tracer_tpu.io.rsvo_export import save_rsvo

    tree = load_file(SMALL)
    t2 = load_rsvo(save_rsvo(tree), 2)
    assert (t2.pointers > CHUNK_OFFSET).sum() > 0  # cut level -> block refs


def test_rsvo_export_rejects_mixed_depth():
    from octree_tracer_tpu.io.rsvo_export import save_rsvo

    t = CpuOctree(0)
    t.put_in_voxel([0.9, 0.9, 0.9], 123, 1)   # solid leaf at depth 1
    t.put_in_voxel([-0.9, -0.9, -0.9], 9, 3)  # deeper leaf elsewhere
    with pytest.raises(ValueError):
        save_rsvo(t)


def test_vox_export_roundtrip():
    """save_vox -> load_vox reproduces the tree bit-exactly for scenes
    without black voxels (black #000000 == the empty leaf encoding,
    payload VOXEL_OFFSET+0 — unhittable in the reference's shader too,
    src/shader.wgsl filled = payload > VOXEL_OFFSET)."""
    from octree_tracer_tpu.io.vox import load_vox
    from octree_tracer_tpu.io.vox_export import save_vox, tree_depth

    for name in ("small", "monu9"):
        t = load_file(f"/root/reference/files/{name}.vox")
        data = save_vox(t)
        t2 = load_vox(data)
        np.testing.assert_array_equal(t.to_words(), t2.to_words())
    assert tree_depth(load_file("/root/reference/files/monu9.vox")) == 7


def test_vox_export_black_voxel_fixpoint():
    """Scenes WITH black voxels lose only those (indistinguishable from
    empty in the node encoding); one export pass is then a fixpoint."""
    from octree_tracer_tpu.io.vox import load_vox
    from octree_tracer_tpu.io.vox_export import save_vox

    t = load_file("/root/reference/files/defualt.vox")
    t2 = load_vox(save_vox(t))
    t3 = load_vox(save_vox(t2))
    np.testing.assert_array_equal(t2.to_words(), t3.to_words())
    # dropped nodes are only all-black/empty leaf groups
    assert len(t2) <= len(t)


def test_vox_export_rejects_too_deep():
    from octree_tracer_tpu.io.vox_export import save_vox
    from octree_tracer_tpu.core.cpu_octree import CpuOctree
    from octree_tracer_tpu.core import pack_rgb

    t = CpuOctree(0)
    t.put_in_voxel([0.5, 0.5, 0.5], pack_rgb(1, 2, 3), 9)
    with pytest.raises(ValueError):
        save_vox(t)


def test_vox_export_quantizes_many_colors():
    """> 255 unique colours quantize to the most frequent 255 (others map
    to nearest) and the file still parses."""
    from octree_tracer_tpu.io.vox import load_vox
    from octree_tracer_tpu.io.vox_export import save_vox
    from octree_tracer_tpu.core.cpu_octree import CpuOctree

    t = CpuOctree(0)
    rng = np.random.default_rng(0)
    side = 16
    for i in range(400):
        cell = rng.integers(0, side, 3)
        pos = (cell + 0.5) / side * 2 - 1
        t.put_in_voxel(pos, int(rng.integers(1, 1 << 24)), 4)
    t2 = load_vox(save_vox(t, 4))
    assert len(t2) > 8


def test_load_file_bin_chunk(tmp_path):
    """load_file dispatches .bin world chunks (CpuOctree.bin layout)."""
    t = load_file(SMALL)
    p = tmp_path / "0.bin"
    p.write_bytes(t.to_bin())
    t2 = load_file(str(p))
    np.testing.assert_array_equal(t.to_words(), t2.to_words())
