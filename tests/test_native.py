"""Native runtime (libotcore.so) vs the pure-Python implementations."""

import numpy as np
import pytest

from octree_tracer_tpu.core import CHUNK_OFFSET, CpuOctree, pack_rgb
from octree_tracer_tpu.io.vox import parse_vox, voxels_to_cells
from octree_tracer_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libotcore.so not built"
)

SMALL = "/root/reference/files/small.vox"


def test_build_leaves_matches_insertion_order():
    with open(SMALL, "rb") as f:
        size, voxels, palette = parse_vox(f.read())
    cells, rgb = voxels_to_cells(size[0], voxels, palette)
    pos = (cells.astype(np.float32) / size[0]) * 2.0 - 1.0

    ref = CpuOctree(0)
    for i in range(cells.shape[0]):
        ref.put_in_voxel(pos[i], rgb[i], 3)

    ptrs, vals = native.build_leaves(
        pos, np.full(len(rgb), CHUNK_OFFSET, np.uint32), rgb, 3
    )
    np.testing.assert_array_equal(ptrs, ref.pointers)
    np.testing.assert_array_equal(vals, ref.values)


def test_rsvo_expansion_matches_python():
    from octree_tracer_tpu.io.rsvo import load_rsvo
    import struct

    top_level = 3
    masks = bytes([0b00000011, 0b00000101, 0b11111111, 0b1, 0b1, 0b1, 0b1, 0b1])
    head = b"\x00" * 16 + bytes([top_level]) + b"\x00" * 3
    counts = struct.pack("<IIII", 1, 2, 5, 0)
    data = head + counts + masks
    py = load_rsvo(data, 2)

    node_end = 1 + 2  # sum of level counts below depth 2
    ptrs, vals = native.load_rsvo_masks(
        np.frombuffer(masks, dtype=np.uint8), node_end
    )
    np.testing.assert_array_equal(ptrs, py.pointers)
    np.testing.assert_array_equal(vals, py.values)


def test_mip_tree_matches_python():
    from octree_tracer_tpu.world.world import World

    w = World(load_blocks=False)
    t = CpuOctree(0)
    t.put_in_voxel([0.9, 0.9, 0.9], pack_rgb(100, 0, 0), 3)
    t.put_in_voxel([0.9, 0.9, 0.1], pack_rgb(0, 0, 200), 3)
    t.put_in_voxel([-0.9, -0.9, -0.9], pack_rgb(10, 250, 10), 2)
    w.chunks[0] = t
    w.generate_mip_tree(0)

    vals2 = np.ascontiguousarray(
        np.where(t.pointers < CHUNK_OFFSET, 0, t.values).astype(np.uint32)
    )
    top = native.mip_tree(t.pointers, vals2)
    np.testing.assert_array_equal(vals2, t.values)
    assert top == int(t.top_mip)


def test_native_adaptive_matches_python_engine():
    """Full subdivision + collapse round trip via the native engine equals the
    Python engine's pool state."""
    from octree_tracer_tpu.adaptive import engine
    from octree_tracer_tpu.app import native_engine
    from octree_tracer_tpu.core import Octree
    from octree_tracer_tpu.world.world import World

    def make_world():
        world = World(load_blocks=False)
        chunk = CpuOctree(0)
        chunk.put_in_voxel([0.9, 0.9, 0.9], pack_rgb(200, 100, 50), 2)
        chunk.put_in_voxel([-0.9, 0.9, 0.9], pack_rgb(1, 2, 3), 3)
        world.chunks[0] = chunk
        world.generate_mip_tree(0)
        return world

    wa, wb = make_world(), make_world()
    oa = Octree(wa.chunks[0].get_node_mask(0))
    ob = Octree(wb.chunks[0].get_node_mask(0))

    cands = np.array([7, 3], dtype=np.int32)
    na = engine.process_subdivision(cands, oa, wa)
    nb, _ = native_engine.process_subdivision(cands, ob, wb)
    assert na == nb
    np.testing.assert_array_equal(oa.nodes, ob.nodes)
    np.testing.assert_array_equal(oa.positions, ob.positions)

    una = engine.process_unsubdivision(np.array([7], np.int32), oa, wa)
    unb, _ = native_engine.process_unsubdivision(np.array([7], np.int32), ob, wb)
    assert una == unb
    np.testing.assert_array_equal(oa.nodes, ob.nodes)
    assert oa.hole_stack == ob.hole_stack


def test_unsubdivision_missing_chunk_parity():
    """A collapse whose world path crosses a non-resident chunk must stamp an
    empty-black leaf in BOTH engines (the reference panics here,
    src/adaptive.rs:39; this rebuild degrades gracefully and identically)."""
    from octree_tracer_tpu.adaptive import engine
    from octree_tracer_tpu.app import native_engine
    from octree_tracer_tpu.core import Octree, VOXEL_OFFSET
    from octree_tracer_tpu.world.world import World

    def make_world():
        world = World(load_blocks=False)
        root = CpuOctree(0)
        # (+,+,+) child references generated chunk id CHUNK_OFFSET//2 + 3,
        # which is NOT resident (streamed out / evicted).
        root.put_in_block([0.9, 0.9, 0.9], int(CHUNK_OFFSET) // 2 + 3, 1)
        world.chunks[0] = root
        world.generate_mip_tree(0)
        return world

    def make_octree():
        o = Octree(make_world().chunks[0].get_node_mask(0))
        o.subdivide(7, [pack_rgb(9, 9, 9)] * 8, 2)  # streamed-in detail
        return o

    wa, wb = make_world(), make_world()
    oa, ob = make_octree(), make_octree()

    na = engine.process_unsubdivision(np.array([7], np.int32), oa, wa)
    nb, _ = native_engine.process_unsubdivision(
        np.array([7], np.int32), ob, wb
    )
    assert na == nb == 1
    np.testing.assert_array_equal(oa.nodes, ob.nodes)
    assert oa.hole_stack == ob.hole_stack
    # the collapsed node is stamped as the empty-black leaf, not left dangling
    assert oa.get_node(7) == int(VOXEL_OFFSET)


def test_build_dense_matches_level_build():
    """otc_build_dense over a 2-bit-packed grid must be bit-identical to the
    numpy level-synchronous build of the same occupied cells (the procedural
    generator's fast path)."""
    from octree_tracer_tpu.io.vox import build_octree_leaves

    rng = np.random.default_rng(11)
    for depth in (2, 3, 5):
        side = 1 << depth
        grid = rng.choice(
            np.array([0, 0, 0, 1, 3], dtype=np.uint8), size=(side, side, side)
        )
        flat = grid.reshape(-1, 16).astype(np.uint32)
        packed = (flat << (np.arange(16, dtype=np.uint32) * 2)).sum(
            axis=1, dtype=np.uint32
        )
        ptrs, vals = native.build_dense(packed, depth)

        occ = np.nonzero(grid)
        cells = np.stack(occ, axis=1).astype(np.uint32)
        blocks = grid[occ].astype(np.uint32)
        ref = build_octree_leaves(
            cells, CHUNK_OFFSET + blocks,
            np.zeros(blocks.shape[0], dtype=np.uint32), depth,
        )
        np.testing.assert_array_equal(ptrs, ref.pointers)
        np.testing.assert_array_equal(vals, ref.values)


def test_generate_chunk_native_matches_fallback(monkeypatch):
    """Procedural.generate_chunk's native packed path returns the same tree
    as the numpy fallback."""
    from octree_tracer_tpu.gen.procedural import Procedural

    proc = Procedural(chunk_depth=4)
    pos = np.array([-1.0, -1.0, -1.0], np.float32)
    fast = proc.generate_chunk(pos, 1)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    slow = proc.generate_chunk(pos, 1)
    assert (fast is None) == (slow is None)
    if fast is not None:
        np.testing.assert_array_equal(fast.pointers, slow.pointers)
        np.testing.assert_array_equal(fast.values, slow.values)


def test_stamp_leaves_matches_python_loop():
    """Native batch structure stamping is bit-identical to the Python
    put_in_block loop in the same insertion order."""
    import numpy as np

    from octree_tracer_tpu import native
    from octree_tracer_tpu.core.cpu_octree import CpuOctree
    from octree_tracer_tpu.core.voxel import CHUNK_OFFSET

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    depth, side = 5, 32

    def seed_tree():
        t = CpuOctree(0)
        for c in rng.integers(0, side, (40, 3)):
            t.put_in_block((c + 0.5) / side * 2 - 1, int(rng.integers(1, 8)),
                           depth)
        return t

    rng = np.random.default_rng(3)
    a = seed_tree()
    rng = np.random.default_rng(3)
    b = seed_tree()
    stamps = np.random.default_rng(5).integers(0, side, (60, 3))
    pos = ((stamps + 0.5) / side * 2 - 1).astype(np.float32)
    blocks = np.random.default_rng(6).integers(1, 8, 60).astype(np.uint32)
    # python loop
    for i in range(60):
        a.put_in_block(pos[i], int(blocks[i]), depth)
    # native batch
    new_p, new_v = native.stamp_leaves(
        b.pointers, b.values, pos, CHUNK_OFFSET + blocks,
        np.zeros(60, np.uint32), depth,
    )
    b.adopt_arrays(new_p, new_v)
    np.testing.assert_array_equal(a.pointers, b.pointers)
    np.testing.assert_array_equal(a.values, b.values)
    np.testing.assert_array_equal(a.to_words(), b.to_words())
