"""Adaptive LOD: candidate selection (device) + subdivide/collapse (host)
(SURVEY.md §4.3)."""

import numpy as np
import jax.numpy as jnp

from octree_tracer_tpu.adaptive import (
    apply_patches,
    pad_patches,
    process_subdivision,
    process_unsubdivision,
    select_candidates,
)
from octree_tracer_tpu.core import (
    CHUNK_OFFSET,
    CpuOctree,
    Octree,
    VOXEL_OFFSET,
    interior_word,
    leaf_word,
    pack_rgb,
)
from octree_tracer_tpu.world.world import World


def test_select_candidates_rules():
    """Mirror of the scan rules (reference: src/compute.wgsl:35-46)."""
    words = np.zeros(16, dtype=np.uint32)
    words[0] = interior_word(8)            # interior, unvisited -> unsub
    words[1] = leaf_word(pack_rgb(1, 2, 3))  # filled leaf, hot -> sub
    words[2] = leaf_word(0)                # empty leaf: never a candidate
    words[3] = leaf_word(pack_rgb(9, 9, 9))  # filled leaf, 3 visits: too cold
    words[4] = interior_word(8)            # interior, visited -> not unsub
    # words[5] == 0: empty slot, skipped even though counter==0
    visits = np.zeros(16, dtype=np.int32)
    visits[1] = 4
    visits[2] = 10
    visits[3] = 3
    visits[4] = 1

    sub_idx, sub_n, unsub_idx, unsub_n = select_candidates(
        jnp.asarray(words), jnp.asarray(visits), jnp.int32(16),
        sub_cap=8, unsub_cap=8,
    )
    sub = [i for i in np.asarray(sub_idx).tolist() if i >= 0]
    unsub = [i for i in np.asarray(unsub_idx).tolist() if i >= 0]
    assert sub == [1]
    assert unsub == [0]
    assert int(sub_n) == 1 and int(unsub_n) == 1


def test_select_candidates_node_len_limit():
    words = np.full(16, leaf_word(pack_rgb(1, 1, 1)), dtype=np.uint32)
    visits = np.full(16, 5, dtype=np.int32)
    sub_idx, sub_n, _, _ = select_candidates(
        jnp.asarray(words), jnp.asarray(visits), jnp.int32(4),
        sub_cap=8, unsub_cap=8,
    )
    assert int(sub_n) == 4  # slots beyond node_len are ignored


def test_apply_patches_with_padding():
    words = jnp.zeros(8, dtype=jnp.uint32)
    idx, vals = pad_patches(
        np.array([2, 5], dtype=np.int32),
        np.array([7, 9], dtype=np.uint32),
        buckets=(4,),
    )
    assert idx.shape == (4,)
    out = np.asarray(apply_patches(words, jnp.asarray(idx), jnp.asarray(vals)))
    assert out[2] == 7 and out[5] == 9
    assert out.sum() == 16  # -1 padding dropped


def _tiny_world():
    """World with one root chunk: a depth-2 voxel at (+,+,+)/(+,+,+) and a
    depth-1 leaf elsewhere."""
    world = World(load_blocks=False)
    chunk = CpuOctree(0)
    chunk.put_in_voxel([0.9, 0.9, 0.9], pack_rgb(200, 100, 50), 2)
    chunk.put_in_voxel([0.9, 0.9, 0.1], pack_rgb(10, 20, 30), 2)
    world.chunks[0] = chunk
    world.generate_mip_tree(0)
    return world


def test_subdivision_applies_world_mask():
    world = _tiny_world()
    octree = Octree(world.chunks[0].get_node_mask(0))
    # GPU leaf 7 covers the (+,+,+) cell which has children in the world.
    applied = process_subdivision([7], octree, world)
    assert applied == 1
    assert len(octree) == 16
    assert octree.get_node(7) == 8  # now interior, points at new group
    # children carry the world's colours for that group
    _, depth, _ = octree.find_voxel([0.9, 0.9, 0.9])
    assert depth == 2
    idx, _, _ = octree.find_voxel([0.9, 0.9, 0.9])
    assert octree.get_node(idx) == int(VOXEL_OFFSET) + int(pack_rgb(200, 100, 50))


def test_subdivision_skips_doubleup():
    world = _tiny_world()
    octree = Octree(world.chunks[0].get_node_mask(0))
    assert process_subdivision([7, 7], octree, world) == 1  # second is a dup


def test_unsubdivision_restores_mip_colour():
    world = _tiny_world()
    octree = Octree(world.chunks[0].get_node_mask(0))
    process_subdivision([7], octree, world)
    applied = process_unsubdivision([7], octree, world)
    assert applied == 1
    assert octree.hole_stack == [8]
    # leaf colour = the world's mip colour for that node
    world_val = int(world.chunks[0].values[7])
    assert octree.get_node(7) == int(VOXEL_OFFSET) + world_val


def test_unsubdivision_skips_leaves():
    world = _tiny_world()
    octree = Octree(world.chunks[0].get_node_mask(0))
    assert process_unsubdivision([3], octree, world) == 0


def test_block_ref_subdivision():
    """A chunk-ref node subdivides from the referenced chunk's root
    (reference: src/adaptive.rs:49-53)."""
    world = World(load_blocks=False)
    block = CpuOctree(0)
    block.put_in_voxel([0.5, 0.5, 0.5], pack_rgb(77, 88, 99), 1)
    world.chunks[5] = block
    world.generate_mip_tree(5)

    root = CpuOctree(0)
    root.put_in_block([0.9, 0.9, 0.9], 5, 1)
    world.chunks[0] = root
    world.generate_mip_tree(0)

    octree = Octree(world.chunks[0].get_node_mask(0))
    applied = process_subdivision([7], octree, world)
    assert applied == 1
    idx, depth, _ = octree.find_voxel([0.9, 0.9, 0.9])
    assert depth == 2
    assert octree.get_node(idx) == int(VOXEL_OFFSET) + int(pack_rgb(77, 88, 99))


def test_select_candidates_rotating_offset():
    """Cap overflow must not starve high slots: the offset rotates the
    selection window (wrapping); without overflow the selected SET is
    offset-invariant."""
    import jax.numpy as jnp
    from octree_tracer_tpu.adaptive.feedback import select_candidates
    from octree_tracer_tpu.core.voxel import VOXEL_OFFSET

    n = 32
    words = np.zeros(n, dtype=np.uint32)
    hot = [3, 7, 12, 20, 28]
    for h in hot:
        words[h] = np.uint32((VOXEL_OFFSET + 5) << 4)  # filled leaves
    visits = np.zeros(n, dtype=np.int32)
    visits[hot] = 9

    def pick(cap, offset):
        si, sn, _, _ = select_candidates(
            jnp.asarray(words), jnp.asarray(visits), jnp.int32(n),
            sub_cap=cap, unsub_cap=4, offset=offset,
        )
        si = np.asarray(si)
        return sorted(si[si >= 0].tolist()), int(sn)

    # no overflow: same set at any offset
    base, sn = pick(8, 0)
    assert base == hot and sn == len(hot)
    for off in (1, 13, 29, 64):
        assert pick(8, off)[0] == hot

    # overflow (cap 2): windows rotate through ALL hot slots
    seen = set()
    for off in (0, 8, 16, 24):
        got, _ = pick(2, off)
        assert len(got) == 2
        seen.update(got)
    assert seen == set(hot)
    # wrapping: an offset just below the last hot slot picks it first,
    # then wraps to the lowest
    got, _ = pick(2, 21)
    assert got == [3, 28]
