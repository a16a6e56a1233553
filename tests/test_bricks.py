"""Brick-map DDA (render/bricks.py): builder correctness and the exactness
contract — brick-mode traversal must be *bit-identical* to the plain wavefront
in every output, and preserve the adaptive visit invariants (filled-leaf
counts exact, interior zero-set exact) under ``with_visits``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from octree_tracer_tpu.core import CpuOctree, pack_rgb
from octree_tracer_tpu.core.voxel import VOXEL_OFFSET
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import cpu_reference as oracle
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.bricks import build_bricks, build_bricks_np
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

SMALL = "/root/reference/files/small.vox"
RES = 64


@pytest.fixture(scope="module")
def scene():
    words_np = load_file(SMALL).to_words()
    pos = np.array([0.1, 0.2, -1.5], dtype=np.float32)
    look = np.array([0.0, 0.0, 1.0], dtype=np.float32)
    _, ci = camera_matrices(pos, look, 90.0, RES, RES)
    o, d = generate_rays(ci, RES, RES)
    return words_np, o, d


def _filled_interior(words_np):
    pay = words_np >> 4
    return pay > VOXEL_OFFSET, pay < VOXEL_OFFSET


def test_builder_hand_tree():
    """A depth-2 tree: every occupied interior node of height <= 2 gets a
    valid brick whose occupancy/coarse-leaf bits match direct tree queries."""
    t = CpuOctree(0)
    # depth 3: the (+,+,+) root child has height exactly 2 (fine leaf at its
    # grandchild level).
    t.put_in_voxel([0.9, 0.9, 0.9], pack_rgb(1, 2, 3), 3)
    t.put_in_voxel([-0.9, -0.9, -0.9], pack_rgb(4, 5, 6), 1)  # coarse leaf
    words = t.to_words()
    wd, br = build_bricks_np(words)
    pay = words >> 4
    # No node word's payload changed by decoration.
    np.testing.assert_array_equal(pay, wd >> 4)
    # The root-child covering (+,+,+) is interior with a filled grandchild:
    # it must be a valid brick root.
    root_child = 7  # strict '>' octant code for (+,+,+) is 4+2+1
    assert (wd[root_child] & 1) == 1
    row = br[root_child]
    assert row[0] & 1 == 1
    cgroup = pay[root_child]
    assert row[3] == cgroup
    # voxel at [0.9]^3 is child 7 / grandchild 7 -> occupancy bit 63.
    assert (row[2] >> 31) & 1 == 1
    assert bin(row[1]).count("1") + bin(row[2]).count("1") == 1
    # child 7 of this brick root is interior -> coarse-leaf bit clear; all
    # other children are (empty) leaves -> set.
    for c in range(8):
        expect = 0 if c == 7 else 1
        assert (row[0] >> (c + 1)) & 1 == expect
    # the coarse leaf at depth 1 is a leaf at the root level: roots have no
    # brick rows for leaves.
    assert (wd[0] & 1) == 0


def test_builder_jax_matches_numpy(scene):
    words_np, _, _ = scene
    wd_np, br_np = build_bricks_np(words_np)
    wd_j, br_j = build_bricks(jnp.asarray(words_np))
    np.testing.assert_array_equal(wd_np, np.asarray(wd_j))
    np.testing.assert_array_equal(br_np, np.asarray(br_j))


@pytest.mark.parametrize("strict", [True, False])
def test_trace_bit_identical(scene, strict):
    words_np, o, d = scene
    flat = d.reshape(-1, 3)
    orig = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (flat.shape[0], 3))
    words = jnp.asarray(words_np)
    wd, br = build_bricks(words)
    a, va = tracer.trace(
        words, orig, jnp.asarray(flat), with_visits=True,
        strict_descent=strict,
    )
    for k in (1, 2, 4, 7):
        b, vb = tracer.trace(
            wd, orig, jnp.asarray(flat), with_visits=True,
            strict_descent=strict, bricks=br, brick_k=k,
        )
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
        filled, interior = _filled_interior(words_np)
        va_n, vb_n = np.asarray(va), np.asarray(vb)
        np.testing.assert_array_equal(va_n[filled], vb_n[filled])
        np.testing.assert_array_equal(
            va_n[interior] == 0, vb_n[interior] == 0
        )


def test_staged_and_beam_frames_bit_identical(scene):
    words_np, o, d = scene
    words = jnp.asarray(words_np)
    wd, br = build_bricks(words)
    base = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(tracer.DEFAULT_SUN))
    a = tracer.render_frame(
        words, *base, shadows=True, with_visits=True, tile_size=None
    )
    filled, interior = _filled_interior(words_np)
    for mode in ("staged", "beam"):
        b = tracer.render_frame(
            wd, *base, shadows=True, with_visits=True, mode=mode,
            bricks=br, brick_k=3,
        )
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        for fa, fb in zip(a[1], b[1]):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
        va, vb = np.asarray(a[2]), np.asarray(b[2])
        np.testing.assert_array_equal(va[filled], vb[filled])
        np.testing.assert_array_equal(va[interior] == 0, vb[interior] == 0)


def test_forced_cap_and_oob_paths():
    """Step-cap (forced red) and out-of-bounds exits must round through the
    brick DDA identically: a dense low-depth slab forces long marches."""
    t = CpuOctree(0)
    rng = np.random.default_rng(3)
    side = 16
    for c in rng.integers(0, side, (500, 3)):
        p = c.astype(np.float32) / side * 2 - 1
        t.put_in_voxel(p, int(rng.integers(1, 1 << 24)), 4)
    words_np = t.to_words()
    words = jnp.asarray(words_np)
    wd, br = build_bricks(words)
    n = 512
    origins = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # max_steps=6 forces plenty of cap hits mid-march.
    a, _ = tracer.trace(
        words, jnp.asarray(origins), jnp.asarray(dirs), max_steps=6
    )
    b, _ = tracer.trace(
        wd, jnp.asarray(origins), jnp.asarray(dirs), max_steps=6,
        bricks=br, brick_k=4,
    )
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
    assert bool(np.asarray(b.forced).any())  # the cap path was exercised


def test_fuzz_random_trees():
    """Random trees x random rays: brick path vs plain path, bit-identical
    (the plain path itself carries the knife-edge budget vs the oracle)."""
    rng = np.random.default_rng(23)
    for depth, voxels in [(2, 12), (3, 80), (5, 400), (6, 900)]:
        t = CpuOctree(0)
        side = 1 << depth
        for c in rng.integers(0, side, (voxels, 3)):
            p = c.astype(np.float32) / side * 2 - 1
            t.put_in_voxel(p, int(rng.integers(1, 1 << 24)), depth)
        words_np = t.to_words()
        words = jnp.asarray(words_np)
        wd, br = build_bricks(words)
        n = 512
        origins = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        dirs = rng.normal(size=(n, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        a, va = tracer.trace(
            words, jnp.asarray(origins), jnp.asarray(dirs), with_visits=True
        )
        b, vb = tracer.trace(
            wd, jnp.asarray(origins), jnp.asarray(dirs), with_visits=True,
            bricks=br, brick_k=4,
        )
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
        filled, interior = _filled_interior(words_np)
        va_n, vb_n = np.asarray(va), np.asarray(vb)
        np.testing.assert_array_equal(va_n[filled], vb_n[filled])
        np.testing.assert_array_equal(
            va_n[interior] == 0, vb_n[interior] == 0
        )


def test_oracle_agreement(scene):
    """End-to-end sanity: brick-mode results agree with the NumPy oracle
    within the knife-edge budget (same contract as the plain tracer)."""
    words_np, o, d = scene
    flat = d.reshape(-1, 3)
    res_o = oracle.trace_rays(words_np, o, flat)
    words = jnp.asarray(words_np)
    wd, br = build_bricks(words)
    orig = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (flat.shape[0], 3))
    res_t, _ = tracer.trace(wd, orig, jnp.asarray(flat), bricks=br)
    agree = (
        (res_o["hit"] == np.asarray(res_t.hit))
        & (res_o["index"] == np.asarray(res_t.index))
        & (res_o["steps"] == np.asarray(res_t.steps))
        & (res_o["depth"] == np.asarray(res_t.depth))
        & np.all(res_o["normal"] == np.asarray(res_t.normal), axis=-1)
    )
    assert (~agree).mean() < 0.005


def test_holes_not_decorated():
    """Free-list holes are word==0 but decode as interior payload 0; they
    must not be marked valid brick roots (ADVICE round 2)."""
    words_np = load_file("/root/reference/files/small.vox").to_words()
    # Punch a hole: zero one full group (any group but the root's).
    words_np = words_np.copy()
    words_np[8:16] = 0
    wd_np, br_np = build_bricks_np(words_np)
    assert not (wd_np[8:16] & 1).any()
    assert not br_np[8:16].any()
    wd_j, br_j = build_bricks(jnp.asarray(words_np))
    np.testing.assert_array_equal(wd_np, np.asarray(wd_j))
    np.testing.assert_array_equal(br_np, np.asarray(br_j))
