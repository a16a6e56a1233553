"""Auxiliary subsystems: debug views, shader math helpers, structures, timing
(SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from octree_tracer_tpu.core import CHUNK_OFFSET, CpuOctree, pack_rgb
from octree_tracer_tpu.gen.noise import hash_rand, rotate, rotate_x, rotate_y, rotate_z
from octree_tracer_tpu.gen.structures import (
    load_structure_file,
    scatter_trees,
    stamp_structure,
)
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import (
    camera_matrices,
    default_character,
    generate_rays,
)
from octree_tracer_tpu.utils import FrameTimer, timed

SMALL = "/root/reference/files/small.vox"


def _frame(**kw):
    words = jnp.asarray(load_file(SMALL).to_words())
    pos, look = default_character()
    _, ci = camera_matrices(pos, look, 90.0, 32, 32)
    o, d = generate_rays(ci, 32, 32)
    return tracer.render_frame(
        words, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tracer.DEFAULT_SUN),
        tile_size=None, **kw,
    )


def test_show_steps_view():
    img, res, _ = _frame(show_steps=True)
    img = np.asarray(img)
    # grayscale; step counts produce a non-flat heatmap
    assert np.allclose(img[..., 0], img[..., 1])
    assert img.std() > 0


def test_show_hits_view():
    img, res, visits = _frame(show_hits=True)
    img = np.asarray(img)
    assert visits is not None
    assert np.allclose(img[..., 0], img[..., 2])
    hits = np.asarray(res.hit).reshape(32, 32)
    # hit pixels show counter/15 > 0; miss pixels are black
    assert img[hits].max() > 0
    assert np.allclose(img[~hits], 0.0)


def test_rotation_helpers():
    v = jnp.asarray(np.array([[1.0, 0.0, 0.0]], np.float32))
    out = np.asarray(rotate_z(v, jnp.float32(np.pi / 2)))
    np.testing.assert_allclose(out, [[0, 1, 0]], atol=1e-6)
    out = np.asarray(rotate_y(v, jnp.float32(np.pi / 2)))
    np.testing.assert_allclose(out, [[0, 0, -1]], atol=1e-6)
    vy = jnp.asarray(np.array([[0.0, 1.0, 0.0]], np.float32))
    out = np.asarray(rotate_x(vy, jnp.float32(np.pi / 2)))
    np.testing.assert_allclose(out, [[0, 0, 1]], atol=1e-6)
    # arbitrary-axis agrees with the dedicated helper
    out1 = np.asarray(rotate(v, jnp.asarray([0.0, 0.0, 1.0]), jnp.float32(0.3)))
    out2 = np.asarray(rotate_z(v, jnp.float32(0.3)))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_hash_rand_range():
    pts = jnp.asarray(np.random.default_rng(0).uniform(0, 10, (100, 2)))
    r = np.asarray(hash_rand(pts))
    assert np.all((r >= 0) & (r < 1))


def test_load_structure_file():
    offsets, blocks = load_structure_file("tree")
    assert offsets.shape[1] == 3
    assert offsets.shape[0] > 0
    assert np.all(blocks >= 1)


def test_stamp_structure():
    chunk = CpuOctree(0)
    offsets = np.array([[0, 0, 0], [0, 1, 0]], dtype=np.int32)
    blocks = np.array([4, 5], dtype=np.uint32)
    placed = stamp_structure(chunk, [-0.5, -0.5, -0.5], offsets, blocks, 3)
    assert placed == 2
    idx, depth, _ = chunk.find_voxel([-0.5, -0.5, -0.5])
    assert depth == 3
    assert chunk.pointers[idx] == CHUNK_OFFSET + 4


def test_scatter_trees():
    chunk = CpuOctree(0)
    cells = np.array([[10, 10, 10], [40, 10, 40]], dtype=np.int64)
    total = scatter_trees(chunk, cells, depth=6, probability=1.0)
    assert total > 0
    refs = chunk.pointers[chunk.pointers > CHUNK_OFFSET] - CHUNK_OFFSET
    assert len(refs) > 0


def test_frame_timer():
    t = FrameTimer(window=4)
    assert t.tick() == 0.0
    for _ in range(5):
        fps = t.tick()
    assert fps > 0
    assert t.fps > 0


def test_timed(capsys):
    with timed("block"):
        pass
    assert "block" in capsys.readouterr().out


def test_misc_bool_gamma_and_descent():
    """misc_bool switches gamma to 1.0 and descent to >= (reference:
    src/shader.wgsl:138-150, 304)."""
    img0, res0, _ = _frame()
    img1, res1, _ = _frame(misc_bool=True)
    img0, img1 = np.asarray(img0), np.asarray(img1)
    # same hit silhouette up to knife edges, different tone curve
    hits_match = (np.asarray(res0.hit) == np.asarray(res1.hit)).mean()
    assert hits_match > 0.99
    miss = ~np.asarray(res0.hit).reshape(32, 32) & ~np.asarray(res1.hit).reshape(32, 32)
    # miss pixels: 0.2**2.2 vs 0.2**1.0
    assert np.allclose(img0[miss], 0.2 ** 2.2, atol=1e-5)
    assert np.allclose(img1[miss], 0.2, atol=1e-5)
