"""Oracle tracer semantics: analytic single-voxel scenes plus regression
anchors on files/small.vox (SURVEY.md §4.2, BASELINE.md config 1)."""

import numpy as np

from octree_tracer_tpu.core import CpuOctree, pack_rgb
from octree_tracer_tpu.render.camera import (
    camera_matrices,
    default_character,
    generate_rays,
)
from octree_tracer_tpu.render.cpu_reference import render_frame, shade, trace_rays
from octree_tracer_tpu.io import load_file

SMALL = "/root/reference/files/small.vox"


def one_voxel_words():
    """Tree with a single filled voxel in cell (+,+,+) at depth 1."""
    t = CpuOctree(0)
    t.put_in_voxel([0.5, 0.5, 0.5], pack_rgb(100, 150, 200), 1)
    return t.to_words()


def test_axis_ray_hits_voxel():
    words = one_voxel_words()
    res = trace_rays(words, np.array([0.5, 0.5, -3.0]), np.array([[0.0, 0.0, 1.0]]))
    assert res["hit"][0] and not res["forced"][0]
    assert res["index"][0] == 7
    assert res["depth"][0] == 1
    np.testing.assert_allclose(res["normal"][0], [0, 0, -1])
    # entry at z=-1 (box face), first step crosses into the voxel at z=0
    assert res["steps"][0] >= 1


def test_ray_misses_box():
    words = one_voxel_words()
    res = trace_rays(words, np.array([5.0, 0.0, -3.0]), np.array([[0.0, 0.0, 1.0]]))
    assert not res["hit"][0]


def test_ray_through_empty_cells_exits():
    words = one_voxel_words()
    res = trace_rays(words, np.array([-0.5, -0.5, -3.0]), np.array([[0.0, 0.0, 1.0]]))
    assert not res["hit"][0]
    assert res["steps"][0] >= 1


def test_ray_starting_inside():
    words = one_voxel_words()
    res = trace_rays(words, np.array([0.2, 0.2, 0.2]), np.array([[1.0, 0.0, 0.0]]))
    assert res["hit"][0]
    assert res["index"][0] == 7


def test_per_ray_origins():
    words = one_voxel_words()
    origins = np.array([[0.5, 0.5, -3.0], [-0.5, -0.5, -3.0]], dtype=np.float32)
    dirs = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], dtype=np.float32)
    res = trace_rays(words, origins, dirs)
    assert res["hit"][0] and not res["hit"][1]


def test_visit_counts():
    words = one_voxel_words()
    visits = np.zeros(words.shape[0], dtype=np.int64)
    trace_rays(
        words, np.array([0.5, 0.5, -3.0]), np.array([[0.0, 0.0, 1.0]]), visits=visits
    )
    assert visits[7] == 1  # the hit voxel is visited exactly once
    assert visits.sum() >= 2  # plus the empty cells stepped through


def test_shading_values():
    words = one_voxel_words()
    res = trace_rays(words, np.array([0.5, 0.5, -3.0]), np.array([[0.0, 0.0, 1.0]]))
    img = shade(words, res, sun_dir=(0.0, 0.0, 1.0), shadows=False)
    # normal (0,0,-1), sun +z -> diffuse = dot(n, -sun) = 1; colour*(0.3+1)
    base = np.array([100, 150, 200], dtype=np.float32) / 255.0
    expect = np.clip(1.3 * base, 0, 1) ** np.float32(2.2)
    np.testing.assert_allclose(img[0], expect, rtol=1e-5)


def test_miss_shades_grey():
    words = one_voxel_words()
    res = trace_rays(words, np.array([5.0, 0.0, -3.0]), np.array([[0.0, 0.0, 1.0]]))
    img = shade(words, res)
    np.testing.assert_allclose(img[0], np.float32(0.2) ** np.float32(2.2), rtol=1e-5)


def test_small_vox_regression():
    """Fixed-camera 128x128 frame of files/small.vox: anchored hit statistics.

    These goldens were produced by this oracle and pin the traversal semantics;
    the TPU tracer must reproduce them bit-exactly (BASELINE.md config 1)."""
    words = load_file(SMALL).to_words()
    pos, look = default_character()
    _, cam_inv = camera_matrices(pos, look, 90.0, 128, 128)
    origin, dirs = generate_rays(cam_inv, 128, 128)
    img, res, visits = render_frame(words, origin, dirs, with_visits=True)
    assert img.shape == (128, 128, 3)
    assert int(res["hit"].sum()) == 6605
    assert int(res["forced"].sum()) == 1
    assert int(res["steps"].max()) <= 101
    assert visits is not None and visits.max() > 0
