"""Free-space skip fields (render/skip.py) + combined warp+skip traversal.

The conservativeness contract is what makes skip hit-exact: every stored
cube must be provably empty. These tests brute-force that against dense
rasterizations, then pin the traversal equalities (hit/index/pos/normal
identical to the plain march; steps become a lower bound; the forced-cap
set can only shrink)."""

import numpy as np
import jax.numpy as jnp
import pytest

from octree_tracer_tpu.core import CpuOctree, pack_rgb
from octree_tracer_tpu.core.voxel import VOXEL_OFFSET
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays
from octree_tracer_tpu.render.skip import (
    SKIP_CAP,
    build_skip_field,
    build_warp_skip_table,
    decode_skip,
    encode_skip,
    occupancy_from_pool,
)

SMALL = "/root/reference/files/small.vox"


def _occupancy_brute(words: np.ndarray, L: int) -> np.ndarray:
    """Dense occupancy by walking the tree on the host."""
    side = 1 << L
    occ = np.zeros((side, side, side), dtype=bool)

    def rec(group, cx, cy, cz, depth):
        for c in range(8):
            payload = int(words[group + c]) >> 4
            x = cx * 2 + ((c >> 2) & 1)
            y = cy * 2 + ((c >> 1) & 1)
            z = cz * 2 + (c & 1)
            if payload > VOXEL_OFFSET or (
                payload < VOXEL_OFFSET and depth >= L
            ):
                s = L - depth
                w = 1 << s
                occ[x << s: (x << s) + w, y << s: (y << s) + w,
                    z << s: (z << s) + w] = True
            elif payload < VOXEL_OFFSET and depth < L:
                rec(payload, x, y, z, depth + 1)

    rec(0, 0, 0, 0, 1)
    return occ


def test_encode_decode_codebook():
    v = jnp.arange(16, dtype=jnp.uint32)
    b = np.asarray(decode_skip(v))
    assert list(b) == list(range(13)) + [16, 24, 32]
    # floor-quantization: decode(encode(x)) <= x, and exact on codebook values
    xs = jnp.arange(0, 64, dtype=jnp.int32)
    back = np.asarray(decode_skip(encode_skip(xs)))
    assert (back <= np.minimum(np.asarray(xs), SKIP_CAP)).all()
    for cb in list(range(13)) + [16, 24, 32]:
        assert back[cb] == cb


def test_occupancy_exact_vs_brute_force():
    words = jnp.asarray(load_file(SMALL).to_words())
    for L in (3, 4, 5):
        got = np.asarray(occupancy_from_pool(words, L)).reshape((1 << L,) * 3)
        want = _occupancy_brute(np.asarray(words), L)
        np.testing.assert_array_equal(got, want)


def test_skip_field_cubes_are_empty():
    """Every stored (cell, octant) cube must contain zero occupied cells —
    the invariant that makes skipping hit-exact. Also: the field is not
    degenerate (some cell stores a multi-cell cube)."""
    words = jnp.asarray(load_file(SMALL).to_words())
    L = 4
    side = 1 << L
    occ = _occupancy_brute(np.asarray(words), L)
    field = np.asarray(build_skip_field(words, L)).reshape(side, side, side)
    some_big = False
    for oct_ in range(8):
        sx = 1 if (oct_ >> 2) & 1 else -1
        sy = 1 if (oct_ >> 1) & 1 else -1
        sz = 1 if oct_ & 1 else -1
        nib = (field >> (4 * oct_)) & 15
        b = np.where(nib <= 12, nib, (nib - 11) * 8)
        some_big |= bool((b > 1).any())
        for x in range(side):
            for y in range(side):
                for z in range(side):
                    k = int(b[x, y, z])
                    if k == 0:
                        continue
                    xs = slice(x, x + k) if sx > 0 else slice(
                        max(0, x - k + 1), x + 1)
                    ys = slice(y, y + k) if sy > 0 else slice(
                        max(0, y - k + 1), y + 1)
                    zs = slice(z, z + k) if sz > 0 else slice(
                        max(0, z - k + 1), z + 1)
                    assert not occ[xs, ys, zs].any(), (
                        f"cube at {(x, y, z)} oct {oct_} size {k} not empty"
                    )
    assert some_big


def test_occupied_cells_store_zero():
    words = jnp.asarray(load_file(SMALL).to_words())
    L = 4
    occ = np.asarray(occupancy_from_pool(words, L))
    field = np.asarray(build_skip_field(words, L))
    assert (field[occ] == 0).all()


def _camera_rays(w=96, h=96):
    pos = np.array([0.4, 0.6, -2.2], np.float32)
    look = np.array([-0.2, -0.35, 1.0], np.float32)
    _, ci = camera_matrices(pos, look, 70.0, w, h)
    o, d = generate_rays(ci, w, h)
    d = d.reshape(-1, 3)
    o = np.broadcast_to(o.reshape(1, 3), d.shape)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.quick
def test_skip_trace_hit_exact():
    """trace / trace_staged with a combined warp+skip table: hit, index,
    hit_pos, normal and depth bit-identical to the plain march on every ray
    neither run forces at the step cap; steps become a lower bound; the
    forced set can only shrink (each skip covers >= 1 reference step)."""
    words = jnp.asarray(load_file(SMALL).to_words())
    tbl = build_warp_skip_table(words, 5)
    assert tracer.warp_table_levels(tbl) == 5
    assert tracer.warp_table_combined(tbl)
    o, d = _camera_rays()
    plain, _ = tracer.trace(words, o, d)
    for runner in (
        lambda: tracer.trace(words, o, d, warp_table=tbl),
        lambda: tracer.trace_staged(
            words, o, d, warp_table=tbl, warp_in_body=True
        ),
    ):
        sk, _ = runner()
        hp = np.asarray(plain.hit)
        hs = np.asarray(sk.hit)
        fp, fs = np.asarray(plain.forced), np.asarray(sk.forced)
        assert set(np.nonzero(fs)[0]) <= set(np.nonzero(fp)[0])
        cmp = ~(fp | fs)
        np.testing.assert_array_equal(hs[cmp], hp[cmp])
        ok = cmp & hp
        np.testing.assert_array_equal(
            np.asarray(sk.index)[ok], np.asarray(plain.index)[ok]
        )
        np.testing.assert_array_equal(
            np.asarray(sk.hit_pos)[ok], np.asarray(plain.hit_pos)[ok]
        )
        np.testing.assert_array_equal(
            np.asarray(sk.normal)[ok], np.asarray(plain.normal)[ok]
        )
        np.testing.assert_array_equal(
            np.asarray(sk.depth)[ok], np.asarray(plain.depth)[ok]
        )
        assert (np.asarray(sk.steps)[ok] <= np.asarray(plain.steps)[ok]).all()
        # the table actually shortens something on this scene
        assert np.asarray(sk.steps)[ok].sum() < np.asarray(
            plain.steps)[ok].sum()


def test_skip_across_sparse_scene():
    """A scene with two distant voxels: rays between them must cross the gap
    in far fewer steps, and still land exactly."""
    chunk = CpuOctree(0)
    chunk.put_in_voxel([-0.95, -0.95, -0.95], pack_rgb(200, 10, 10), 5)
    chunk.put_in_voxel([0.95, 0.95, 0.95], pack_rgb(10, 200, 10), 5)
    words = jnp.asarray(chunk.to_words())
    tbl = build_warp_skip_table(words, 5)
    # ray crossing the whole scene along +x at the far voxel's (y, z): it
    # misses the near voxel and traverses the gap's cell decomposition
    o = jnp.asarray(np.array([[-2.0, 0.95, 0.951]], np.float32))
    d = jnp.asarray(np.array([[1.0, 1e-4, 1e-4]], np.float32))
    plain, _ = tracer.trace(words, o, d)
    sk, _ = tracer.trace(words, o, d, warp_table=tbl)
    assert bool(plain.hit[0]) and bool(sk.hit[0])
    assert int(plain.index[0]) == int(sk.index[0])
    np.testing.assert_array_equal(
        np.asarray(plain.hit_pos), np.asarray(sk.hit_pos)
    )
    assert int(sk.steps[0]) < int(plain.steps[0])


def test_render_frame_with_combined_table_identical_image():
    """Full frame (beam mode + shadows) with the combined table: the image
    must be bit-identical to the plain frame (shading reads hit/normal/word,
    all exact under skip; steps differences only affect show_steps)."""
    words = jnp.asarray(load_file(SMALL).to_words())
    tbl = build_warp_skip_table(words, 5)
    pos = np.array([0.4, 0.6, -2.2], np.float32)
    look = np.array([-0.2, -0.35, 1.0], np.float32)
    _, ci = camera_matrices(pos, look, 70.0, 64, 64)
    o, d = generate_rays(ci, 64, 64)
    oj = jnp.asarray(o)
    dj = jnp.asarray(d).reshape(64, 64, 3)
    sun = jnp.asarray(tracer.DEFAULT_SUN)
    img_a, res_a, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=True, mode="beam"
    )
    img_b, res_b, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=True, mode="beam", warp_table=tbl
    )
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
