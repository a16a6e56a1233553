"""Subtree paging (render/paging.py + tracer paged mode): the relayout must
preserve traversal semantics exactly, and the paged tracer must be
bit-identical to the plain wavefront modulo the slot remap.
"""

import numpy as np
import jax.numpy as jnp

from octree_tracer_tpu.core import CpuOctree
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import (
    camera_matrices,
    default_character,
    generate_rays,
)
from octree_tracer_tpu.render.paging import build_pages

SMALL = "/root/reference/files/small.vox"
RES = 32


def _deep_scene():
    rng = np.random.default_rng(9)
    t = CpuOctree(0)
    depth, side = 7, 1 << 7
    for c in rng.integers(0, side, (3000, 3)):
        p = c.astype(np.float32) / side * 2 - 1
        t.put_in_voxel(p, int(rng.integers(1, 1 << 24)), depth)
    return t.to_words()


def _rays(res=RES):
    pos, look = default_character()
    _, ci = camera_matrices(pos, look, 90.0, res, res)
    return generate_rays(ci, res, res)


def test_build_pages_structure():
    words = _deep_scene()
    pg = build_pages(words, levels=1)
    assert pg.n_pages >= 1
    assert pg.words.shape[0] == (pg.top_rows + pg.page_rows * pg.n_pages) * 8
    # Every reachable original slot appears exactly once in old_of_new.
    used = pg.old_of_new[pg.old_of_new >= 0]
    assert len(np.unique(used)) == len(used)
    # Root group relayouts to rows 0..7 of the top table.
    assert set(pg.old_of_new[:8]) == set(range(8))


def test_paged_trace_bit_identical():
    for words_np, levels in ((_deep_scene(), 1),
                             (load_file(SMALL).to_words(), 2)):
        o, d = _rays()
        flat = d.reshape(-1, 3)
        orig = jnp.broadcast_to(
            jnp.asarray(o).reshape(1, 3), (flat.shape[0], 3)
        )
        ref, _ = tracer.trace(jnp.asarray(words_np), orig, jnp.asarray(flat))

        pg = build_pages(words_np, levels=levels)
        res, _ = tracer.trace(
            jnp.asarray(pg.words), orig, jnp.asarray(flat),
            paged=(pg.top_rows, pg.page_rows, pg.n_pages),
        )
        old_idx = np.asarray(pg.old_of_new)[
            np.clip(np.asarray(res.index), 0, len(pg.old_of_new) - 1)
        ]
        remapped = np.where(np.asarray(res.index) >= 0,
                            old_idx, np.asarray(res.index))
        np.testing.assert_array_equal(np.asarray(ref.index), remapped)
        for fa, fb in zip(ref, res):
            if fa is ref.index:
                continue
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_paged_render_frame_beam_shadows():
    """Full paged beam frame (primary + shadows) equals the unpaged frame."""
    words_np = _deep_scene()
    o, d = _rays()
    sun = jnp.asarray(tracer.DEFAULT_SUN)
    a = tracer.render_frame(
        jnp.asarray(words_np), jnp.asarray(o), jnp.asarray(d), sun,
        shadows=True, mode="beam", beams=8,
    )
    pg = build_pages(words_np, levels=1)
    b = tracer.render_frame(
        jnp.asarray(pg.words), jnp.asarray(o), jnp.asarray(d), sun,
        shadows=True, mode="beam", beams=8,
        paged=(pg.top_rows, pg.page_rows, pg.n_pages),
        paged_old_of_new=jnp.asarray(pg.old_of_new),
    )
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    for fa, fb in zip(a[1], b[1]):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
