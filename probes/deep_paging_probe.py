#!/usr/bin/env python3
"""Deep-scene paging probe: deep10 bench scene, paged vs unpaged, on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu import native
from octree_tracer_tpu.core.cpu_octree import CpuOctree
from octree_tracer_tpu.core.voxel import CHUNK_OFFSET
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays
from octree_tracer_tpu.render.paging import build_pages

W, H = 1920, 1080
FRAMES = 3


def log(m):
    print(m, flush=True)


def deep_tree(depth=10):
    side = 1 << depth
    g = np.arange(side, dtype=np.float32)
    cx = (g + 0.5) / side * 2.0 - 1.0
    xs, ys = np.meshgrid(cx, cx, indexing="ij")
    rng2 = 0.9025 - xs * xs - ys * ys
    zs = np.sqrt(np.maximum(rng2, 0.0))
    keep = rng2 > 0
    cells = []
    for sign in (1.0, -1.0):
        zc = np.clip(((sign * zs + 1.0) * (side / 2.0)).astype(np.int64),
                     0, side - 1)
        cells.append(np.stack(
            [np.broadcast_to(np.arange(side), (side, side))[keep],
             np.broadcast_to(np.arange(side)[:, None], (side, side))[keep],
             zc[keep]], axis=1))
    cells = np.unique(np.concatenate(cells, axis=0), axis=0)
    pos = (cells.astype(np.float32) + 0.5) / side * 2.0 - 1.0
    rgb = ((cells[:, 0].astype(np.uint32) % 200 + 30) << 16
           | (cells[:, 1].astype(np.uint32) % 200 + 30) << 8
           | (cells[:, 2].astype(np.uint32) % 200 + 30))
    ptrs, vals = native.build_leaves(
        pos, np.full(cells.shape[0], CHUNK_OFFSET, np.uint32),
        rgb.astype(np.uint32), depth)
    return CpuOctree.from_arrays(ptrs, vals)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    t = deep_tree()
    words_np = t.to_words()
    log(f"deep10 nodes={len(t)} pool={words_np.nbytes/1e6:.1f} MB")
    _, ci = camera_matrices(
        np.array([0.2, 0.3, -2.4], np.float32),
        np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
    o2, d2 = generate_rays(ci, W, H)
    oj, dj = jnp.asarray(o2), jnp.asarray(d2)
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    def bench(tag, words, shadows, paged=None, oon=None):
        def frame():
            img, res, _ = tracer.render_frame(
                words, oj, dj, sun, shadows=shadows, mode="beam",
                paged=paged, paged_old_of_new=oon)
            return res.hit.sum()
        h0 = int(np.asarray(frame()))
        t0 = time.time()
        for _ in range(FRAMES):
            np.asarray(frame())
        dt = (time.time() - t0) / FRAMES
        log(f"{tag}: {dt*1e3:.1f} ms (hits {h0})")
        return dt

    if which in ("all", "base"):
        bench("unpaged primaries", jnp.asarray(words_np), False)
    for K in ([1, 2] if which == "all" else [int(which)] if which.isdigit()
              else []):
        t0 = time.time()
        pg = build_pages(words_np, levels=K)
        log(f"build_pages K={K}: {time.time()-t0:.1f}s n_pages={pg.n_pages} "
            f"page={pg.page_rows*32/1e6:.1f} MB top={pg.top_rows*32/1e6:.3f} MB "
            f"total={pg.words.nbytes/1e6:.1f} MB")
        wj = jnp.asarray(pg.words)
        oon = jnp.asarray(pg.old_of_new)
        geom = (pg.top_rows, pg.page_rows, pg.n_pages)
        bench(f"paged K={K} primaries", wj, False, geom, oon)
        bench(f"paged K={K} +shadows", wj, True, geom, oon)
    if which in ("all", "base"):
        bench("unpaged +shadows", jnp.asarray(words_np), True)


if __name__ == "__main__":
    main()
