#!/usr/bin/env python3
"""A/B: shadow_seed (start each shadow ray at its primary hit's parent cell)
vs the beam-entry shadow pass, same-process interleaved (PERF.md measurement
rule). Scenes: monu10@1080p (small pool) and the deep-10 shell (big pool,
warp table) — the bench configurations."""

import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

W, H = 1920, 1080


def frame_fn(words, oj, dj, sun, seed, warp=None):
    def f():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=True, mode="beam", raw_result=True,
            u8_image=True, shadow_seed=seed, warp_table=warp,
        )
        return res.hit.sum()
    return f


def measure(tag, fa, fb, reps=4):
    ha = int(np.asarray(fa()))  # compile + warm
    hb = int(np.asarray(fb()))
    assert ha == hb, (tag, ha, hb)
    ta, tb = [], []
    for _ in range(reps):
        t0 = time.time(); np.asarray(fa()); ta.append(time.time() - t0)
        t0 = time.time(); np.asarray(fb()); tb.append(time.time() - t0)
    print(f"{tag}: noseed {np.median(ta)*1e3:.1f} ms  "
          f"seed {np.median(tb)*1e3:.1f} ms   (hits {ha})", flush=True)


def main():
    sun = jnp.asarray(tracer.DEFAULT_SUN)
    words = jnp.asarray(load_file("/root/reference/files/monu10.vox").to_words())
    pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
    look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
    _, ci = camera_matrices(pos, look, 70.0, W, H)
    o, d = generate_rays(ci, W, H)
    oj, dj = jnp.asarray(o), jnp.asarray(d)
    measure("monu10+shadows", frame_fn(words, oj, dj, sun, False),
            frame_fn(words, oj, dj, sun, True))

    # Deep shell via the bench builder
    import bench
    from octree_tracer_tpu import native
    from octree_tracer_tpu.core.cpu_octree import CpuOctree
    from octree_tracer_tpu.core.voxel import CHUNK_OFFSET
    depth = 10
    side = 1 << depth
    g = np.arange(side, dtype=np.float32)
    cx = (g + 0.5) / side * 2.0 - 1.0
    xs, ys = np.meshgrid(cx, cx, indexing="ij")
    rng2 = 0.9025 - xs * xs - ys * ys
    zs = np.sqrt(np.maximum(rng2, 0.0))
    keep = rng2 > 0
    cells = []
    for sign in (1.0, -1.0):
        zc = np.clip(((sign * zs + 1.0) * (side / 2.0)).astype(np.int64), 0, side - 1)
        cells.append(np.stack(
            [np.broadcast_to(np.arange(side), (side, side))[keep],
             np.broadcast_to(np.arange(side)[:, None], (side, side))[keep],
             zc[keep]], axis=1))
    cells = np.unique(np.concatenate(cells, axis=0), axis=0)
    posv = (cells.astype(np.float32) + 0.5) / side * 2.0 - 1.0
    rgb = ((cells[:, 0].astype(np.uint32) % 200 + 30) << 16
           | (cells[:, 1].astype(np.uint32) % 200 + 30) << 8
           | (cells[:, 2].astype(np.uint32) % 200 + 30))
    ptrs, vals = native.build_leaves(
        posv, np.full(cells.shape[0], CHUNK_OFFSET, np.uint32),
        rgb.astype(np.uint32), depth)
    dwords = jnp.asarray(CpuOctree.from_arrays(ptrs, vals).to_words())
    dwarp = tracer.build_warp_table(dwords, 6)
    _, ci2 = camera_matrices(
        np.array([0.2, 0.3, -2.4], np.float32),
        np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
    o2, d2 = generate_rays(ci2, W, H)
    o2j, d2j = jnp.asarray(o2), jnp.asarray(d2)
    measure("deep10+shadows(warp)",
            frame_fn(dwords, o2j, d2j, sun, False, warp=dwarp),
            frame_fn(dwords, o2j, d2j, sun, True, warp=dwarp), reps=3)


if __name__ == "__main__":
    main()
