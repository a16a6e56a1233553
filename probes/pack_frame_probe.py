#!/usr/bin/env python3
"""Frame-level A/B for pack9 (72-wide packed pool rows): deep10 bench frame
(+shadows, warp, ladder) and phantom_mansion primaries, pack on/off, plus
the interplay combos the big-pool defaults were tuned around (fuse_sibling,
warp) — packing makes big-pool gathers cheap again, so those trades may
invert. Same-process interleaved timings (PERF.md measurement rule)."""

import sys
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

W, H = 1920, 1080


def deep_scene():
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
        zc = np.clip(((sign * zs + 1.0) * (side / 2.0)).astype(np.int64),
                     0, side - 1)
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
    return jnp.asarray(CpuOctree.from_arrays(ptrs, vals).to_words())


def measure(tag, fns, reps=3):
    hits = [int(np.asarray(f())) for f in fns.values()]  # compile + warm
    assert len(set(hits)) == 1, (tag, dict(zip(fns, hits)))
    ts = {k: [] for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.time(); np.asarray(f()); ts[k].append(time.time() - t0)
    print(f"{tag}: " + "  ".join(
        f"{k}={np.median(v)*1e3:.1f}ms" for k, v in ts.items()),
        f"(hits {hits[0]})", flush=True)


def main():
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    # phantom primaries (auto: pack ON at 1.13M words)
    pw = jnp.asarray(load_file(
        "/root/reference/files/phantom_mansion.vox").to_words())
    pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
    look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
    _, ci = camera_matrices(pos, look, 70.0, W, H)
    o, d = generate_rays(ci, W, H)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    def pf(pack):
        def f():
            img, res, _ = tracer.render_frame(
                pw, oj, dj, sun, shadows=False, mode="beam",
                raw_result=True, u8_image=True, pack_pool=pack)
            return res.hit.sum()
        return f

    measure("phantom primaries", {"plain": pf(False), "pack": pf(True)})

    # deep10 bench frame (+shadows, warp table)
    dwords = deep_scene()
    dwarp = tracer.build_warp_table(dwords, 6)
    _, ci2 = camera_matrices(
        np.array([0.2, 0.3, -2.4], np.float32),
        np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
    o2, d2 = generate_rays(ci2, W, H)
    o2j, d2j = jnp.asarray(o2), jnp.asarray(d2)

    def df(pack, warp=True, fuse=None):
        kw = dict(warp_table=dwarp) if warp else {}
        def f():
            img, res, _ = tracer.render_frame(
                d2j_words, o2j, d2j, sun, shadows=True, mode="beam",
                raw_result=True, u8_image=True, pack_pool=pack, **kw)
            return res.hit.sum()
        return f

    d2j_words = dwords

    measure("deep10+shadows (warp)",
            {"plain": df(False), "pack": df(True)})
    measure("deep10+shadows (pack: warp interplay)",
            {"pack_warp": df(True, warp=True),
             "pack_nowarp": df(True, warp=False)})


if __name__ == "__main__":
    main()
