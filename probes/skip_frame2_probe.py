"""TPU A/B part 2: combined warp+skip on the remaining bench rows —
monu10 with_shadows + primaries burst, and the deep10 synthetic shell.

Interleaved same-process medians, scalar-synced (CLAUDE.md rules).
Part 1 (skip_frame_probe.py, 2026-08-20): 1080p primaries vs best-current
config — monu10 102.0 vs 111.6 (1.09x), monu9 250.5 vs 357.6 (1.43x),
phantom 305.0 vs 394.3 (1.29x), defualt 273.0 vs 463.0 (1.70x).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp  # noqa: E402

from octree_tracer_tpu.io import load_file  # noqa: E402
from octree_tracer_tpu.render import tracer  # noqa: E402
from octree_tracer_tpu.render.camera import (  # noqa: E402
    camera_matrices,
    generate_rays,
    generate_rays_device,
)
from octree_tracer_tpu.render.skip import build_warp_skip_table  # noqa: E402

W, H = 1920, 1080
BURST = 4


def ab(name, fns, reps=4):
    ts = {k: [] for k in fns}
    for k, f in fns.items():
        float(np.asarray(f()))  # compile/warm
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.time()
            float(np.asarray(f()))
            ts[k].append((time.time() - t0) * 1e3)
    meds = {k: np.median(v) for k, v in ts.items()}
    base = list(meds.values())[0]
    for k, m in meds.items():
        print(f"  {name} {k:6s}: {m:7.1f} ms (min {min(ts[k]):7.1f}) "
              f"x{base/m:4.2f}", flush=True)


def main():
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    # --- monu10: shadows + burst --------------------------------------------
    words = jnp.asarray(load_file("/root/reference/files/monu10.vox").to_words())
    t0 = time.time()
    skip7 = build_warp_skip_table(words, 7)
    np.asarray(skip7[:1])
    print(f"monu10 skip7 build {time.time()-t0:.2f}s", flush=True)
    _, ci = camera_matrices(np.array([0.4, 0.6, -2.2], np.float32),
                            np.array([-0.2, -0.35, 1.0], np.float32),
                            70.0, W, H)
    o, d = generate_rays(ci, W, H)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    def shadow_frame(tbl):
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=True, mode="beam",
            raw_result=True, u8_image=True, warp_table=tbl,
        )
        return res.hit.sum()

    ab("m10 shadows", {
        "none": jax.jit(lambda: shadow_frame(None)),
        "skip7": jax.jit(lambda: shadow_frame(skip7)),
    })

    # primaries burst (the bench headline path)
    stack = []
    for k in range(BURST):
        _, cik = camera_matrices(
            np.array([0.4 + 0.03 * k, 0.6, -2.2 - 0.02 * k], np.float32),
            np.array([-0.2 + 0.02 * k, -0.35 + 0.005 * k, 1.0], np.float32),
            70.0, W, H)
        stack.append(cik)
    stack = jnp.asarray(np.stack(stack))

    def burst(tbl):
        def one(ci2):
            o1, d1 = generate_rays_device(ci2, W, H, block_major=8)
            img, res, _ = tracer.render_frame(
                words, o1, d1.reshape(H, W, 3), sun, shadows=False,
                mode="beam", raw_result=True, u8_image=True,
                pre_permuted=True, warp_table=tbl,
            )
            return res.hit.sum()
        return jax.lax.map(one, stack).sum()

    ab("m10 burst4", {
        "none": jax.jit(lambda: burst(None)),
        "skip7": jax.jit(lambda: burst(skip7)),
    })

    # --- deep10 shell + shadows ---------------------------------------------
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
    pos = (cells.astype(np.float32) + 0.5) / side * 2.0 - 1.0
    rgb = ((cells[:, 0].astype(np.uint32) % 200 + 30) << 16
           | (cells[:, 1].astype(np.uint32) % 200 + 30) << 8
           | (cells[:, 2].astype(np.uint32) % 200 + 30))
    ptrs, vals = native.build_leaves(
        pos, np.full(cells.shape[0], CHUNK_OFFSET, np.uint32),
        rgb.astype(np.uint32), depth)
    dwords = jnp.asarray(CpuOctree.from_arrays(ptrs, vals).to_words())
    dwarp = tracer.build_warp_table(dwords, 7)
    t0 = time.time()
    dskip = build_warp_skip_table(dwords, 7)
    np.asarray(dskip[:1])
    print(f"deep10 skip7 build {time.time()-t0:.2f}s "
          f"({dwords.shape[0]} words)", flush=True)
    _, ci2 = camera_matrices(np.array([0.2, 0.3, -2.4], np.float32),
                             np.array([-0.1, -0.15, 1.0], np.float32),
                             70.0, W, H)
    o2, d2 = generate_rays(ci2, W, H)
    o2j, d2j = jnp.asarray(o2), jnp.asarray(d2)

    def deep_frame(tbl):
        img, res, _ = tracer.render_frame(
            dwords, o2j, d2j, sun, shadows=True, mode="beam",
            raw_result=True, u8_image=True, warp_table=tbl,
        )
        return res.hit.sum()

    ab("deep10 shd", {
        "warp7": jax.jit(lambda: deep_frame(dwarp)),
        "skip7": jax.jit(lambda: deep_frame(dskip)),
    }, reps=3)


if __name__ == "__main__":
    main()
