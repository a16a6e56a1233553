#!/usr/bin/env python3
"""Burst-size sweep on the bench primaries row: how much of the frame is
the per-dispatch tunnel RTT, and where does amortization flatten?

bench.py renders BURST moving-camera frames in ONE lax.map dispatch; the
~30 ms dispatch RTT (PERF.md) is split across the burst. This sweeps
BURST in {2,4,8,16} interleaved in one process (the only trustworthy
deep-frame methodology, PERF.md measurement note).
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
    import jax.numpy as jnp

    from octree_tracer_tpu.io import load_file
    from octree_tracer_tpu.render import tracer
    from octree_tracer_tpu.render.camera import (
        camera_matrices,
        generate_rays_device,
    )

    W, H = 1920, 1080
    words = jnp.asarray(
        load_file("/root/reference/files/monu10.vox").to_words()
    )
    pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
    look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    def cam_stack(n):
        cams = []
        for k in range(n):
            pk = pos + np.array([0.03 * k, 0.0, 0.01 * k], np.float32)
            lk = look + np.array([0.02 * k, 0.005 * k, 0.0], np.float32)
            _, cik = camera_matrices(pk, lk, 70.0, W, H)
            cams.append(cik)
        return jnp.asarray(np.stack(cams))

    def make_burst():
        def one(ci):
            o1, d1 = generate_rays_device(ci, W, H, block_major=8)
            img, res, _ = tracer.render_frame(
                words, o1, d1.reshape(H, W, 3), sun, shadows=False,
                mode="beam", raw_result=True, u8_image=True,
                pre_permuted=True,
            )
            return res.hit.sum(), jnp.sum(img, dtype=jnp.uint32)
        return jax.jit(lambda cs: jax.lax.map(one, cs))

    bf = make_burst()
    sizes = [2, 4, 8, 16]
    stacks = {n: cam_stack(n) for n in sizes}
    for n in sizes:  # warm every shape first
        np.asarray(bf(stacks[n])[0])

    reps = {n: [] for n in sizes}
    for _ in range(3):
        for n in sizes:
            t0 = time.time()
            hits, sums = bf(stacks[n])
            np.asarray((hits, sums))
            reps[n].append((time.time() - t0) / n * 1e3)
    for n in sizes:
        ms = min(reps[n])
        print(f"BURST={n:3d}: {ms:7.1f} ms/frame  "
              f"({W * H / ms / 1e3:.2f} Mrays/s)  runs={['%.1f' % x for x in reps[n]]}")


if __name__ == "__main__":
    main()
