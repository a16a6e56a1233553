#!/usr/bin/env python3
"""Benchmark driver: monu10.vox at 1920x1080, primary rays + voxel-colour
shading on one TPU chip (BASELINE.md config 2; north star 150 Mrays/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

NORTH_STAR_MRAYS = 150.0
SCENE = "/root/reference/files/monu10.vox"
W, H = 1920, 1080
FRAMES = 3


def main():
    import signal

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
    import jax.numpy as jnp

    from octree_tracer_tpu.io import load_file
    from octree_tracer_tpu.render import tracer
    from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

    words = jnp.asarray(load_file(SCENE).to_words())
    import numpy as np

    pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
    look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
    _, cam_inv = camera_matrices(pos, look, 70.0, W, H)
    origin, dirs = generate_rays(cam_inv, W, H)
    oj, dj = jnp.asarray(origin), jnp.asarray(dirs)
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    def frame():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=False, mode="beam"
        )
        return res.hit.sum()

    def frame_shadows():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=True, mode="beam"
        )
        return res.hit.sum()

    # np.asarray forces real completion; block_until_ready is unreliable on
    # the tunneled platform (PERF.md).
    np.asarray(frame())  # compile + sync
    t0 = time.time()
    for _ in range(FRAMES):
        r = np.asarray(frame())
    dt = (time.time() - t0) / FRAMES
    mrays = W * H / dt / 1e6

    out = {
        "metric": "primary_rays_monu10_1080p",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
        "frame_ms": round(dt * 1e3, 1),
        "device": str(jax.devices()[0]),
    }

    # Secondary metric; guarded because a cold compile of the shadow variant
    # can take minutes through the remote-compile tunnel.
    def _timeout(signum, frm):
        raise TimeoutError

    signal.signal(signal.SIGALRM, _timeout)
    signal.alarm(420)
    try:
        hits = int(np.asarray(frame_shadows()))  # compile + sync
        t0 = time.time()
        for _ in range(FRAMES):
            np.asarray(frame_shadows())
        dts = (time.time() - t0) / FRAMES
        out["with_shadows_mrays"] = round((W * H + hits) / dts / 1e6, 2)
        out["with_shadows_frame_ms"] = round(dts * 1e3, 1)
    except Exception:
        pass
    finally:
        signal.alarm(0)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
