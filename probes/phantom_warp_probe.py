#!/usr/bin/env python3
"""Re-probe warp on the MID-class pool (phantom_mansion, 4.5 MB / 141K
groups) now that fit-based stage advancement exists.

The 2026-08-17 scenes_probe measured warp a heavy loss here (408.9 ->
618.6 ms) — but that was PRE-FIT and level 6; on deep pools the fit+warp
combination inverted warp's standalone loss (1115 -> 613 ms, PERF.md).
This is the same inversion question one pool class down, at level 7.
defualt (0.4 MB) rides along as the small-pool control. Same-process
interleaved A/Bs; hits must agree (warp is hit-exact).
"""

import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

W, H = 1920, 1080


def main():
    sun = jnp.asarray(tracer.DEFAULT_SUN)
    _, ci = camera_matrices(
        np.array([0.4, 0.6, -2.2], np.float32),
        np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
    o, d = generate_rays(ci, W, H)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    for name in ("phantom_mansion", "defualt"):
        words = jnp.asarray(
            load_file(f"/root/reference/files/{name}.vox").to_words())
        warp7 = tracer.build_warp_table(words, 7)

        def frame(warp):
            def f():
                img, res, _ = tracer.render_frame(
                    words, oj, dj, sun, shadows=False, mode="beam",
                    raw_result=True, u8_image=True, warp_table=warp)
                return res.hit.sum()
            return f

        fns = {"plain": frame(None), "warp7": frame(warp7)}
        hits = {k: int(np.asarray(f())) for k, f in fns.items()}
        assert len(set(hits.values())) == 1, hits
        ts = {k: [] for k in fns}
        for _ in range(5):
            for k, f in fns.items():
                t0 = time.time()
                np.asarray(f())
                ts[k].append(time.time() - t0)
        print(f"{name}: " + "  ".join(
            f"{k}={np.median(v) * 1e3:.1f}ms" for k, v in ts.items()),
            flush=True)


if __name__ == "__main__":
    main()
