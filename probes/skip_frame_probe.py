"""TPU A/B: combined warp+skip table vs current best per-scene config
(round 5 headline — VERDICT r5 #1).

Interleaved same-process medians (CLAUDE.md measurement rules), synced on a
scalar reduce. Configs per scene at the bench cameras, 1080p primaries,
beam mode, raw_result/u8 (the bench sframe shape):
  plain   — no table (monu10's current bench config)
  warp7   — plain level-7 warp table (the current scene-row config)
  skip7   — combined warp+skip table (render/skip.py), level 7
  skip6   — combined, level 6 (2.1 MB: small-pool gather class)

CPU sim ceilings (probes/skip_sim_probe.py, codebook): iterations drop
1.56x (monu10) / 1.50x (monu9) / 1.73x (phantom) / 2.32x (defualt) under
warp+skip vs warp-only restarts at equal body cost (the skip word rides
the warp row fetch).
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
)
from octree_tracer_tpu.render.skip import build_warp_skip_table  # noqa: E402

W, H = 1920, 1080
SCENES = {
    "monu10": ("/root/reference/files/monu10.vox",
               (0.4, 0.6, -2.2), (-0.2, -0.35, 1.0)),
    "monu9": ("/root/reference/files/monu9.vox",
              (-0.668, -0.031, 0.383), (0.790, -0.410, -0.456)),
    "phantom_mansion": ("/root/reference/files/phantom_mansion.vox",
                        (0.925, 0.181, 0.244), (-0.937, -0.243, -0.251)),
    "defualt": ("/root/reference/files/defualt.vox",
                (0.391, 0.634, 0.105), (-0.469, -0.874, -0.126)),
}


def main():
    reps = 4
    for name, (path, pos, look) in SCENES.items():
        words = jnp.asarray(load_file(path).to_words())
        _, ci = camera_matrices(np.asarray(pos, np.float32),
                                np.asarray(look, np.float32), 70.0, W, H)
        o, d = generate_rays(ci, W, H)
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        sun = jnp.asarray(tracer.DEFAULT_SUN)

        t0 = time.time()
        warp7 = tracer.build_warp_table(words, 7)
        t1 = time.time()
        skip7 = build_warp_skip_table(words, 7)
        np.asarray(skip7[:1])
        t2 = time.time()
        skip6 = build_warp_skip_table(words, 6)
        np.asarray(skip6[:1])
        t3 = time.time()
        print(f"\n=== {name}: {words.shape[0]} words; builds "
              f"warp7 {t1-t0:.2f}s skip7 {t2-t1:.2f}s skip6 {t3-t2:.2f}s ===",
              flush=True)

        def frame(tbl):
            img, res, _ = tracer.render_frame(
                words, oj, dj, sun, shadows=False, mode="beam",
                raw_result=True, u8_image=True, warp_table=tbl,
            )
            return res.hit.sum()

        fns = {
            "plain": jax.jit(lambda: frame(None)),
            "warp7": jax.jit(lambda: frame(warp7)),
            "skip7": jax.jit(lambda: frame(skip7)),
            "skip6": jax.jit(lambda: frame(skip6)),
        }
        hits = {}
        for k, f in fns.items():
            hits[k] = int(np.asarray(f()))  # warm/compile
        # skip exits compute the same boundary plane through a different f32
        # decomposition -> knife-edge rays may flip (documented <0.5% budget)
        spread = max(hits.values()) - min(hits.values())
        assert spread <= 0.005 * W * H, f"hit mismatch beyond budget: {hits}"
        if spread:
            print(f"  knife-edge spread: {spread} rays ({hits})", flush=True)
        ts = {k: [] for k in fns}
        for _ in range(reps):
            for k, f in fns.items():
                t0 = time.time()
                float(np.asarray(f()))
                ts[k].append((time.time() - t0) * 1e3)
        base = np.median(ts["plain"])
        cur = min(np.median(ts["plain"]), np.median(ts["warp7"]))
        for k in fns:
            m = np.median(ts[k])
            print(f"  {k:6s}: {m:7.1f} ms (min {min(ts[k]):7.1f})  "
                  f"vs plain x{base/m:4.2f}  vs best-current x{cur/m:4.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
