"""Probe (2026-08-20, round 4): tracer knobs on the NEW per-scene bench
cameras (inside-ish viewpoints, hit 0.92/0.55) — the old neutral/loss
verdicts for warp/fuse were measured on the foreign monu10 viewpoint;
these restart-heavier workloads may invert them. Interleaved same-process.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

W, H = 1920, 1080
SCENES = {
    "phantom_mansion": ("/root/reference/files/phantom_mansion.vox",
                        (0.925, 0.181, 0.244), (-0.937, -0.243, -0.251)),
    "defualt": ("/root/reference/files/defualt.vox",
                (0.391, 0.634, 0.105), (-0.469, -0.874, -0.126)),
}
sun = jnp.asarray(tracer.DEFAULT_SUN)


def main():
    for name, (path, pos, look) in SCENES.items():
        words = jnp.asarray(load_file(path).to_words())
        _, ci = camera_matrices(np.asarray(pos, np.float32),
                                np.asarray(look, np.float32), 70.0, W, H)
        o, d = generate_rays(ci, W, H)
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        warp7 = tracer.build_warp_table(words, 7)

        def mk(**kw):
            def f():
                img, res, _ = tracer.render_frame(
                    words, oj, dj, sun, shadows=False, mode="beam",
                    raw_result=True, u8_image=True, **kw)
                return res.hit.sum()
            return f

        variants = {
            "default": mk(),
            "warp7": mk(warp_table=warp7),
            "pack9": mk(pack_pool=True),
            "warp7+pack9": mk(warp_table=warp7, pack_pool=True),
        }
        hits = {}
        for k, f in variants.items():
            hits[k] = int(np.asarray(f()))  # compile + warm
        assert len(set(hits.values())) == 1, hits
        res = {k: [] for k in variants}
        for _ in range(3):
            for k, f in variants.items():
                t0 = time.time()
                np.asarray(f())
                res[k].append(time.time() - t0)
        print(name)
        for k in variants:
            print(f"  {k:>11}: {min(res[k]) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
