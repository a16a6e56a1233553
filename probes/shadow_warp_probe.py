"""Probe (2026-08-20, round 4): two shadow-pass questions on monu10@1080p.

1. Does a level-7 warp table help the WITH-SHADOWS frame on monu10?
   (r3's 'shadow rejects warp' verdict was measured on deep10 only;
   shadow rays start at surfaces — the restart-heavy class where the new
   cameras won 10-21%.)
2. On counted (with_visits) frames, is a flags shadow pass with
   slim_result=False (index available for the exact overlay) cheaper than
   the current exact-adds + slim shadow?  [informational: visit_flags
   currently keeps the shadow pass exact]
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
sun = jnp.asarray(tracer.DEFAULT_SUN)
words = jnp.asarray(load_file("/root/reference/files/monu10.vox").to_words())
_, ci = camera_matrices(np.array([0.4, 0.6, -2.2], np.float32),
                        np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
warp7 = tracer.build_warp_table(words, 7)


def mk(**kw):
    def f():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=True, mode="beam", raw_result=True,
            u8_image=True, **kw)
        return res.hit.sum()
    return f


variants = {
    "shadows_default": mk(),
    "shadows_warp7": mk(warp_table=warp7),
    "counted_default": mk(with_visits=True, visit_flags=True),
}
hits = {k: int(np.asarray(f())) for k, f in variants.items()}
assert hits["shadows_default"] == hits["shadows_warp7"], hits
res = {k: [] for k in variants}
for _ in range(3):
    for k, f in variants.items():
        t0 = time.time()
        np.asarray(f())
        res[k].append(time.time() - t0)
for k in variants:
    print(f"{k:>16}: {min(res[k]) * 1e3:7.1f} ms")
