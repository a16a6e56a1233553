#!/usr/bin/env python3
"""Mid-march re-beaming sweep (VERDICT r2 #3): schedule beam_k entries on
monu10 and deep10 at 1080p. Usage: rebeam_probe.py [monu|deep] [case...]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

W, H = 1920, 1080
FRAMES = 3


def log(m):
    print(m, flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "monu"
cases = sys.argv[2:]

if which == "deep":
    from deep_paging_probe import deep_tree

    t = deep_tree()
    words = jnp.asarray(t.to_words())
    _, ci = camera_matrices(
        np.array([0.2, 0.3, -2.4], np.float32),
        np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
else:
    t = load_file("/root/reference/files/monu10.vox", 10)
    words = jnp.asarray(t.to_words())
    # the bench.py camera, so numbers relate to BENCH_r0N
    pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
    look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
    _, ci = camera_matrices(pos, look, 70.0, W, H)

log(f"{which}: nodes={len(t)}")
o, d = generate_rays(ci, W, H)
flat = d.reshape(-1, 3)
n = flat.shape[0]
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))
dj = jnp.asarray(flat)


def bench(tag, **kw):
    def run():
        res, _ = tracer.trace_staged(
            words, oj, dj, beam_shape=(H, W, 8), **kw)
        return res.hit.sum()
    tc = time.time()
    h0 = int(np.asarray(run()))
    log(f"  [compile+1st {time.time()-tc:.0f} s]")
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"{tag}: {dt*1e3:.1f} ms (hits {h0})")


W0 = 38 * n // 128  # ~30%: monu10's post-beam survivors hover AT n/4, so an
# explicit n/4 stage overflows into serial backstop replays (the adaptive
# switch exists for this); both probe arms use the same safe width instead.
CASES = {
    # the production default (adaptive switch), for reference
    "ref": dict(),
    # default schedules with injected mid-march re-beaming
    "rk4": dict(rebeam_k=4),
    "rk8": dict(rebeam_k=8),
    "rk16": dict(rebeam_k=16),
    "rk8_l16": dict(rebeam_k=8, rebeam_lanes=16),
    "rk8_l32": dict(rebeam_k=8, rebeam_lanes=32),
    # baseline: the tuned pyramid at the safe width, no rebeam
    "base": dict(
        schedule=((24, W0), (48, n // 16), (None, n // 64))),
    # rebeam at the first post-beam stage only
    "rb1": dict(
        schedule=((24, W0, 8), (48, n // 16), (None, n // 64))),
    # rebeam at both compacted stages
    "rb2": dict(
        schedule=((24, W0, 8), (48, n // 16, 8), (None, n // 64))),
    # deeper rebeam budget
    "rb16": dict(
        schedule=((24, W0, 16), (48, n // 16, 16), (None, n // 64))),
    # fewer per-ray iters, leaning on the beams
    "rb_lean": dict(
        schedule=((16, W0, 12), (32, n // 16, 12), (None, n // 64))),
    # narrower lanes (agree more often, amortize less)
    "rb_l16": dict(
        schedule=((24, W0, 8), (48, n // 16, 8), (None, n // 64)),
        rebeam_lanes=16),
    "rb_l32": dict(
        schedule=((24, W0, 8), (48, n // 16, 8), (None, n // 64)),
        rebeam_lanes=32),
    # deep-scene wide schedules (what the adaptive switch's wide branch runs)
    "dbase": dict(
        schedule=((32, None), (64, n // 4), (None, n // 16))),
    "drb": dict(
        schedule=((32, None, 12), (64, n // 4, 12), (None, n // 16))),
    "drb_all": dict(
        schedule=((32, None, 12), (64, n // 4, 12), (None, n // 16, 8))),
}

for c in (cases or (["base", "rb1", "rb2"] if which == "monu"
                    else ["dbase", "drb"])):
    bench(c, **CASES[c])
