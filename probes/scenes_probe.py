#!/usr/bin/env python3
"""Per-scene lever probe: warp-table restarts and fused sibling stepping on
the non-bench scenes (phantom_mansion sits in the (4.2,16.8] MB VMEM gray
zone; defualt is restart-heavy long-ray). Bench camera, primaries only,
trace_staged beam_raw (the frame minus shade/permutes)."""

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
n = W * H

_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(np.asarray(o)).reshape(1, 3), (n, 3))


def log(m):
    print(m, flush=True)


def bench(scene, tag, words, **kw):
    def run():
        res = tracer.trace_staged(
            words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
        return res[0].hit.sum()
    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"{scene} {tag}: {dt*1e3:.1f} ms (hits {h0})")


for name, path in (
    ("phantom", "/root/reference/files/phantom_mansion.vox"),
    ("defualt", "/root/reference/files/defualt.vox"),
    ("monu10", "/root/reference/files/monu10.vox"),
):
    if sys.argv[1:] and name not in sys.argv[1:]:
        continue
    t = load_file(path, 10)
    words = jnp.asarray(t.to_words())
    warp = tracer.build_warp_table(words, 6)
    np.asarray(warp[:8])
    log(f"{name}: {len(t)} nodes, {words.shape[0]*4/1e6:.1f} MB pool")
    bench(name, "default", words)
    bench(name, "warp", words, warp_table=warp, warp_in_body=True)
    bench(name, "fuse", words, fuse_sibling=True)
