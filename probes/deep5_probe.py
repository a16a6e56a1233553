#!/usr/bin/env python3
"""Interleaved A/B on deep10 primaries (one process, alternating runs) to
separate real schedule effects from the ~±15% run-to-run drift seen across
probe processes (595 vs 710 ms for the identical warp-adaptive config)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays
from deep_paging_probe import deep_tree

W, H = 1920, 1080
n = W * H

t = deep_tree()
words = jnp.asarray(t.to_words())
warp = tracer.build_warp_table(words, 6)
np.asarray(warp[:8])
print(f"deep10 nodes={len(t)}", flush=True)
_, ci = camera_matrices(
    np.array([0.2, 0.3, -2.4], np.float32),
    np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))

LADDER = ((32, n // 4), (64, n // 8), (64, n // 32),
          (96, n // 256), (None, 2048))
CASES = {
    "A_warp_adaptive": dict(warp_table=warp, warp_in_body=True),
    "B_warp_ladder": dict(warp_table=warp, warp_in_body=True,
                          schedule=LADDER),
    "C_fuse_classic": dict(fuse_sibling=True),
}


def run_case(kw):
    res = tracer.trace_staged(
        words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
    return res[0].hit.sum()


# compile all first
for name, kw in CASES.items():
    h = int(np.asarray(run_case(kw)))
    print(f"{name} compiled (hits {h})", flush=True)

for rep in range(3):
    for name, kw in CASES.items():
        t0 = time.time()
        for _ in range(3):
            np.asarray(run_case(kw))
        dt = (time.time() - t0) / 3
        print(f"rep{rep} {name}: {dt*1e3:.1f} ms", flush=True)
