#!/usr/bin/env python3
"""Decompose the interactive OFF-frame (no visit counting) device cost:
shadows on/off and resolution sweep on a converged monu10 session pool.

Today's phase probe: off-frame device+dispatch 135.5 ms at 720p+shadows on
a tiny LOD pool — far above the ~77 ms a ray-count-scaled bench frame
suggests, pointing at resolution-independent fixed costs (while-trip
scheduling ~0.26 ms/trip) and/or the shadow pass. Converge the pool at
feedback_every=1 first (the bench warm recipe), then pause_adaptive and
time render()-only frames synced on a 4-byte scalar.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World


def converged_session(width, height):
    world = World(load_blocks=False)
    world.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
    world.generate_mip_tree(0)
    s = Session(world, width=width, height=height)
    for _ in range(12):
        img, _, _ = s.step()
        np.asarray(img)
    s.settings.pause_adaptive = True
    return s


def timed(s, n=6):
    def one():
        img, _ = s.render()
        return int(np.asarray(jnp.sum(img, dtype=jnp.uint32)))
    one()  # compile/warm
    ts = []
    for _ in range(n):
        t0 = time.time()
        one()
        ts.append(time.time() - t0)
    return float(np.median(ts)) * 1e3


for (w, h) in ((1280, 720), (640, 360)):
    s = converged_session(w, h)
    n_nodes = len(s.octree)
    on = timed(s)
    s.settings.shadows = False
    off = timed(s)
    print(
        f"{w}x{h} nodes={n_nodes}: shadows {on:.1f} ms | "
        f"no-shadows {off:.1f} ms | shadow pass {on - off:.1f} ms",
        flush=True)
