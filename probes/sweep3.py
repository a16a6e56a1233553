#!/usr/bin/env python3
"""Round 2 of the interleaved schedule sweep: refine around (beam 12,
(20,n/4),(40,n/16)) on monu10, and validate the winner doesn't cliff on
phantom/defualt (longer rays -> later-stage overflow risk) or deep10."""

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
n = W * H

_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))

S2040 = ((20, n // 4), (40, n // 16), (None, n // 64))


def interleave(tag, words, cases, frames=3, reps=2, **base):
    done = {}
    for name, kw in cases.items():
        h = int(np.asarray(run(words, dict(base, **kw))))
        done[name] = h
    for rep in range(reps):
        for name, kw in cases.items():
            t0 = time.time()
            for _ in range(frames):
                np.asarray(run(words, dict(base, **kw)))
            dt = (time.time() - t0) / frames
            print(f"{tag} rep{rep} {name}: {dt*1e3:.1f} ms "
                  f"(hits {done[name]})", flush=True)


def run(words, kw):
    res = tracer.trace_staged(
        words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
    return res[0].hit.sum()


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "m10"):
    words = jnp.asarray(
        load_file("/root/reference/files/monu10.vox", 10).to_words())
    interleave("monu10", words, {
        "b12 20/40": dict(beam_iters=12, schedule=S2040),
        "b10 20/40": dict(beam_iters=10, schedule=S2040),
        "b12 16/36": dict(
            beam_iters=12,
            schedule=((16, n // 4), (36, n // 16), (None, n // 64))),
        "b12 20/40 t32": dict(
            beam_iters=12,
            schedule=((20, n // 4), (40, n // 16), (None, n // 32))),
        "b14 20/40": dict(beam_iters=14, schedule=S2040),
    })
if which in ("all", "scenes"):
    for name, path in (
        ("phantom", "/root/reference/files/phantom_mansion.vox"),
        ("defualt", "/root/reference/files/defualt.vox"),
    ):
        words = jnp.asarray(load_file(path, 10).to_words())
        interleave(name, words, {
            "cur": {},
            "b12 20/40": dict(beam_iters=12, schedule=S2040),
        })
if which in ("all", "deep"):
    from deep_paging_probe import deep_tree

    words = jnp.asarray(deep_tree().to_words())
    interleave("deep10", words, {
        "cur": {},
        "b12 20/40": dict(beam_iters=12, schedule=S2040),
    })
