#!/usr/bin/env python3
"""Interleaved monu10 SHADOW-pass trim check: branch-0 schedule with
slightly fewer stage iterations (the aggressive 16/32 cut measured a
same-process loss of +77 ms; this probes the mild step)."""

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

words = jnp.asarray(load_file("/root/reference/files/monu10.vox", 10).to_words())
_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))
sun = jnp.asarray(tracer.DEFAULT_SUN)

out = tracer.trace_staged(words, oj, flat, beam_shape=(H, W, 8), beam_aux=True)
Rbm = out[2]
meta2 = Rbm[:, 0]
p_hit = (meta2 & (1 << 21)) != 0
e = (meta2 >> 23) & 31
nrm = jnp.stack(
    [(e % 3 - 1).astype(jnp.float32),
     (e // 3 % 3 - 1).astype(jnp.float32),
     (e // 9 - 1).astype(jnp.float32)], axis=-1)
ppos = jax.lax.bitcast_convert_type(Rbm[:, 2:5], jnp.float32)
sunn = sun / jnp.linalg.norm(sun)
sh_orig = jax.device_put(ppos + nrm * tracer._EPS_SHADOW)
sh_dirs = jnp.broadcast_to(-sunn, (n, 3))
sh_active = jax.device_put(p_hit & ((nrm * -sunn).sum(-1) > 0))

CASES = {
    "cur (switch)": {},
    "trim 20/44": dict(
        schedule=((20, n // 8), (44, n // 16), (None, n // 64))),
    "trim 22/48": dict(
        schedule=((22, n // 8), (48, n // 16), (None, n // 64))),
}


def run(kw):
    res, _ = tracer.trace_staged(
        words, sh_orig, sh_dirs, active_init=sh_active,
        slim_result=True, beam_raw=True, beam_pre_permuted=True,
        beam_shape=(H, W, 8), beam_iters=16, beam_sparse_skip=n // 4, **kw)
    return res.hit.sum()


for name, kw in CASES.items():
    print(f"{name} hits {int(np.asarray(run(kw)))}", flush=True)
for rep in range(2):
    for name, kw in CASES.items():
        t0 = time.time()
        for _ in range(4):
            np.asarray(run(kw))
        dt = (time.time() - t0) / 4
        print(f"rep{rep} shadow {name}: {dt*1e3:.1f} ms", flush=True)
