#!/usr/bin/env python3
"""monu10 shadow-pass round-3 sweep (VERDICT r2 #5): iteration-count levers
on the small-pool shadow pass — fused sibling stepping (more ground per
iteration) with correspondingly shorter pyramids — plus the full-frame
raw_result gain."""

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
FRAMES = 4
n = W * H


def log(m):
    print(m, flush=True)


t = load_file("/root/reference/files/monu10.vox", 10)
words = jnp.asarray(t.to_words())
pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
_, ci = camera_matrices(pos, look, 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)

out = tracer.trace_staged(
    words, jnp.broadcast_to(oj.reshape(1, 3), (n, 3)),
    jnp.asarray(d.reshape(-1, 3)), beam_shape=(H, W, 8), beam_aux=True)
_res, _vis, Rbm = out
meta2 = Rbm[:, 0]
p_hit = (meta2 & (1 << 21)) != 0
e = (meta2 >> 23) & 31
nrm = jnp.stack(
    [(e % 3 - 1).astype(jnp.float32),
     (e // 3 % 3 - 1).astype(jnp.float32),
     (e // 9 - 1).astype(jnp.float32)], axis=-1)
ppos = jax.lax.bitcast_convert_type(Rbm[:, 2:5], jnp.float32)
sunn = sun / jnp.linalg.norm(sun)
sh_orig = ppos + nrm * tracer._EPS_SHADOW
sh_dirs = jnp.broadcast_to(-sunn, (n, 3))
sh_active = p_hit & ((nrm * -sunn).sum(-1) > 0)
sh_orig, sh_dirs, sh_active = jax.device_put((sh_orig, sh_dirs, sh_active))
log(f"shadow active = {int(sh_active.sum())} ({100*int(sh_active.sum())/n:.1f}%)")


def sh(tag, **kw):
    def run():
        res, _ = tracer.trace_staged(
            words, sh_orig, sh_dirs, active_init=sh_active,
            slim_result=True, beam_raw=True, beam_pre_permuted=True,
            beam_shape=(H, W, 8), beam_iters=16, beam_sparse_skip=n // 4,
            **kw)
        return res.hit.sum()
    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"shadow {tag}: {dt*1e3:.1f} ms (hits {h0})")


def fr(tag, **kw):
    def run():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=True, mode="beam", **kw)
        return res.hit.sum()
    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"frame {tag}: {dt*1e3:.1f} ms (hits {h0})")


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "sh"):
    sh("cur (switch default)")
    sh("fuse", fuse_sibling=True)
    sh("fuse_short", fuse_sibling=True,
       schedule=((16, n // 8), (32, n // 16), (None, n // 64)))
    sh("short only",
       schedule=((16, n // 8), (32, n // 16), (None, n // 64)))
    sh("fuse_shorter", fuse_sibling=True,
       schedule=((12, n // 8), (24, n // 16), (None, n // 64)))
if which in ("all", "fr"):
    fr("raw_result", raw_result=True)
    fr("default")
