#!/usr/bin/env python3
"""Deep10 round-3 sweep: warp-table restarts on big pools (root re-descents
cost ~10 x 20 ns/row there — the 1 MB depth-6 warp table gathers at
small-pool rates), and a clean in-frame A/B of the shadow ladder's first
stage width (the standalone sweep confounded it with the beam toggle)."""

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
FRAMES = 3
n = W * H


def log(m):
    print(m, flush=True)


t = deep_tree()
words = jnp.asarray(t.to_words())
log(f"deep10 nodes={len(t)}")
warp = tracer.build_warp_table(words, 6)
np.asarray(warp[:8])
log("warp table built")
_, ci = camera_matrices(
    np.array([0.2, 0.3, -2.4], np.float32),
    np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))
sun = jnp.asarray(tracer.DEFAULT_SUN)

out = tracer.trace_staged(
    words, oj, flat, beam_shape=(H, W, 8), beam_aux=True)
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


def pr(tag, **kw):
    def run():
        res = tracer.trace_staged(
            words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
        return res[0].hit.sum()
    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"primary {tag}: {dt*1e3:.1f} ms (hits {h0})")


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "pr"):
    pr("default (fuse auto)")
    pr("warp_in_body", warp_table=warp, warp_in_body=True)
    pr("warp_in_body+fuse", warp_table=warp, warp_in_body=True,
       fuse_sibling=True)
if which in ("all", "sh"):
    sh("cur ladder n/2-first")
    sh("ladder n/4-first",
       schedule=((32, n // 4), (64, n // 8), (64, n // 32),
                 (96, n // 256), (None, 2048)))
    sh("warp_in_body ladder", warp_table=warp, warp_in_body=True)
