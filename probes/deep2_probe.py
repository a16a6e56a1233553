#!/usr/bin/env python3
"""Deep10 round-2 sweep: narrowtail ladder variants for the sparse (shadow)
branch, and iteration-count levers for the dense primary pass (fuse_sibling,
bigger beam budgets). Follows deep_tail_probe.py's findings: the monu10-tuned
3-stage pyramid spends ~65% of the deep shadow pass riding stragglers at
n/64 width; a 5-stage ladder completing at 2048 lanes measured 1384->470 ms.
"""

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
log(f"deep10 nodes={len(t)} pool={len(t)*8*4/1e6:.1f} MB")
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
sh_orig = ppos + nrm * tracer._EPS_SHADOW
sh_dirs = jnp.broadcast_to(-sun, (n, 3))
sh_active = p_hit & ((nrm * -sun).sum(-1) > 0)
sh_orig, sh_dirs, sh_active = jax.device_put((sh_orig, sh_dirs, sh_active))


def sh(tag, **kw):
    def run():
        res, _ = tracer.trace_staged(
            words, sh_orig, sh_dirs, active_init=sh_active,
            slim_result=True, beam_raw=True, beam_pre_permuted=True,
            beam_shape=(H, W, 8), **kw)
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


LADDER_TAIL = ((64, n // 64), (96, n // 256), (None, 2048))

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "sh"):
    # prefix = the proven default pyramid, then keep narrowing: cheaper
    # first stages than the measured vnarrowtail winner (n/2-wide).
    sh("defaultish ladder",
       beam_iters=16, beam_sparse_skip=n // 4,
       schedule=((24, n // 4), (48, n // 16)) + LADDER_TAIL)
    sh("vnarrow n/4-first",
       beam_iters=16, beam_sparse_skip=n // 4,
       schedule=((32, n // 4), (64, n // 8), (64, n // 32),
                 (96, n // 256), (None, 2048)))
    sh("defaultish ladder, 1024-fine",
       beam_iters=16, beam_sparse_skip=n // 4,
       schedule=((24, n // 4), (48, n // 16), (64, n // 64),
                 (96, n // 512), (None, 1024)))
if which in ("all", "pr"):
    pr("default+fuse_sibling", fuse_sibling=True)
    pr("default+beam32", beam_iters=32)
    pr("default+beam48", beam_iters=48)
    pr("branch3 ladder",
       schedule=((32, None), (64, n // 4), (64, n // 16)) + LADDER_TAIL)
