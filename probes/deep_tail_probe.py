#!/usr/bin/env python3
"""Deep10 straggler-tail sweep (VERDICT r3 item #4).

xprof (2026-08-17, profile_deep.py shadows): 56.5% of the 2032 ms
deep10+shadows frame is ONE 8x-unrolled run-to-completion while body
(8 x 131 ms), i.e. the guarded tail riding ~800+ straggler iterations at
n/64..n/16 width over the 31.6 MB pool (~0.65-1.3 ms/iter of lane work).
This probe sweeps narrower LATE tail stages (width shrinks as stragglers
retire, ending in a few-K-wide run-to-completion stage where the per-trip
fixed cost ~0.1-0.2 ms dominates) and the shadow beam stage on/off.
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

# Primary trace once (beam mode, aux out) -> derive shadow inputs exactly as
# render_frame does (block-major, no permutes).
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
log(f"shadow active = {int(sh_active.sum())} / {n}"
    f" ({100*int(sh_active.sum())/n:.1f}%)")


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
        res, _ = tracer.trace_staged(
            words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
        return res.hit.sum()
    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"primary {tag}: {dt*1e3:.1f} ms (hits {h0})")


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "sh"):
    sh("default (beam16+skip n/4, adaptive)",
       beam_iters=16, beam_sparse_skip=n // 4)
    sh("beam0, adaptive", beam_iters=0)
    sh("beam0, dense+narrowtail",
       beam_iters=0,
       schedule=((32, n // 2), (64, n // 8), (64, n // 32),
                 (None, 8192)))
    sh("beam16, dense+narrowtail",
       beam_iters=16, beam_sparse_skip=n // 4,
       schedule=((32, n // 2), (64, n // 8), (64, n // 32),
                 (None, 8192)))
    sh("beam0, dense+vnarrowtail",
       beam_iters=0,
       schedule=((32, n // 2), (64, n // 8), (64, n // 32),
                 (96, n // 256), (None, 2048)))
if which in ("all", "pr"):
    pr("default (adaptive)")
    pr("wide+narrowtail",
       schedule=((32, None), (64, n // 4), (64, n // 16),
                 (96, n // 128), (None, 4096)))
    pr("default-ish+narrowtail",
       schedule=((24, n // 4), (48, n // 16), (64, n // 64),
                 (96, n // 512), (None, 2048)))
