#!/usr/bin/env python3
"""Deep10 SHADOW pass: warp under fit (pre-fit warp lost 540 vs 396 there;
fit inverted the primary trade, 1115 -> 613 — does it invert shadows?)."""

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
sun = jnp.asarray(tracer.DEFAULT_SUN)

out = tracer.trace_staged(words, oj, flat, beam_shape=(H, W, 8),
                          beam_aux=True)
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
sh_o = jax.device_put(ppos + nrm * tracer._EPS_SHADOW)
sh_d = jnp.broadcast_to(-sunn, (n, 3))
sh_a = jax.device_put(p_hit & ((nrm * -sunn).sum(-1) > 0))

CASES = {"fit": {}, "fit+warp": dict(warp_table=warp, warp_in_body=True)}


def run(kw):
    res, _ = tracer.trace_staged(
        words, sh_o, sh_d, active_init=sh_a,
        slim_result=True, beam_raw=True, beam_pre_permuted=True,
        beam_shape=(H, W, 8), beam_iters=16, beam_sparse_skip=n // 4, **kw)
    return res.hit.sum()


h = {n2: int(np.asarray(run(kw))) for n2, kw in CASES.items()}
assert len(set(h.values())) == 1, h
print(f"hits {h}", flush=True)
for rep in range(2):
    for n2, kw in CASES.items():
        t0 = time.time()
        for _ in range(3):
            np.asarray(run(kw))
        dt = (time.time() - t0) / 3
        print(f"rep{rep} shadow {n2}: {dt*1e3:.1f} ms", flush=True)
