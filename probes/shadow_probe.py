#!/usr/bin/env python3
"""Shadow-pass schedule sweep (VERDICT r2 #5): the pass runs ~10% occupancy
but rides a full-width entry beam + generous pyramid. Candidates: the
current default, rebeam_k injection, and entry_width-first compaction with
mid-march re-beaming over the compacted (spatially coherent) set."""

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


def log(m):
    print(m, flush=True)


t = load_file("/root/reference/files/monu10.vox", 10)
words = jnp.asarray(t.to_words())
pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
_, ci = camera_matrices(pos, look, 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = d.reshape(-1, 3)
n = flat.shape[0]
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))
dj = jnp.asarray(flat)

sun = np.asarray(tracer.DEFAULT_SUN, np.float32)
sun /= np.linalg.norm(sun)

# primary trace once (pixel order result)
res, _ = tracer.trace_staged(words, oj, dj, beam_shape=(H, W, 8))
nrm = np.asarray(res.normal)
ppos = np.asarray(res.hit_pos)
p_hit = np.asarray(res.hit)
sh_active_np = p_hit & ((nrm * -sun).sum(-1) > 0)
log(f"primary hits {p_hit.sum()}, shadow-active {sh_active_np.sum()} "
    f"({100*sh_active_np.sum()/n:.1f}%)")

sh_o = jnp.asarray(ppos + nrm * tracer._EPS_SHADOW)
sh_d = jnp.broadcast_to(jnp.asarray(-sun).reshape(1, 3), (n, 3))
sh_a = jnp.asarray(sh_active_np)

# block-major permuted copies (8x8 tiles contiguous — what the in-frame
# shadow pass gets for free from the primary's aux output)
sh_o_b = tracer._pixel_to_block(sh_o, H, W, 8)
sh_d_b = jnp.broadcast_to(jnp.asarray(-sun).reshape(1, 3), (n, 3))
sh_a_b = tracer._pixel_to_block(sh_a, H, W, 8)


def bench(tag, block_major, **kw):
    a_o, a_d, a_a = (sh_o_b, sh_d_b, sh_a_b) if block_major else (
        sh_o, sh_d, sh_a)

    def run():
        r, _ = tracer.trace_staged(
            words, a_o, a_d, active_init=a_a, slim_result=True, **kw)
        return r.hit.sum()
    tc = time.time()
    h0 = int(np.asarray(run()))
    log(f"  [compile+1st {time.time()-tc:.0f} s]")
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"{tag}: {dt*1e3:.1f} ms (shadow hits {h0})")


CASES = {
    # what render_frame's shadow pass runs today (entry beam + switch)
    "cur": dict(block_major=True, beam_shape=(H, W, 8),
                beam_pre_permuted=True),
    "cur_rk8": dict(block_major=True, beam_shape=(H, W, 8),
                    beam_pre_permuted=True, rebeam_k=8),
    # runtime occupancy gate: identical compiled program to "cur" but the
    # beam budget zeroes when live count <= n//4 (what render_frame now does)
    "cur_skip": dict(block_major=True, beam_shape=(H, W, 8),
                     beam_pre_permuted=True, beam_sparse_skip=n // 4),
    # compact FIRST (state recomputed from origin/dir), then the sparse
    # pyramid; no full-width beam stage at 10% occupancy
    "ew": dict(block_major=True, entry_width=n // 8,
               schedule=((24, None), (48, n // 16), (None, n // 64))),
    "ew_rb": dict(block_major=True, entry_width=n // 8,
                  schedule=((24, None, 8), (48, n // 16, 8),
                            (None, n // 64))),
    "ew_rb16": dict(block_major=True, entry_width=n // 8,
                    schedule=((24, None, 16), (48, n // 16, 8),
                              (None, n // 64))),
    "ew_rb_l16": dict(block_major=True, entry_width=n // 8,
                      schedule=((24, None, 8), (48, n // 16, 8),
                                (None, n // 64)), rebeam_lanes=16),
    "ew_pix": dict(block_major=False, entry_width=n // 8,
                   schedule=((24, None), (48, n // 16), (None, n // 64))),
}

for c in (sys.argv[1:] or ["cur", "ew", "ew_rb"]):
    bench(c, **CASES[c])
