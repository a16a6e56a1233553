#!/usr/bin/env python3
"""Interleaved A/B of fit-based stage advancement (fit_stages=True, new
default) vs the static schedules, one process, all four scene classes."""

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
from deep_paging_probe import deep_tree

W, H = 1920, 1080
n = W * H

_, ci = camera_matrices(
    np.array([0.4, 0.6, -2.2], np.float32),
    np.array([-0.2, -0.35, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
flat = jnp.asarray(d.reshape(-1, 3))
oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))
sun = jnp.asarray(tracer.DEFAULT_SUN)


def run(words, kw):
    res = tracer.trace_staged(
        words, oj, flat, beam_shape=(H, W, 8), beam_raw=True, **kw)
    return res[0].hit.sum()


def interleave(tag, words, frames=3, reps=2):
    cases = {"fit": dict(fit_stages=True), "static": dict(fit_stages=False)}
    hits = {}
    for name, kw in cases.items():
        hits[name] = int(np.asarray(run(words, kw)))
    assert hits["fit"] == hits["static"], hits
    for rep in range(reps):
        for name, kw in cases.items():
            t0 = time.time()
            for _ in range(frames):
                np.asarray(run(words, kw))
            dt = (time.time() - t0) / frames
            print(f"{tag} rep{rep} {name}: {dt*1e3:.1f} ms "
                  f"(hits {hits[name]})", flush=True)


which = sys.argv[1:] or ["monu10", "phantom", "defualt", "deep", "shadow"]
for name in which:
    if name == "deep":
        words = jnp.asarray(deep_tree().to_words())
        interleave("deep10(m10cam)", words)
    elif name == "shadow":
        words = jnp.asarray(
            load_file("/root/reference/files/monu10.vox", 10).to_words())
        out = tracer.trace_staged(
            words, oj, flat, beam_shape=(H, W, 8), beam_aux=True)
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

        def shrun(fit):
            res, _ = tracer.trace_staged(
                words, sh_o, sh_d, active_init=sh_a,
                slim_result=True, beam_raw=True, beam_pre_permuted=True,
                beam_shape=(H, W, 8), beam_iters=16,
                beam_sparse_skip=n // 4, fit_stages=fit)
            return res.hit.sum()

        h = {f: int(np.asarray(shrun(f))) for f in (True, False)}
        assert h[True] == h[False], h
        for rep in range(2):
            for f in (True, False):
                t0 = time.time()
                for _ in range(3):
                    np.asarray(shrun(f))
                dt = (time.time() - t0) / 3
                print(f"m10shadow rep{rep} fit={f}: {dt*1e3:.1f} ms",
                      flush=True)
    else:
        path = {"monu10": "monu10.vox", "phantom": "phantom_mansion.vox",
                "defualt": "defualt.vox"}[name]
        words = jnp.asarray(
            load_file(f"/root/reference/files/{path}", 10).to_words())
        interleave(name, words)
