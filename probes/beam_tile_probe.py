#!/usr/bin/env python3
"""Big beam tiles on deep10 + monu10 shadow sparse-branch measurement."""

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
FRAMES = 3


def log(m):
    print(m, flush=True)


def pad_rays(o, d, hpad):
    dpad = np.zeros((hpad, W, 3), np.float32)
    dpad[:H] = d
    dpad[H:] = np.array([0.577, 0.577, 0.577], np.float32)  # dummy unit dirs
    act = np.zeros((hpad * W,), bool)
    act[: H * W] = True
    return dpad.reshape(-1, 3), act


def bench_trace(tag, words, o, d, bb, iters, hpad=None, shadows=False):
    hp = hpad or H
    flat, act = pad_rays(o, d, hp)
    n = flat.shape[0]
    oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))
    dj = jnp.asarray(flat)
    aj = jnp.asarray(act)

    def run():
        res, _ = tracer.trace_staged(
            words, oj, dj, active_init=aj,
            beam_shape=(hp, W, bb), beam_iters=iters,
        )
        return res.hit.sum()

    h0 = int(np.asarray(run()))
    t0 = time.time()
    for _ in range(FRAMES):
        np.asarray(run())
    dt = (time.time() - t0) / FRAMES
    log(f"{tag}: {dt*1e3:.1f} ms (hits {h0})")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "deep"):
        t = deep_tree()
        words = jnp.asarray(t.to_words())
        log(f"deep10 nodes={len(t)}")
        _, ci = camera_matrices(
            np.array([0.2, 0.3, -2.4], np.float32),
            np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
        o, d = generate_rays(ci, W, H)
        bench_trace("deep10 bb=8 it=16 (baseline)", words, o, d, 8, 16)
        bench_trace("deep10 bb=16 it=16", words, o, d, 16, 16, hpad=1088)
        bench_trace("deep10 bb=16 it=24", words, o, d, 16, 24, hpad=1088)
        bench_trace("deep10 bb=32 it=24", words, o, d, 32, 24, hpad=1088)
        bench_trace("deep10 bb=8 it=32", words, o, d, 8, 32)

    if which in ("all", "monu"):
        words = jnp.asarray(
            load_file("/root/reference/files/monu10.vox").to_words()
        )
        pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
        look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
        _, ci = camera_matrices(pos, look, 70.0, W, H)
        o, d = generate_rays(ci, W, H)
        oj, dj = jnp.asarray(o), jnp.asarray(d)
        sun = jnp.asarray(tracer.DEFAULT_SUN)

        for sh in (False, True):
            def frame():
                img, res, _ = tracer.render_frame(
                    words, oj, dj, sun, shadows=sh, mode="beam")
                return res.hit.sum()
            h0 = int(np.asarray(frame()))
            t0 = time.time()
            for _ in range(FRAMES):
                np.asarray(frame())
            dt = (time.time() - t0) / FRAMES
            log(f"monu10 shadows={sh} (sparse branch in): "
                f"{dt*1e3:.1f} ms (hits {h0})")

        bench_trace("monu10 bb=16 it=16", words, o, d, 16, 16, hpad=1088)


if __name__ == "__main__":
    main()
