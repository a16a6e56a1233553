#!/usr/bin/env python3
"""Deep10 primary schedule sweep UNDER warp restarts: shorter descents may
shift the optimal stage iteration counts. Plus burst-size K=4 vs K=8 on
the monu10 primary metric (residual dispatch-RTT amortization)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import (
    camera_matrices, generate_rays, generate_rays_device,
)
from deep_paging_probe import deep_tree

W, H = 1920, 1080
FRAMES = 3
n = W * H


def log(m):
    print(m, flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "pr"):
    t = deep_tree()
    words = jnp.asarray(t.to_words())
    warp = tracer.build_warp_table(words, 6)
    np.asarray(warp[:8])
    log(f"deep10 nodes={len(t)}")
    _, ci = camera_matrices(
        np.array([0.2, 0.3, -2.4], np.float32),
        np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
    o, d = generate_rays(ci, W, H)
    flat = jnp.asarray(d.reshape(-1, 3))
    oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))

    def pr(tag, **kw):
        def run():
            res = tracer.trace_staged(
                words, oj, flat, beam_shape=(H, W, 8), beam_raw=True,
                warp_table=warp, warp_in_body=True, **kw)
            return res[0].hit.sum()
        h0 = int(np.asarray(run()))
        t0 = time.time()
        for _ in range(FRAMES):
            np.asarray(run())
        dt = (time.time() - t0) / FRAMES
        log(f"primary {tag}: {dt*1e3:.1f} ms (hits {h0})")

    pr("warp adaptive (595 baseline)")
    pr("warp sched 24/48 classic",
       schedule=((24, n // 4), (48, n // 16), (None, n // 64)))
    pr("warp sched 16/32",
       schedule=((16, n // 4), (32, n // 16), (None, n // 64)))
    pr("warp sched 24/48 + 64,n/64 + 4096 tail",
       schedule=((24, n // 4), (48, n // 16), (64, n // 64), (None, 4096)))

if which in ("all", "burst"):
    from octree_tracer_tpu.io import load_file

    mwords = jnp.asarray(
        load_file("/root/reference/files/monu10.vox", 10).to_words())
    sun = jnp.asarray(tracer.DEFAULT_SUN)
    pos = np.array([0.4, 0.6, -2.2], np.float32)
    look = np.array([-0.2, -0.35, 1.0], np.float32)

    for K in (4, 8):
        cams = []
        for k in range(K):
            pk = pos + np.array([0.03 * k, 0.0, 0.01 * k], np.float32)
            lk = look + np.array([0.02 * k, 0.005 * k, 0.0], np.float32)
            _, cik = camera_matrices(pk, lk, 70.0, W, H)
            cams.append(cik)
        cams = jnp.asarray(np.stack(cams))

        def one(ci):
            o1, d1 = generate_rays_device(ci, W, H)
            img, res, _ = tracer.render_frame(
                mwords, o1, d1, sun, shadows=False, mode="beam",
                raw_result=True, u8_image=True)
            return res.hit.sum(), jnp.sum(img, dtype=jnp.uint32)

        bf = jax.jit(lambda cs: jax.lax.map(one, cs))
        np.asarray(bf(cams)[0])
        t0 = time.time()
        h, s2 = bf(cams)
        np.asarray(h)
        np.asarray(s2)
        dt = (time.time() - t0) / K
        log(f"burst K={K}: {dt*1e3:.1f} ms/frame ({W*H/dt/1e6:.2f} Mrays/s)")
