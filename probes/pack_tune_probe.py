#!/usr/bin/env python3
"""Retune the big-pool defaults under pack9: (a) beam-stage fetch packing
delta on the deep bench frame, (b) fuse_sibling on/off under pack (the
auto-fuse was justified by the pre-pack 20 ns gather), interleaved
same-process on deep10 primaries (trace_staged, beam mode, warp)."""

import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays
from probes.pack_frame_probe import deep_scene

W, H = 1920, 1080


def main():
    sun = jnp.asarray(tracer.DEFAULT_SUN)
    dwords = deep_scene()
    dwarp = tracer.build_warp_table(dwords, 6)
    _, ci = camera_matrices(
        np.array([0.2, 0.3, -2.4], np.float32),
        np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
    o, d = generate_rays(ci, W, H)
    oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (W * H, 3))
    dj = jnp.asarray(d.reshape(-1, 3))

    def prim(fuse):
        def f():
            res, _ = tracer.trace_staged(
                dwords, oj, dj, beam_shape=(H, W, 8), beam_iters=16,
                beam_raw=True, warp_table=dwarp, warp_in_body=True,
                fuse_sibling=fuse, slim_result=True)
            return res.hit.sum()
        return f

    def frame():
        img, res, _ = tracer.render_frame(
            dwords, jnp.asarray(o), jnp.asarray(d), sun, shadows=True,
            mode="beam", raw_result=True, u8_image=True, warp_table=dwarp)
        return res.hit.sum()

    fns = {"fuse_auto": prim(None), "fuse_off": prim(False),
           "frame_beampack": frame}
    hits = {k: int(np.asarray(f())) for k, f in fns.items()}
    assert hits["fuse_auto"] == hits["fuse_off"]
    ts = {k: [] for k in fns}
    for _ in range(3):
        for k, f in fns.items():
            t0 = time.time(); np.asarray(f()); ts[k].append(time.time() - t0)
    for k, v in ts.items():
        print(f"{k}: {np.median(v)*1e3:.1f} ms (hits {hits[k]})", flush=True)


if __name__ == "__main__":
    main()
