"""Probe (2026-08-20, round 4): K-camera STACKED wavefront vs lax.map burst.

The bench burst amortizes the ~30 ms dispatch RTT by lax.map-ing K frames
through one dispatch — but the map body runs serially, so the per-trip fixed
cost (~0.26 ms/trip x ~60-100 sequential trips ~= 15-20 ms/frame, PERF.md
cond_reduce_probe) is paid K times. Stacking the K frames into ONE wavefront
(dirs concatenated along H, per-ray origins) runs the same per-lane work at
K-fold width with ONE set of trips: fixed cost amortizes K-fold. Traversal
is per-lane, beam tiles stay inside their own sub-frame (H multiple of 8),
so results must be bit-identical per frame.

Measures trace_staged beam primaries (no shade) both ways at 1080p, K=2/4.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays_device

W, H = 1920, 1080
POS = np.array([0.4, 0.6, -2.2], np.float32)
LOOK = np.array([-0.2, -0.35, 1.0], np.float32)


def cams(k):
    out = []
    for i in range(k):
        _, ci = camera_matrices(
            POS + np.array([0.03 * i, 0.0, 0.01 * i], np.float32),
            LOOK + np.array([0.02 * i, 0.005 * i, 0.0], np.float32),
            70.0, W, H)
        out.append(ci)
    return jnp.asarray(np.stack(out))


def main():
    words = jnp.asarray(load_file("/root/reference/files/monu10.vox").to_words())

    def one_map(k):
        cam_stack = cams(k)

        @jax.jit
        def f(cs):
            def one(ci):
                o1, d1 = generate_rays_device(ci, W, H, block_major=8)
                out = tracer.trace_staged(
                    words, jnp.broadcast_to(o1.reshape(1, 3), (W * H, 3)),
                    d1, beam_shape=(H, W, 8), beam_raw=True,
                    beam_pre_permuted=True, slim_result=True,
                )
                return out[0].hit.sum()
            return jax.lax.map(one, cs)
        return f, cam_stack

    def one_stacked(k):
        cam_stack = cams(k)

        @jax.jit
        def f(cs):
            os_, ds = [], []
            for i in range(k):
                o1, d1 = generate_rays_device(cs[i], W, H, block_major=8)
                os_.append(jnp.broadcast_to(o1.reshape(1, 3), (W * H, 3)))
                ds.append(d1)
            o = jnp.concatenate(os_, axis=0)
            d = jnp.concatenate(ds, axis=0)
            out = tracer.trace_staged(
                words, o, d, beam_shape=(k * H, W, 8), beam_raw=True,
                beam_pre_permuted=True, slim_result=True,
            )
            hit = out[0].hit.reshape(k, -1)
            return hit.sum(axis=1)
        return f, cam_stack

    for k in (2, 4):
        fm, cm = one_map(k)
        fs, cS = one_stacked(k)
        hm = np.asarray(fm(cm))
        hs = np.asarray(fs(cS))
        # per-frame hit parity (bit-identical traversal per lane)
        assert (hm == hs).all(), (hm, hs)
        tm, ts = [], []
        for _ in range(3):
            t0 = time.time(); np.asarray(fm(cm)); tm.append(time.time() - t0)
            t0 = time.time(); np.asarray(fs(cS)); ts.append(time.time() - t0)
        print(f"K={k}: map {min(tm) / k * 1e3:7.1f} ms/frame   "
              f"stacked {min(ts) / k * 1e3:7.1f} ms/frame   "
              f"({min(tm) / min(ts):.2f}x)")


if __name__ == "__main__":
    main()
