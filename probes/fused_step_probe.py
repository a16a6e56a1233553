#!/usr/bin/env python3
"""Fused session-step probe: how much of the interactive step is dispatch
plumbing that a single device program removes?

The Session's adaptive step today issues 4 separate jit dispatches per
frame (raygen, render_frame, select_candidates_packed, apply_patches),
with one packed readback + the viewer's u8 image fetch. Through the
tunnel each dispatch costs ~30 ms of RTT (PERF.md). This probe measures,
interleaved in ONE process (the only trustworthy methodology):

  A  the current 4-dispatch step
  B  ONE fused program: patch-scatter -> raygen -> frame -> select
  C  off-frame variants (no visits/select): 2 dispatches vs 1 fused

monu10 @ 1280x720 + shadows (the bench session configuration), pool in
its converged 256K-word bucket, steady-state patch load (64 words).
"""

import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.adaptive import feedback
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import (
    camera_matrices,
    generate_rays_device,
)

W, H = 1280, 720
CAP = 65536
PATCH = 4096


def main():
    tree = load_file("/root/reference/files/monu10.vox")
    w_np = tree.to_words()
    bucket = 1 << 18  # the session ladder rung monu10 converges into
    pool = np.zeros(bucket, np.uint32)
    pool[: w_np.shape[0]] = w_np
    words = jnp.asarray(pool)
    node_len = jnp.int32(w_np.shape[0])
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
    look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
    _, ci = camera_matrices(pos, look, 90.0, W, H)
    ci = jnp.asarray(ci)

    # Steady-state patch load: rewrite 64 live words with their own values
    # (a no-op on the data, the full scatter cost on the machinery).
    pidx = np.full(PATCH, -1, np.int32)
    pidx[:64] = np.arange(64)
    pvals = np.zeros(PATCH, np.uint32)
    pvals[:64] = w_np[:64]
    pidx_j, pvals_j = jnp.asarray(pidx), jnp.asarray(pvals)

    def frame(wds, o, d, with_visits):
        return tracer.render_frame(
            wds, o, d.reshape(H, W, 3), sun, shadows=True,
            with_visits=with_visits, mode="beam", raw_result=True,
            u8_image=True, pre_permuted=True,
        )

    # -- A: the current 4-dispatch adaptive step ------------------------------
    def step_a(wds, offset):
        o, d = generate_rays_device(ci, W, H, block_major=8)
        img, res, vis = frame(wds, o, d, True)
        packed = feedback.select_candidates_packed(
            wds, vis, node_len, sub_cap=CAP, unsub_cap=CAP, offset=offset,
        )
        packed = np.asarray(packed)  # host engine consumes this
        wds = feedback.apply_patches(wds, pidx_j, pvals_j)
        return wds, np.asarray(img), packed

    # -- B: one fused program --------------------------------------------------
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused_adaptive(wds, pi, pv, cam_inv, offset):
        wds = wds.at[pi].set(pv, mode="drop")
        o, d = generate_rays_device(cam_inv, W, H, block_major=8)
        img, res, vis = frame(wds, o, d, True)
        packed = feedback.select_candidates_packed(
            wds, vis, node_len, sub_cap=CAP, unsub_cap=CAP, offset=offset,
        )
        return wds, img, packed

    def step_b(wds, offset):
        wds, img, packed = fused_adaptive(wds, pidx_j, pvals_j, ci, offset)
        return wds, np.asarray(img), np.asarray(packed)

    # -- C: off-frame (no visits) 2-dispatch vs fused --------------------------
    def step_c_sep(wds):
        o, d = generate_rays_device(ci, W, H, block_major=8)
        img, _, _ = frame(wds, o, d, False)
        return np.asarray(img)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fused_off(wds, pi, pv, cam_inv):
        wds = wds.at[pi].set(pv, mode="drop")
        o, d = generate_rays_device(cam_inv, W, H, block_major=8)
        img, _, _ = frame(wds, o, d, False)
        return wds, img

    def step_c_fused(wds):
        wds, img = fused_off(wds, pidx_j, pvals_j, ci)
        return wds, np.asarray(img)

    # warm everything
    wa = words
    wa, _, _ = step_a(wa, jnp.int32(0))
    wb = jnp.asarray(pool)
    wb, _, _ = step_b(wb, jnp.int32(0))
    step_c_sep(wa)
    wc = jnp.asarray(pool)
    wc, _ = step_c_fused(wc)

    reps = {k: [] for k in ("A", "B", "Coff_sep", "Coff_fused")}
    for r in range(5):
        t0 = time.time()
        wa, _, _ = step_a(wa, jnp.int32(r))
        reps["A"].append(time.time() - t0)

        t0 = time.time()
        wb, _, _ = step_b(wb, jnp.int32(r))
        reps["B"].append(time.time() - t0)

        t0 = time.time()
        step_c_sep(wa)
        reps["Coff_sep"].append(time.time() - t0)

        t0 = time.time()
        wc, _ = step_c_fused(wc)
        reps["Coff_fused"].append(time.time() - t0)

    for k, v in reps.items():
        ms = np.array(v) * 1e3
        print(f"{k:>10}: median {np.median(ms):7.1f} ms  min {ms.min():7.1f}"
              f"  runs={['%.0f' % x for x in ms]}")


if __name__ == "__main__":
    main()
