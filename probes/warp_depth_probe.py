#!/usr/bin/env python3
"""Warp-table DEPTH sweep on the deep10 bench frame (+shadows, pack9, fit).

Every user of build_warp_table hard-codes levels=6; deeper tables shorten
every in-body re-descent by one gather per extra level (deep10 leaves sit
at depth 10: resume at 7 leaves 3 levels to walk instead of 4) and the
packed lookup keeps even the 128^3 table (2M cells -> 29,128 packed rows)
inside the fast row-gather class (< 2^17 rows AND < 40 MB — PERF.md
row-width scaling). levels=8 (16.8M cells, 64 MB) crosses the byte ceiling
and is expected slow; measured for the record. Same-process interleaved
A/Bs (PERF.md measurement rule); hits must agree across levels (the warp
jump is hit-exact).
"""

import time

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp
import numpy as np

from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays
from pack_frame_probe import deep_scene

W, H = 1920, 1080


def main():
    sun = jnp.asarray(tracer.DEFAULT_SUN)
    dwords = deep_scene()
    _, ci = camera_matrices(
        np.array([0.2, 0.3, -2.4], np.float32),
        np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
    o, d = generate_rays(ci, W, H)
    oj, dj = jnp.asarray(o), jnp.asarray(d)

    levels = [5, 6, 7]
    tables = {}
    for lv in levels:
        t0 = time.time()
        tables[lv] = np.asarray(tracer.build_warp_table(dwords, lv))
        print(f"build warp {lv}: {time.time() - t0:.2f}s "
              f"({tables[lv].nbytes / 1e6:.1f} MB)", flush=True)
    tables = {lv: jnp.asarray(t) for lv, t in tables.items()}

    def df(lv):
        def f():
            img, res, _ = tracer.render_frame(
                dwords, oj, dj, sun, shadows=True, mode="beam",
                raw_result=True, u8_image=True,
                warp_table=tables[lv], warp_levels=lv)
            return res.hit.sum()
        return f

    fns = {f"warp{lv}": df(lv) for lv in levels}
    hits = {k: int(np.asarray(f())) for k, f in fns.items()}  # compile+warm
    print("hits:", hits, flush=True)
    assert len(set(hits.values())) == 1, hits
    ts = {k: [] for k in fns}
    for _ in range(4):
        for k, f in fns.items():
            t0 = time.time()
            np.asarray(f())
            ts[k].append(time.time() - t0)
    print("deep10+shadows: " + "  ".join(
        f"{k}={np.median(v) * 1e3:.1f}ms" for k, v in ts.items()), flush=True)


if __name__ == "__main__":
    main()
