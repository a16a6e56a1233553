"""Fixed per-dispatch cost attack (VERDICT r4 #4).

The ~19 ms device-side fixed cost (while-trip scheduling + transitions,
probes/session_offframe_probe.py) bounds 8-chip strong scaling at 3.56x and
is ~30% of a synced single-chip frame. Levers tried here, all interleaved
same-process:

  1. synced vs burst single-chip frame NOW (skip tables cut trip counts
     1.5-2.3x, so the gap may already have moved);
  2. shard-sized frames (1080p/8 rows = what an 8-chip mesh runs per chip):
     body unroll 1/2/4 — the round-4 "unroll flat loss" verdict was measured
     at FULL width where trip overhead amortizes; per-shard widths are 8x
     smaller, so the ~0.26 ms/trip floor is a bigger fraction there;
  3. beam_iters trim at shard scale (16 lockstep trips of fixed cost).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp  # noqa: E402

from octree_tracer_tpu.io import load_file  # noqa: E402
from octree_tracer_tpu.render import tracer  # noqa: E402
from octree_tracer_tpu.render.camera import (  # noqa: E402
    camera_matrices,
    generate_rays,
)
from octree_tracer_tpu.render.skip import build_warp_skip_table  # noqa: E402

W = 1920


def ab(name, fns, reps=5):
    ts = {k: [] for k in fns}
    res = {}
    for k, f in fns.items():
        res[k] = float(np.asarray(f()))
    assert len(set(res.values())) <= 1, res
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.time()
            float(np.asarray(f()))
            ts[k].append((time.time() - t0) * 1e3)
    base = np.median(list(ts.values())[0])
    for k in fns:
        m = np.median(ts[k])
        print(f"  {name} {k:12s}: {m:7.1f} ms (min {min(ts[k]):7.1f}) "
              f"x{base/m:4.2f}", flush=True)


def main():
    words = jnp.asarray(
        load_file("/root/reference/files/monu10.vox").to_words()
    )
    skip7 = build_warp_skip_table(words, 7)
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    for H, label in ((1080, "full"), (136, "shard8")):
        _, ci = camera_matrices(np.array([0.4, 0.6, -2.2], np.float32),
                                np.array([-0.2, -0.35, 1.0], np.float32),
                                70.0, W, H)
        o, d = generate_rays(ci, W, H)
        n = W * H
        oj = jnp.broadcast_to(jnp.asarray(o).reshape(1, 3), (n, 3))
        dj = jnp.asarray(d).reshape(-1, 3)

        def frame(unroll=1, beam_iters=16, tbl=skip7):
            res, _ = tracer.trace_staged(
                words, oj, dj, beam_shape=(H, W, 8), beam_raw=True,
                warp_table=tbl, unroll=unroll, beam_iters=beam_iters,
            )
            return res.hit.sum()

        fns = {
            "u1": jax.jit(lambda: frame()),
            "u2": jax.jit(lambda: frame(unroll=2)),
            "u4": jax.jit(lambda: frame(unroll=4)),
            "u2_beam8": jax.jit(lambda: frame(unroll=2, beam_iters=8)),
        }
        print(f"=== {label} ({W}x{H}) ===", flush=True)
        ab(label, fns)


if __name__ == "__main__":
    main()
