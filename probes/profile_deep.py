#!/usr/bin/env python3
"""xprof op-profile of the deep10 beam frame (primaries or shadows)."""

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
SHADOWS = len(sys.argv) > 1 and sys.argv[1] == "shadows"

t = deep_tree()
words = jnp.asarray(t.to_words())
print(f"deep10 nodes={len(t)}", flush=True)
_, ci = camera_matrices(
    np.array([0.2, 0.3, -2.4], np.float32),
    np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)


warp = tracer.build_warp_table(words, 6)


def frame():
    # Mirror bench.py's deep row: fit+warp, raw_result/u8 frames.
    img, res, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=SHADOWS, mode="beam",
        raw_result=True, u8_image=True, warp_table=warp,
    )
    return res.hit.sum()


np.asarray(frame())
t0 = time.time()
for _ in range(2):
    np.asarray(frame())
print(f"frame: {(time.time()-t0)/2*1e3:.1f} ms", flush=True)

trace_dir = "/tmp/ot_prof_deep"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
np.asarray(frame())
jax.profiler.stop_trace()

from xprof.convert import raw_to_tool_data as rtd
import glob
import json

runs = glob.glob(f"{trace_dir}/plugins/profile/*")
data, _ = rtd.xspace_to_tool_data(glob.glob(runs[-1] + "/*.xplane.pb"),
                                  "op_profile", {"use_saved_result": False})
j = json.loads(data)


def walk(node, depth=0, out=None):
    out = out if out is not None else []
    m = node.get("metrics", {})
    out.append((m.get("rawTime", 0), node.get("name", "?"), depth))
    for c in node.get("children", []):
        walk(c, depth + 1, out)
    return out


items = walk(j.get("byProgram", j))
total = max(t for t, _, _ in items) or 1
leaves = sorted(
    [(t, n) for t, n, dpt in items if dpt >= 3 and t > 0], reverse=True
)[:40]
for t, n in leaves:
    print(f"{t/1e9:8.2f} ms  {100*t/total:5.1f}%  {n[:110]}")
