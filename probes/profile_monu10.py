#!/usr/bin/env python3
"""xprof op-profile of the monu10 beam frame; prints the top ops by time."""

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
SHADOWS = len(sys.argv) > 1 and sys.argv[1] == "shadows"

words = jnp.asarray(load_file("/root/reference/files/monu10.vox").to_words())
pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
_, ci = camera_matrices(pos, look, 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)


def frame():
    img, res, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=SHADOWS, mode="beam"
    )
    return res.hit.sum()


np.asarray(frame())
t0 = time.time()
for _ in range(3):
    np.asarray(frame())
print(f"frame: {(time.time()-t0)/3*1e3:.1f} ms", flush=True)

trace_dir = "/tmp/ot_prof"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
np.asarray(frame())
jax.profiler.stop_trace()

from xprof.convert import raw_to_tool_data as rtd

import glob

runs = glob.glob(f"{trace_dir}/plugins/profile/*")
params = {"use_saved_result": False}
data, _ = rtd.xspace_to_tool_data(glob.glob(runs[-1] + "/*.xplane.pb"),
                                  "op_profile", params)
import json

j = json.loads(data)


def walk(node, depth=0, out=None):
    out = out if out is not None else []
    m = node.get("metrics", {})
    out.append((m.get("rawTime", 0), node.get("name", "?"), depth))
    for c in node.get("children", []):
        walk(c, depth + 1, out)
    return out


root = j.get("byProgram", j)
items = walk(root)
total = max(t for t, _, _ in items) or 1
# Leaf-ish ops: depth >= 3, sorted by time.
leaves = sorted(
    [(t, n) for t, n, dpt in items if dpt >= 3 and t > 0], reverse=True
)[:40]
for t, n in leaves:
    print(f"{t/1e9:8.2f} ms  {100*t/total:5.1f}%  {n[:110]}")
