#!/usr/bin/env python3
"""xprof op-profile of one steady-state interactive Session step (720p +
shadows, monu10 streaming), with provenance — where does the 188 ms device
frame go vs the ~80-100 ms a 0.44x-ray-count scaled bench frame suggests?
Suspects: with_visits scatter-adds, bucket-sized pool gathers, feedback
scan."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World

world = World(load_blocks=False)
world.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
world.generate_mip_tree(0)
s = Session(world, width=1280, height=720)

for i in range(6):
    t0 = time.time()
    img, _, _ = s.step()
    np.asarray(img)
    print(f"warm {i}: {time.time()-t0:.2f}s nodes={len(s.octree)}",
          flush=True)

trace_dir = "/tmp/ot_prof_sess"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for _ in range(2):
    img, _, _ = s.step()
    np.asarray(img)
jax.profiler.stop_trace()
print("traced 2 steps", flush=True)

import glob
import json

from xprof.convert import raw_to_tool_data as rtd

runs = glob.glob(f"{trace_dir}/plugins/profile/*")
data, _ = rtd.xspace_to_tool_data(
    glob.glob(runs[-1] + "/*.xplane.pb"),
    "op_profile", {"use_saved_result": False})
j = json.loads(data)


def walk(node, depth=0, out=None):
    out = out if out is not None else []
    m = node.get("metrics", {})
    out.append((m.get("rawTime", 0), node, depth))
    for c in node.get("children", []):
        walk(c, depth + 1, out)
    return out


items = walk(j.get("byProgram", j))
items.sort(key=lambda x: -x[0])
seen = 0
for t, node, depth in items:
    if depth < 3:
        continue
    xla = node.get("xla", {})
    print(f"{t/1e9:8.2f} ms  {node.get('name','?')[:34]:34s} "
          f"{xla.get('provenance','')[:100]}")
    seen += 1
    if seen >= 25:
        break
