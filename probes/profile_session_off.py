#!/usr/bin/env python3
"""xprof op-profile of the steady-state OFF-frame (pause_adaptive, no visit
counting) at 720p+shadows on a converged monu10 LOD pool (~28K nodes).

probes/session_offframe_probe.py decomposed the synced off-frame:
  720p  shadows 138.5 ms | no-shadows 107.3 | shadow pass 31.3
  360p  shadows  77.6 ms | no-shadows  63.7 | shadow pass 13.9
=> fixed per-dispatch cost ~49 ms no-shadow (~30 ms tunnel RTT + ~19 ms
device-side fixed), variable ~63 ns/ray vs the 1080p bench frame's
~46 ns/ray. This profile asks where the device-side fixed cost and the
per-ray excess live."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World

world = World(load_blocks=False)
world.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
world.generate_mip_tree(0)
s = Session(world, width=1280, height=720)
for i in range(12):
    img, _, _ = s.step()
    np.asarray(img)
s.settings.pause_adaptive = True
print(f"converged nodes={len(s.octree)}", flush=True)


def one():
    img, _ = s.render()
    return int(np.asarray(jnp.sum(img, dtype=jnp.uint32)))


one()  # warm the off-frame program

trace_dir = "/tmp/ot_prof_sess_off"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for _ in range(3):
    one()
jax.profiler.stop_trace()
print("traced 3 off-frames", flush=True)

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
    if seen >= 30:
        break
