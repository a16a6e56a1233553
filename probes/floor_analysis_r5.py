#!/usr/bin/env python3
"""Floor analysis, round-5 frame (2026-08-21): same method as
floor_analysis.py but on the NEW bench config — combined warp+skip table
(render/skip.py) riding every trace. Classifies EVERY device op of the
monu10@1080p primary frame by provenance.

Method: xprof op_profile of one frame (bench config: beam mode, raw_result,
u8_image) + optimized-HLO dump; each profiled op maps to its HLO metadata
(op kind + jax op_name + source line) and lands in one class:

  body        stage/beam while-loop bodies: the traversal itself (row
              gathers + one-hot selects + step math + record selects)
  compact     fast_nonzero index scatters + compaction gathers/scatters
  fit         per-trip live reduces (fit-based stage advancement)
  transition  state gathers at stage hand-offs
  compose     the backward result-compose gathers (full-width [n,8])
  relayout    transposes/copies (block->pixel permutes, layout copies)
  raygen      ray generation / entry math
  shade       shading + u8 encode
  other       everything else (incl. scheduling gaps are NOT counted)
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

W, H = 1920, 1080

words = jnp.asarray(load_file("/root/reference/files/monu10.vox").to_words())
pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
_, ci = camera_matrices(pos, look, 70.0, W, H)
o, d = generate_rays(ci, W, H)
oj, dj = jnp.asarray(o), jnp.asarray(d)
sun = jnp.asarray(tracer.DEFAULT_SUN)


from octree_tracer_tpu.render.skip import build_warp_skip_table

skip7 = build_warp_skip_table(words, 7)


def frame(words, oj, dj, sun):
    img, res, _ = tracer.render_frame(
        words, oj, dj, sun, shadows=False, mode="beam", raw_result=True,
        u8_image=True, warp_table=skip7,
    )
    return res.hit.sum(), jnp.sum(img, dtype=jnp.uint32)


import time

fj = jax.jit(frame)
np.asarray(fj(words, oj, dj, sun)[0])
t0 = time.time()
for _ in range(3):
    np.asarray(fj(words, oj, dj, sun)[0])
wall_ms = (time.time() - t0) / 3 * 1e3
print(f"synced frame: {wall_ms:.1f} ms", flush=True)

# Same jit instance as the profiled run: a fresh lower() renumbers fusions
# (PERF.md round-3 profiling how-to).
txt = fj.lower(words, oj, dj, sun).compile().as_text()

# name -> (shape, kind, op_name, line)
meta_by_name = {}
for m in re.finditer(r"^\s*%?([\w.\-]+)\s*=\s*(.+)$", txt, re.M):
    name, rest = m.group(1), m.group(2)
    m2 = re.match(r"(.*?)\s*([\w\-]+)\(", rest)
    if not m2:
        continue
    shape, kind = m2.group(1), m2.group(2)
    meta = re.search(r"metadata=\{([^}]*)\}", rest)
    meta = meta.group(1) if meta else ""
    opn = re.search(r'op_name="([^"]*)"', meta)
    line = re.search(r"source_line=(\d+)", meta)
    meta_by_name[name] = (
        shape, kind, opn.group(1) if opn else "",
        int(line.group(1)) if line else 0,
    )

trace_dir = "/tmp/ot_floor_prof_r5"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
np.asarray(fj(words, oj, dj, sun)[0])
jax.profiler.stop_trace()

from xprof.convert import raw_to_tool_data as rtd

runs = glob.glob(f"{trace_dir}/plugins/profile/*")
data, _ = rtd.xspace_to_tool_data(
    glob.glob(runs[-1] + "/*.xplane.pb"), "op_profile",
    {"use_saved_result": False},
)
j = json.loads(data)


def walk(node, depth=0, out=None):
    out = out if out is not None else []
    m = node.get("metrics", {})
    out.append((m.get("rawTime", 0), node.get("name", "?"), depth))
    for c in node.get("children", []):
        walk(c, depth + 1, out)
    return out


items = walk(j.get("byProgram", j))
# deepest-level entries only (leaf ops); strip "and its duplicate(s)"
leaves = {}
for t, n, dpt in items:
    if dpt >= 3 and t > 0:
        base = n.replace(" and its duplicate(s)", "")
        leaves[base] = leaves.get(base, 0) + t


def classify(name):
    shape, kind, opn, line = meta_by_name.get(name, ("?", "?", "", 0))
    o = opn.lower()
    prim = o.split("/")[-1].split(" ")[0] if o else ""
    if "while/body" in o:
        return "body"
    if prim.startswith("scatter") or "cumsum" in o or "cumlogsumexp" in o:
        return "compact"
    if prim.startswith("reduce_"):
        return "fit+reduces"
    if prim.startswith("gather"):
        if shape.startswith(("s32[2073600,8]", "f32[2073600,8]",
                             "u32[2073600,8]")):
            return "compose"
        return "transition"
    if prim in ("select_n", "select") and "while" not in o:
        return "select/merge"
    if kind in ("transpose", "copy", "bitcast", "reshape") or \
            "transpose" in name or "copy" in name or "reshape" in name:
        return "relayout"
    if "shade" in o or "encode" in o or "clip" in o or "power" in o:
        return "shade"
    if "broadcast" in kind or "broadcast" in name:
        return "broadcast"
    return "other"


sums, examples = {}, {}
total = 0
for name, t in leaves.items():
    c = classify(name)
    sums[c] = sums.get(c, 0) + t
    total += t
    if t > examples.get(c, (0, ""))[0]:
        examples[c] = (t, name)
for c in sorted(sums, key=lambda c: -sums[c]):
    t, ex = examples[c]
    shape, kind, opn, line = meta_by_name.get(ex, ("?", "?", "", 0))
    print(f"{sums[c]/1e9:8.2f} ms  {c:<16} (top: {ex} {t/1e9:.2f} ms "
          f"{shape[:24]} @ :{line} {opn.split('/')[-1][:30]})")
# anything still 'other' above 1 ms, list for manual inspection
print("-- other items > 0.8 ms --")
for name, t in sorted(leaves.items(), key=lambda kv: -kv[1]):
    if classify(name) == "other" and t > 0.8e9:
        shape, kind, opn, line = meta_by_name.get(name, ("?", "?", "", 0))
        print(f"  {t/1e9:6.2f} ms {name[:30]} {shape[:28]} "
              f"{opn.split('/')[-1][:40]} @ :{line}")
print(f"{total/1e9:8.2f} ms  DEVICE TOTAL (ops)  | wall {wall_ms:.1f} ms")
