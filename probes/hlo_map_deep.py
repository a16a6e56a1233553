#!/usr/bin/env python3
"""Print the deep10 bench frame's top ops WITH source provenance, straight
from an existing xprof trace (run probes/profile_deep.py first; the
op_profile JSON nodes carry 'xla.provenance' + 'xla.expression', which is
far more reliable than re-lowering the program and matching fusion
numbers — a re-lowered module numbers its fusions differently)."""

import glob
import json
import sys

from xprof.convert import raw_to_tool_data as rtd

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ot_prof_deep"
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
    name = node.get("name", "?")
    xla = node.get("xla", {})
    print(f"{t/1e9:8.2f} ms  {name[:36]:36s} "
          f"{xla.get('provenance', '')[:110]}\n"
          f"             {xla.get('expression', '')[:130]}")
    seen += 1
    if seen >= 25:
        break
