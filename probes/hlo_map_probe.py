#!/usr/bin/env python3
"""Map xprof op names (fusion.NNNN) to jax source metadata by dumping the
optimized HLO of the bench-path monu10 frame."""

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


def frame(words, oj, dj, sun):
    img, res, _ = tracer.render_frame(words, oj, dj, sun, shadows=False,
                                      mode="beam")
    return res.hit.sum()


lowered = jax.jit(frame).lower(words, oj, dj, sun)
compiled = lowered.compile()
txt = compiled.as_text()
with open("/tmp/monu10_hlo.txt", "w") as f:
    f.write(txt)
print(f"HLO dumped: {len(txt)} bytes", flush=True)

# Pull the ops of interest from argv (default: the profile's top ops).
names = sys.argv[1:] or [
    "fusion.7291", "fusion.290", "select_reduce_fusion.583", "fusion.202",
    "fusion.7298", "fusion.7027", "broadcast_in_dim.7446", "fusion.241",
    "fusion.243", "fusion.291", "fusion.7024", "fusion.245", "fusion.7028",
    "reshape.5250", "reshape.5251", "copy_bitcast_fusion",
    "bitcast_bitcast_fusion",
]
for n in names:
    # Find the definition line: "  %name = ..." or "  name = ..."
    pat = re.compile(rf"^\s*%?{re.escape(n)}\s*=\s*(.*)$", re.M)
    m = pat.search(txt)
    if not m:
        print(f"{n}: NOT FOUND")
        continue
    line = m.group(1)
    meta = re.search(r'metadata=\{([^}]*)\}', line)
    shape = line.split(" ", 1)[0]
    op_name = ""
    if meta:
        mm = re.search(r'op_name="([^"]*)"', meta.group(1))
        src = re.search(r'source_file="([^"]*)"', meta.group(1))
        srcl = re.search(r'source_line=(\d+)', meta.group(1))
        op_name = (mm.group(1) if mm else "") + " @ " + \
            ((src.group(1).split("/")[-1] + ":" + srcl.group(1))
             if src and srcl else "?")
    print(f"{n}: {shape}\n    {op_name[:300]}")
