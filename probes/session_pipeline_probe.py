"""Double-buffered session frames: fetch frame k while step k+1 computes.

The serialized interactive loop (bench session_metric) pays
compute + u8-fetch per frame: 229 ms median at fb4 through the tunnel
(probes/session_phase_probe.py decomposition: 135.5 ms off-frame device +
~113 ms tunnel fetch of the 2.76 MB u8 frame). A real viewer double-buffers:
dispatch step k+1 (async under JAX dispatch), then fetch frame k — compute
and transfer overlap, steady state = max(compute, fetch) per frame IF the
tunnel allows concurrent transfer+compute (the dead-ends list records
async *dispatch* pipelining as tunnel-flaky; transfer overlap is untested).

Run: python probes/session_pipeline_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World


def make_session():
    w = World(load_blocks=False)
    w.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
    w.generate_mip_tree(0)
    s = Session(w, width=1280, height=720)
    return s


def run(sess, n, pipelined, label):
    ts = []
    prev = None
    for i in range(n):
        t0 = time.time()
        img, _, _ = sess.step()
        if pipelined:
            if prev is not None:
                np.asarray(prev)  # fetch LAST frame; current step in flight
            prev = img
        else:
            np.asarray(img)
        ts.append(time.time() - t0)
    if prev is not None:
        np.asarray(prev)
    med = float(np.median(ts)) * 1e3
    print(f"{label}: median {med:.1f} ms  min {min(ts)*1e3:.1f}  "
          f"all {[round(t*1e3,1) for t in ts]}", flush=True)
    return med


def main():
    sess = make_session()
    for _ in range(4):  # warm: compiles + pool growth
        img, _, _ = sess.step()
        np.asarray(img)
    sess.settings.feedback_every = 4
    for _ in range(4):  # warm the off-frame program
        img, _, _ = sess.step()
        np.asarray(img)

    # Interleave serialized / pipelined twice (same-process A/B rule).
    a1 = run(sess, 8, False, "fb4 serialized  #1")
    b1 = run(sess, 8, True, "fb4 pipelined   #1")
    a2 = run(sess, 8, False, "fb4 serialized  #2")
    b2 = run(sess, 8, True, "fb4 pipelined   #2")
    print(f"serialized median-of-medians {np.median([a1,a2]):.1f} ms, "
          f"pipelined {np.median([b1,b2]):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
