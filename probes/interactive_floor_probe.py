"""Probe (2026-08-20, VERDICT r3 #5): can the interactive step go under
100 ms at 720p+shadows through the tunnel?

Decomposes the double-buffered steady state with current round-4 code:
  - off-frame device cost (pause_adaptive, synced on a 4-byte scalar)
  - the same without shadows and at 360p (fixed-vs-variable split)
  - pipelined fb2 loop (flags + deferred feedback)
  - pure dispatch RTT (an empty add synced)
Verdict math goes to PERF.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World


def sync_scalar(x):
    return float(np.asarray(x))


def main():
    # pure dispatch RTT: tiny op, synced
    one = jnp.ones(8, jnp.float32)
    f = jax.jit(lambda x: x.sum())
    sync_scalar(f(one))
    ts = []
    for _ in range(10):
        t0 = time.time()
        sync_scalar(f(one))
        ts.append((time.time() - t0) * 1e3)
    print(f"dispatch RTT (empty op, synced): median {np.median(ts):.1f} ms")

    def make(w, h):
        world = World(load_blocks=False)
        world.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
        world.generate_mip_tree(0)
        s = Session(world, width=w, height=h)
        for _ in range(25):
            s.step()
        return s

    sess = make(1280, 720)
    for shadows in (True, False):
        sess.settings.shadows = shadows
        sess.settings.pause_adaptive = True
        r = sess.render()[1]
        sync_scalar(r.hit.sum())
        ts = []
        for _ in range(8):
            t0 = time.time()
            r = sess.render()[1]
            sync_scalar(r.hit.sum())
            ts.append((time.time() - t0) * 1e3)
        print(f"off-frame device+RTT 720p shadows={shadows}: "
              f"median {np.median(ts):.1f} ms  min {min(ts):.1f}")
    sess.settings.shadows = True
    sess.settings.pause_adaptive = False

    # pipelined fb2 with flags+deferred (the judge's target config)
    st = sess.settings
    st.feedback_every = 2
    st.deferred_feedback = True
    img, _, _ = sess.step()
    np.asarray(img)
    img, _, _ = sess.step()
    prev = img
    ts = []
    for _ in range(12):
        t0 = time.time()
        img, _, _ = sess.step()
        np.asarray(prev)
        prev = img
        ts.append((time.time() - t0) * 1e3)
    np.asarray(prev)
    print(f"pipelined fb2 flags+def 720p+shadows: median {np.median(ts):.1f}"
          f" ms  min {min(ts):.1f}  all {[round(x) for x in ts]}")
    print("nodes:", len(sess.octree))


if __name__ == "__main__":
    main()
