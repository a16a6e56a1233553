"""Probe (2026-08-20, VERDICT r4 #4/#5): deferred feedback + visit flags.

monu10 @ 720p + shadows, converged. Same-process interleaved A/B of the
counted adaptive step under: exact visits (r3 scheme), visit flags, and
flags + deferred feedback (candidate readback consumed one frame later).
Then the double-buffered viewer loop (dispatch k+1, fetch frame k) at
feedback_every 1 and 2 with flags+deferred — the judge's interactive target
is the fb<=2 pipelined median (<100 ms goal, VERDICT r3 #5).
"""

import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World


def timed_steps(sess, k):
    ts = []
    for _ in range(k):
        t0 = time.time()
        img, _, _ = sess.step()
        np.asarray(img)
        ts.append((time.time() - t0) * 1e3)
    return ts


def pipelined(sess, k):
    img, _, _ = sess.step()  # fill
    prev = img
    ts = []
    for _ in range(k):
        t0 = time.time()
        img, _, _ = sess.step()
        np.asarray(prev)
        prev = img
        ts.append((time.time() - t0) * 1e3)
    np.asarray(prev)
    return ts


def main():
    world = World(load_blocks=False)
    world.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
    world.generate_mip_tree(0)
    sess = Session(world, width=1280, height=720)
    st = sess.settings

    for _ in range(30):
        sess.step()
    # warm all variants
    st.visit_flags = False
    np.asarray(sess.step()[0])
    st.visit_flags = True
    np.asarray(sess.step()[0])
    st.deferred_feedback = True
    np.asarray(sess.step()[0])
    np.asarray(sess.step()[0])
    st.deferred_feedback = False
    st.feedback_every = 4
    for _ in range(4):
        np.asarray(sess.step()[0])
    st.feedback_every = 1

    res = {"exact": [], "flags": [], "flags+def": []}
    for rep in range(3):
        st.visit_flags, st.deferred_feedback = False, False
        res["exact"] += timed_steps(sess, 4)
        st.visit_flags = True
        res["flags"] += timed_steps(sess, 4)
        st.deferred_feedback = True
        res["flags+def"] += timed_steps(sess, 4)
        st.deferred_feedback = False
        sess.step()  # drain pending
    for k, v in res.items():
        print(f"counted(fb1) {k:>9}: median {np.median(v):7.1f} ms  "
              f"min {min(v):7.1f}")

    st.visit_flags, st.deferred_feedback = True, True
    for fb in (4, 2, 1):
        st.feedback_every = fb
        pipelined(sess, 4)  # warm cadence mix
        ts = pipelined(sess, 12)
        print(f"pipelined fb{fb} flags+def: median {np.median(ts):7.1f} ms  "
              f"mean {np.mean(ts):7.1f}  max {max(ts):7.1f}")
    print("nodes:", len(sess.octree))


if __name__ == "__main__":
    main()
