"""End-to-end streaming session: render -> feedback -> adaptive -> patches
(BASELINE.md config 5, adaptive fly-through)."""

import numpy as np
import pytest

from octree_tracer_tpu.app.session import Session, Settings
from octree_tracer_tpu.core import CpuOctree, pack_rgb
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World

SMALL = "/root/reference/files/small.vox"


@pytest.fixture(scope="module")
def session():
    world = World(load_blocks=False)
    world.chunks[0] = load_file(SMALL)
    world.generate_mip_tree(0)
    s = Session(world, width=32, height=32, pool_capacity=65536)
    # These tests pin the reference's synchronous per-step cadence (stats
    # land in the same step); deferral has its own tests below.
    s.settings.deferred_feedback = False
    return s


def test_streaming_lod_grows_pool(session):
    assert len(session.octree) == 8  # seeded from the root mask
    img, result, stats = session.step()
    assert img.shape == (32, 32, 3)
    assert stats["subdivided"] > 0
    assert len(session.octree) > 8
    # a few more frames converge toward full scene detail
    for _ in range(4):
        _, _, stats = session.step()
    assert len(session.octree) >= 8 + 8 * 3


def test_device_pool_matches_host(session):
    n = len(session.octree)
    device = np.asarray(session.device_words)[:n]
    # counters are zero in both (host words are structure-only)
    np.testing.assert_array_equal(device, session.octree.nodes)


def test_pause_adaptive_freezes(session):
    session.settings.pause_adaptive = True
    before = len(session.octree)
    _, _, stats = session.step()
    assert stats == {"subdivided": 0, "collapsed": 0, "patched": 0}
    assert len(session.octree) == before
    session.settings.pause_adaptive = False


def test_feedback_every_cadence():
    """feedback_every=N counts visits + runs the adaptive pass only every
    Nth frame (off-frames are plain renders with zero stats), and the
    cadence keeps progressing — LOD still converges, just N x slower."""
    world = World(load_blocks=False)
    world.chunks[0] = load_file(SMALL)
    world.generate_mip_tree(0)
    s = Session(world, width=32, height=32, pool_capacity=65536)
    s.settings.feedback_every = 2
    s.settings.deferred_feedback = False  # pin stats to their own step
    active = []
    for _ in range(6):
        _, _, stats = s.step()
        active.append(stats["subdivided"] + stats["patched"] > 0)
    # Frames 0, 2, 4 ran the adaptive pass; 1, 3, 5 were render-only.
    assert active[1] is False and active[3] is False and active[5] is False
    assert active[0] and active[2]
    assert len(s.octree) > 8  # still converging


def test_session_auto_warp_bit_identical():
    """Sessions auto-build a warp table once the device pool crosses
    warp_pool_words and pass it to NON-ADAPTIVE frames only (warp jumps
    skip shallow interiors, so visit-counting frames must exclude it —
    the interior zero-set drives collapse). Hit/shade results are exact,
    so frames and the adaptive evolution must be bit-identical to a
    warp-disabled session stepping in lockstep."""
    def make(warp_words):
        world = World(load_blocks=False)
        world.chunks[0] = load_file(SMALL)
        world.generate_mip_tree(0)
        s = Session(world, width=32, height=32, pool_capacity=65536)
        s.settings.warp_pool_words = warp_words
        s.settings.feedback_every = 2  # frames 1, 3 are warp-eligible
        return s

    a, b = make(None), make(1)
    for i in range(4):
        img_a, _, stats_a = a.step()
        img_b, _, stats_b = b.step()
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
        assert stats_a == stats_b, f"frame {i}: {stats_a} vs {stats_b}"
    assert b._warp_table is not None  # the off-frames rode the table
    assert len(a.octree) == len(b.octree) > 8


def test_counted_frame_warp_closure_bit_identical():
    """Round 5 (VERDICT r4 #3): COUNTED frames may ride the warp/skip table
    because feedback.propagate_visits reconstructs the exact interior
    zero-visit set before selection (warp restarts skip shallow interiors —
    the round-3/4 sessions measurably collapsed a node a plain session
    kept, which is why counted frames excluded warp). A warp-on-counted
    session at the reference cadence (fb1) must now track a warp-free
    session bit-identically: images, per-step stats, and the pool."""
    def make(warp_words):
        world = World(load_blocks=False)
        world.chunks[0] = load_file(SMALL)
        world.generate_mip_tree(0)
        s = Session(world, width=32, height=32, pool_capacity=65536)
        s.settings.warp_pool_words = warp_words
        s.settings.deferred_feedback = False
        return s

    looks = (
        [np.array([0.0, 0.0, 1.0], np.float32)] * 4
        + [np.array([0.0, 0.0, -1.0], np.float32)] * 3  # collapse pressure
        + [np.array([0.0, 0.0, 1.0], np.float32)] * 3
    )
    a, b = make(None), make(1)
    for i, look in enumerate(looks):
        a.character.look = look
        b.character.look = look
        img_a, _, stats_a = a.step()
        img_b, _, stats_b = b.step()
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
        assert stats_a == stats_b, f"frame {i}: {stats_a} vs {stats_b}"
    assert b._warp_table is not None  # counted frames actually rode it
    assert b._frame_warped
    np.testing.assert_array_equal(a.octree.nodes, b.octree.nodes)


def test_propagate_visits_closure():
    """Unit: interiors with any touched descendant get marked; untouched
    subtrees stay zero; leaf values are never modified."""
    from octree_tracer_tpu.adaptive import feedback
    from octree_tracer_tpu.core.voxel import VOXEL_OFFSET
    import jax.numpy as jnp

    # pool: root group 0..7; slot 0 -> group 8; slot 8 -> group 16
    words = np.zeros(24, np.uint32)
    words[0] = np.uint32(8 << 4)              # interior -> group 8
    words[1] = np.uint32((VOXEL_OFFSET + 5) << 4)   # filled leaf
    words[2] = np.uint32(VOXEL_OFFSET << 4)   # empty leaf
    words[8] = np.uint32(16 << 4)             # interior -> group 16
    for i in list(range(9, 16)) + list(range(16, 24)):
        words[i] = np.uint32((VOXEL_OFFSET + 1) << 4)
    visits = np.zeros(24, np.int32)
    visits[17] = 3  # deep leaf touched; ancestors 8 and 0 untouched
    out = np.asarray(feedback.propagate_visits(
        jnp.asarray(words), jnp.asarray(visits), passes=6
    ))
    assert out[8] > 0 and out[0] > 0          # closure marked the chain
    assert out[17] == 3                       # leaf counts untouched
    assert out[1] == 0 and out[2] == 0        # untouched leaves stay 0
    # an interior with a fully-untouched subtree stays zero
    words2 = words.copy()
    visits2 = np.zeros(24, np.int32)
    out2 = np.asarray(feedback.propagate_visits(
        jnp.asarray(words2), jnp.asarray(visits2), passes=6
    ))
    assert (out2 == 0).all()


def test_collapse_when_looking_away(session):
    # look away from the scene: visited set shrinks, cold nodes collapse
    session.character.look = np.array([0.0, 0.0, -1.0], dtype=np.float32)
    collapsed = 0
    for _ in range(3):
        _, _, stats = session.step()
        collapsed += stats["collapsed"]
    assert collapsed > 0
    assert len(session.octree.hole_stack) > 0 or collapsed > 0


def test_reset_scene(session):
    chunk = CpuOctree(0)
    chunk.put_in_voxel([0.5, 0.5, 0.5], pack_rgb(1, 2, 3), 1)
    session.reset_scene(chunk)
    assert len(session.octree) == 8
    assert session.world.chunks[0] is chunk


def test_node_stats(session):
    nodes, holes = session.node_stats()
    assert nodes >= 8
    assert 0.0 <= holes <= 100.0


def test_session_soak_consistency():
    """30-frame soak with camera motion: the pool grows then stabilizes,
    holes recycle, and the device pool stays bit-identical to the host
    octree throughout."""
    world = World(load_blocks=False)
    world.chunks[0] = load_file(SMALL)
    world.generate_mip_tree(0)
    s = Session(world, width=24, height=24, pool_capacity=65536)
    sizes = []
    for i in range(30):
        s.step()
        if i % 3 == 0:
            s.character.turn(40.0, 10.0)
        if i % 7 == 0:
            s.character.move(forward=0.5)
        sizes.append(len(s.octree))
        if i % 10 == 9:
            n = len(s.octree)
            np.testing.assert_array_equal(
                np.asarray(s.device_words)[:n], s.octree.nodes
            )
    assert sizes[-1] > 8
    # growth slows: the last third adds fewer nodes than the first third
    assert (sizes[-1] - sizes[20]) <= (sizes[10] - sizes[0]) + 64
    # hole accounting stays sane
    assert 0.0 <= s.octree.hole_fraction() <= 1.0


def test_cap_overflow_rotation_converges():
    """A sub_cap far below the per-frame candidate count must still reach
    every hot leaf across frames (rotating-offset selection): the streamed
    pool keeps growing to the same size an uncapped session reaches."""
    def make():
        world = World(load_blocks=False)
        world.chunks[0] = load_file(SMALL)
        world.generate_mip_tree(0)
        return world

    free = Session(make(), width=32, height=32, pool_capacity=65536)
    for _ in range(6):
        free.step()

    capped = Session(make(), width=32, height=32, pool_capacity=65536)
    capped.settings.sub_cap = 2   # overflows every frame
    capped.settings.unsub_cap = 2
    grew = 0
    for _ in range(60):
        _, _, stats = capped.step()
        grew += stats["subdivided"]
        if len(capped.octree) >= len(free.octree):
            break
    assert len(capped.octree) >= len(free.octree), (
        f"capped session starved: {len(capped.octree)} < {len(free.octree)}"
    )


def test_device_bucket_ladder():
    """The device pool sizes on the coarse bucket ladder (every distinct
    shape is a full frame-program recompile — ~40-60 s via the remote-compile
    tunnel — so growth must cross at most a few rungs)."""
    world = World(load_blocks=False)
    world.chunks[0] = load_file(SMALL)
    world.generate_mip_tree(0)
    s = Session(world, width=32, height=32, pool_capacity=10_000_000)
    assert s.device_words.shape[0] == 1 << 16  # smallest rung
    assert int(np.asarray(s.device_words[0])) == int(s.octree.nodes[0])
    # capacity below the smallest rung degrades to capacity itself
    s2 = Session(world, width=32, height=32, pool_capacity=4096)
    assert s2.device_words.shape[0] == 4096


def test_generate_rays_device_matches_host():
    """Device-side ray generation agrees with the NumPy reference to
    FMA-contraction tolerance (the same class of difference as the
    documented knife-edge budget)."""
    from octree_tracer_tpu.render.camera import (
        camera_matrices,
        generate_rays,
        generate_rays_device,
    )

    pos = np.array([0.3, -0.2, -1.7], np.float32)
    look = np.array([0.1, 0.05, 1.0], np.float32)
    _, ci = camera_matrices(pos, look, 75.0, 64, 48)
    o_h, d_h = generate_rays(ci, 64, 48)
    o_d, d_d = generate_rays_device(ci, 64, 48)
    np.testing.assert_allclose(np.asarray(o_d), o_h, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d_d), d_h, atol=2e-6)


def test_deferred_feedback_converges_identically():
    """Settings.deferred_feedback shifts WHEN patches land by one frame
    (the counted frame dispatches selection; the next frame consumes it).
    Converged state must be identical to the synchronous session; per-frame
    stats lag by one step."""
    def make():
        world = World(load_blocks=False)
        world.chunks[0] = load_file(SMALL)
        world.generate_mip_tree(0)
        return Session(world, width=32, height=32, pool_capacity=65536)

    sync, deferred = make(), make()
    sync.settings.deferred_feedback = False
    deferred.settings.deferred_feedback = True
    first_def = deferred.step()[2]
    # the first deferred step has nothing to consume yet
    assert first_def == {"subdivided": 0, "collapsed": 0, "patched": 0}
    s0 = sync.step()[2]
    # step 2 consumes step 1's selection: identical first mutation batch
    # (both selected against the seed pool with the same visits)
    assert deferred.step()[2] == s0
    # Deferred selection runs against the CURRENT pool (post-apply of the
    # pending batch) with the frame's visits, so every batch applies against
    # exactly the pool it selected from: full convergence rate at fb1 (the
    # round-4 scheme selected on the pre-apply snapshot and wasted every
    # other batch on Doubleup skips), and no stale-slot mutations (ADVICE
    # r4: a candidate into a group freed by the intervening batch would
    # corrupt the pool). The deferred session must track the synchronous
    # one at most ONE step behind, and converge to the identical state.
    # Deferred selection runs against the CURRENT pool (post-apply of the
    # pending batch): no stale-slot mutations (ADVICE r4 — a candidate into
    # a group freed by the intervening batch corrupted the pool) and no
    # wasted Doubleup batches. Depth cadence at fb1 is inherently 2 steps
    # per tree generation (apply -> render -> select is a 2-stage pipeline);
    # at feedback_every >= 2 the apply lag hides inside off-frames.
    for _ in range(14):
        sync.step()
        deferred.step()
    deferred.step()
    assert len(deferred.octree) == len(sync.octree)
    _assert_no_orphan_groups(deferred.octree)
    # converged pools bit-equal
    n = len(sync.octree)
    assert len(deferred.octree) == n
    np.testing.assert_array_equal(sync.octree.nodes, deferred.octree.nodes)
    np.testing.assert_array_equal(
        np.asarray(sync.device_words)[:n],
        np.asarray(deferred.device_words)[:n],
    )


def _assert_no_orphan_groups(octree):
    """Pool-integrity invariant: every allocated child group is either
    reachable from the root or sitting on the hole stack. The round-4
    deferred-feedback staleness bug (ADVICE r4, session.py) leaked groups by
    subdividing slots inside freed groups — a leaked group is unreachable
    AND not a hole, so this partition check catches it."""
    from octree_tracer_tpu.core.voxel import VOXEL_OFFSET

    words = octree.nodes
    n = len(octree)
    reachable = set()
    frontier = [0]  # root group base (slots 0..8)
    while frontier:
        base = frontier.pop()
        if base in reachable:
            continue
        reachable.add(base)
        for slot in range(base, base + 8):
            payload = int(words[slot]) >> 4
            if payload < int(VOXEL_OFFSET) and payload != 0:
                frontier.append(payload)
    holes = set(octree.hole_stack)
    allocated = set(range(8, n, 8))
    assert not (reachable & holes), "hole group still reachable"
    orphans = allocated - (reachable - {0}) - holes
    assert not orphans, f"leaked groups at {sorted(orphans)[:8]}"
    assert (reachable - {0}) | holes == allocated


def test_deferred_feedback_churn_no_leaks():
    """Grow / look-away collapse / regrow under deferred feedback at fb1:
    the selection->apply pipeline must never mutate slots whose group was
    freed in between (stale candidates), which would leak child groups.
    Checked via the reachable+holes partition invariant every step."""
    world = World(load_blocks=False)
    world.chunks[0] = load_file(SMALL)
    world.generate_mip_tree(0)
    s = Session(world, width=32, height=32, pool_capacity=65536)
    s.settings.deferred_feedback = True
    looks = (
        [np.array([0.0, 0.0, 1.0], np.float32)] * 5
        + [np.array([0.0, 0.0, -1.0], np.float32)] * 5
        + [np.array([0.0, 0.0, 1.0], np.float32)] * 5
    )
    for look in looks:
        s.character.look = look
        s.step()
        _assert_no_orphan_groups(s.octree)
        n = len(s.octree)
        np.testing.assert_array_equal(
            np.asarray(s.device_words)[:n], s.octree.nodes
        )


def test_incremental_warp_invalidation_bit_identical():
    """Patched frames now invalidate only the warp-table cells inside each
    patched slot's cell instead of rebuilding the table (VERDICT r3 #6).
    Zeroed cells fall back to exact root restarts, so a streaming session
    (growth, then look-away collapses, then re-growth) must stay
    bit-identical to a warp-disabled session in lockstep — while the table
    itself is NOT rebuilt between patches."""
    def make(warp_words):
        world = World(load_blocks=False)
        world.chunks[0] = load_file(SMALL)
        world.generate_mip_tree(0)
        s = Session(world, width=32, height=32, pool_capacity=65536)
        s.settings.warp_pool_words = warp_words
        s.settings.feedback_every = 2
        return s

    a, b = make(None), make(1)
    for i in range(16):
        if i == 8:  # converged: nudge the camera so frontier-depth nodes
            # collapse/subdivide in SMALL batches (deep slots — the
            # incremental path; early growth patches shallow nodes and
            # legitimately falls back to full rebuilds)
            for s in (a, b):
                s.character.turn(60.0, 25.0)
        if i == 12:
            for s in (a, b):
                s.character.turn(-60.0, -25.0)
        img_a, _, stats_a = a.step()
        img_b, _, stats_b = b.step()
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
        assert stats_a == stats_b, f"frame {i}: {stats_a} vs {stats_b}"
    assert b._warp_table is not None
    # the exactness-critical incremental branch must have actually run
    assert b._warp_incremental > 0, "incremental invalidation never taken"
    np.testing.assert_array_equal(a.octree.nodes, b.octree.nodes)
