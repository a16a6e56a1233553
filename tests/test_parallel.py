"""Multi-chip sharding on the 8-device virtual CPU mesh (SURVEY.md §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.parallel import make_mesh, render_frame_sharded, replicate
from octree_tracer_tpu.render import tracer
from octree_tracer_tpu.render.camera import (
    camera_matrices,
    default_character,
    generate_rays,
)

SMALL = "/root/reference/files/small.vox"


@pytest.fixture(scope="module")
def scene():
    words = jnp.asarray(load_file(SMALL).to_words())
    pos, look = default_character()
    _, ci = camera_matrices(pos, look, 90.0, 64, 64)
    o, d = generate_rays(ci, 64, 64)
    return words, jnp.asarray(o), jnp.asarray(d), jnp.asarray(tracer.DEFAULT_SUN)


def test_mesh_has_8_devices():
    m = make_mesh()
    assert m.devices.size == 8


def test_sharded_matches_single_device(scene):
    words, o, d, sun = scene
    m = make_mesh()
    img_s, res_s, vis_s = render_frame_sharded(
        m, replicate(m, words), o, d, sun, with_visits=True
    )
    img_1, res_1, vis_1 = tracer.render_frame(
        words, o, d, sun, with_visits=True, tile_size=None
    )
    np.testing.assert_array_equal(np.asarray(img_s), np.asarray(img_1))
    np.testing.assert_array_equal(np.asarray(vis_s), np.asarray(vis_1))
    np.testing.assert_array_equal(np.asarray(res_s.hit), np.asarray(res_1.hit))
    np.testing.assert_array_equal(
        np.asarray(res_s.index), np.asarray(res_1.index)
    )


def test_sharded_visits_are_psum_reduced(scene):
    words, o, d, sun = scene
    m = make_mesh()
    _, _, vis = render_frame_sharded(
        m, replicate(m, words), o, d, sun, with_visits=True
    )
    # visits must be replicated (global) and positive
    assert int(np.asarray(vis).sum()) > 0


def test_uneven_height_rejected(scene):
    words, o, d, sun = scene
    m = make_mesh()
    with pytest.raises(ValueError):
        render_frame_sharded(m, words, o, d[:63], sun)


def test_sharded_staged_mode_matches(scene):
    words, o, d, sun = scene
    m = make_mesh()
    img_s, res_s, _ = render_frame_sharded(
        m, replicate(m, words), o, d, sun, mode="staged"
    )
    img_1, res_1, _ = tracer.render_frame(words, o, d, sun, tile_size=None)
    np.testing.assert_array_equal(np.asarray(img_s), np.asarray(img_1))
    np.testing.assert_array_equal(np.asarray(res_s.hit), np.asarray(res_1.hit))


def test_sharded_session_full_adaptive_loop():
    """End-to-end streaming over the 8-device mesh: render (rays sharded) ->
    psum visits -> host adaptive engine -> patch broadcast, repeated — the
    pool state must stay bit-equal to a single-chip Session's frame by frame
    (the LOD thresholds read only mode-invariant signals)."""
    from octree_tracer_tpu.app.session import Session
    from octree_tracer_tpu.io import load_file
    from octree_tracer_tpu.parallel import ShardedSession, make_mesh
    from octree_tracer_tpu.world.world import World

    def make():
        world = World(load_blocks=False)
        world.chunks[0] = load_file("/root/reference/files/small.vox")
        world.generate_mip_tree(0)
        return world

    mesh = make_mesh(jax.devices()[:8])
    single = Session(make(), width=32, height=32, pool_capacity=65536)
    shard = ShardedSession(
        make(), mesh, width=32, height=32, pool_capacity=65536
    )

    for frame in range(5):
        img_a, res_a, st_a = single.step()
        img_b, res_b, st_b = shard.step()
        assert st_a == st_b, f"frame {frame}: {st_a} vs {st_b}"
        np.testing.assert_array_equal(
            single.octree.nodes, shard.octree.nodes,
            err_msg=f"host pools diverged at frame {frame}",
        )
        # The single-chip Session renders beam-mode raw_result frames, so
        # its per-ray result rides in block-major order; un-permute before
        # comparing with the sharded session's pixel-order result.
        hit_a = tracer._block_to_pixel(jnp.asarray(res_a.hit), 32, 32, 8)
        np.testing.assert_array_equal(
            np.asarray(hit_a), np.asarray(res_b.hit)
        )
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
    n = len(single.octree)
    np.testing.assert_array_equal(
        np.asarray(single.device_words)[:n], np.asarray(shard.device_words)[:n]
    )
    assert n > 8  # the loop actually streamed detail in


def test_per_shard_work_shrinks_with_mesh():
    """Machine-checked linear-scaling evidence (VERDICT r2 #8): the compiled
    per-device program's flops shrink ~1/N when rays shard over the mesh —
    stage widths derive from the per-shard ray count. The ratio is not
    exactly 1/8: stage-width floors (1024) and replicated pool-sized ops
    stay constant per chip; at 256x256 the measured ratio is ~0.18."""
    import jax.numpy as jnp

    from octree_tracer_tpu.io import load_file
    from octree_tracer_tpu.parallel import mesh as pmesh
    from octree_tracer_tpu.render.camera import (
        camera_matrices, default_character, generate_rays,
    )

    words = jnp.asarray(
        load_file("/root/reference/files/small.vox").to_words()
    )
    pos, look = default_character()
    _, ci = camera_matrices(pos, look, 90.0, 256, 256)
    o, d = generate_rays(ci, 256, 256)
    flops = {}
    for ndev in (1, 8):
        m = pmesh.make_mesh(jax.devices()[:ndev])
        lowered = pmesh._run_sharded.lower(
            m, words, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray([-1.7, -1.0, 0.8], jnp.float32),
            shadows=False, with_visits=False, tile_size=None,
            max_steps=100, mode="staged", beams=None,
            show_steps=False, show_hits=False, misc_bool=False,
        )
        flops[ndev] = lowered.compile().cost_analysis()["flops"]
    assert flops[8] < 0.25 * flops[1], flops


def test_sharded_session_deferred_feedback_parity():
    """Deferred feedback on the mesh: the sharded session's pool evolution
    must stay bit-equal to a single-chip deferred session in lockstep (the
    pending-selection snapshot + one-frame-late consume logic is inherited
    and must compose with psum'd visits / replicated patches)."""
    from octree_tracer_tpu.app.session import Session
    from octree_tracer_tpu.io import load_file
    from octree_tracer_tpu.parallel import ShardedSession, make_mesh
    from octree_tracer_tpu.world.world import World

    def make():
        world = World(load_blocks=False)
        world.chunks[0] = load_file("/root/reference/files/small.vox")
        world.generate_mip_tree(0)
        return world

    mesh = make_mesh(jax.devices()[:8])
    single = Session(make(), width=32, height=32, pool_capacity=65536)
    shard = ShardedSession(
        make(), mesh, width=32, height=32, pool_capacity=65536
    )
    for s in (single, shard):
        s.settings.feedback_every = 2
        s.settings.deferred_feedback = True

    for frame in range(6):
        _, _, st_a = single.step()
        _, _, st_b = shard.step()
        assert st_a == st_b, f"frame {frame}: {st_a} vs {st_b}"
        np.testing.assert_array_equal(
            single.octree.nodes, shard.octree.nodes,
            err_msg=f"host pools diverged at frame {frame}",
        )
    assert len(single.octree) > 8


def test_sharded_session_auto_warp_parity():
    """Forced auto-warp on the mesh (warp_pool_words=1): sharded off-frames
    ride the replicated warp table and must stay bit-equal to the
    single-chip warp session in lockstep (warp restarts are hit-exact)."""
    from octree_tracer_tpu.app.session import Session
    from octree_tracer_tpu.io import load_file
    from octree_tracer_tpu.parallel import ShardedSession, make_mesh
    from octree_tracer_tpu.world.world import World

    def make():
        world = World(load_blocks=False)
        world.chunks[0] = load_file("/root/reference/files/small.vox")
        world.generate_mip_tree(0)
        return world

    mesh = make_mesh(jax.devices()[:8])
    single = Session(make(), width=32, height=32, pool_capacity=65536)
    shard = ShardedSession(
        make(), mesh, width=32, height=32, pool_capacity=65536
    )
    for s in (single, shard):
        s.settings.feedback_every = 2
        s.settings.warp_pool_words = 1

    for frame in range(4):
        img_a, _, st_a = single.step()
        img_b, _, st_b = shard.step()
        assert st_a == st_b, f"frame {frame}: {st_a} vs {st_b}"
        np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
        np.testing.assert_array_equal(
            single.octree.nodes, shard.octree.nodes,
            err_msg=f"host pools diverged at frame {frame}",
        )
    assert shard._warp_table is not None  # off-frames rode the table
