"""Viewer server logic (without sockets): stepping, scene swap, error paths."""

import numpy as np
import pytest

from octree_tracer_tpu.app.session import Session
from octree_tracer_tpu.app.viewer import _PAGE, ViewerServer
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.world.world import World

SMALL = "/root/reference/files/small.vox"


@pytest.fixture(scope="module")
def server():
    world = World(load_blocks=False)
    world.chunks[0] = load_file(SMALL)
    world.generate_mip_tree(0)
    session = Session(world, width=32, height=32, pool_capacity=65536)
    return ViewerServer(session)


def test_initial_frame(server):
    assert server.frame_png.startswith(b"\x89PNG")


def test_step_moves_and_reports(server):
    stats = server.step({"forward": 1.0, "look": [5, 0]})
    assert stats["nodes"] >= 8
    assert "subdivided" in stats and "fps" in stats
    assert server.frame_png.startswith(b"\x89PNG")


def test_step_toggles(server):
    stats = server.step({"show_steps": True, "pause_adaptive": True})
    assert stats == stats  # no crash; toggles applied
    assert server.session.settings.show_steps
    assert server.session.settings.pause_adaptive
    server.step({})  # reset defaults


def test_open_scene_error_surfaces(server):
    msg = server.open_scene("/nonexistent.vox")
    assert msg.startswith("error:")


def test_open_scene_swaps(server):
    msg = server.open_scene("/root/reference/files/monu9.vox")
    assert msg.startswith("loaded")
    # world root swapped to the new scene; the streamed octree was reset and
    # has already begun re-growing via the render inside open_scene
    assert len(server.session.world.chunks[0]) > 1000
    assert len(server.session.octree) >= 8


def test_page_has_reference_controls():
    for control in ("shadows", "show_steps", "show_hits", "pause_adaptive",
                    "misc_bool", "fov", "sx", "scenepath"):
        assert f'id="{control}"' in _PAGE


def test_depth_slider_and_misc_value(server, tmp_path):
    """Reference GUI parity: octree-depth slider (src/app.rs:257-260) sets the
    import depth for the next Open (it truncates .rsvo imports, exactly like
    the reference — .vox imports ignore it, src/cpu_octree.rs:113-125);
    misc_value drag (src/render.rs:317)."""
    from octree_tracer_tpu.io.rsvo_export import save_rsvo

    server.step({"octree_depth": 3, "misc_value": 2.5})
    st = server.session.settings
    assert st.octree_depth == 3 and st.misc_value == 2.5

    rsvo = tmp_path / "monu9.rsvo"
    rsvo.write_bytes(save_rsvo(load_file("/root/reference/files/monu9.vox")))
    msg = server.open_scene(str(rsvo))
    assert msg.startswith("loaded")
    # depth-3 truncation: at most 1+8+64+512 node slots (plus root group)
    assert len(server.session.world.chunks[0]) <= 8 * (1 + 8 + 64)
    server.step({"octree_depth": 12})
    assert 'id="octree_depth"' in _PAGE and 'id="misc_value"' in _PAGE


def test_double_buffered_ticks_lag_one_frame(server):
    """Steady-state ticks are double-buffered: the published frame is the
    PREVIOUS tick's (device fetch overlaps the next frame's compute,
    probes/session_pipeline_probe.py), and a scene swap flushes the stale
    pending frame synchronously so the first post-swap frame is the new
    scene's."""
    server.open_scene("/root/reference/files/monu9.vox")  # sync: no pending
    assert server._pending is None
    server.step({})  # first pipelined tick: shows its own frame, arms pending
    assert server._pending is not None
    png_a = server.frame_png
    server.step({"look": [40, 0]})  # shows the PREVIOUS (pre-turn) frame
    assert server.frame_png == png_a
    server.step({})  # now the post-turn frame surfaces
    assert server.frame_png != png_a
    # Scene swap drops the pending pre-swap frame and publishes the new
    # scene's frame immediately.
    msg = server.open_scene(SMALL)
    assert msg.startswith("loaded")
    assert server._pending is None
    assert server.frame_png.startswith(b"\x89PNG")


def test_regenerate_button(tmp_path):
    """Regenerate (src/app.rs:221-250): new procedural world, octree reset."""
    world = World(load_blocks=True)
    world.path = str(tmp_path / "world")
    world.chunks[0] = load_file(SMALL)  # pre-existing scene gets replaced
    world.generate_mip_tree(0)
    session = Session(world, width=16, height=16, pool_capacity=65536)
    srv = ViewerServer(session)
    msg = srv.regenerate(chunk_depth=4, world_depth=1)
    assert msg.startswith("regenerated"), msg
    assert 0 in srv.session.world.chunks
    assert len(srv.session.octree) >= 8
    assert srv.frame_png.startswith(b"\x89PNG")
