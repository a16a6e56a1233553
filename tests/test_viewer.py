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
