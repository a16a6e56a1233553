"""CLI surface: argument wiring and the non-rendering subcommands."""

import json
import os

import numpy as np
import pytest

from octree_tracer_tpu.app import cli

SMALL = "/root/reference/files/small.vox"


def test_render_cmd(tmp_path):
    out = str(tmp_path / "f.png")
    cli.main([
        "render", SMALL, "-o", out, "--width", "32", "--height", "32",
        "--oracle",
    ])
    assert os.path.exists(out)


def test_render_show_steps(tmp_path):
    out = str(tmp_path / "s.png")
    cli.main([
        "render", SMALL, "-o", out, "--width", "16", "--height", "16",
        "--oracle", "--show-steps",
    ])
    assert os.path.exists(out)


def test_export_cmd(tmp_path, capsys):
    out = str(tmp_path / "small.rsvo")
    cli.main(["export", SMALL, "-o", out])
    assert os.path.getsize(out) > 20
    assert "exported" in capsys.readouterr().out


def test_fly_cmd(tmp_path, capsys):
    out = str(tmp_path / "fly_%d.png")
    cli.main([
        "fly", SMALL, "--frames", "2", "--width", "16", "--height", "16",
        "-o", out, "--every", "1",
    ])
    assert os.path.exists(str(tmp_path / "fly_0.png"))
    # Saves lag one frame (fetch overlaps the next step's compute); the
    # final frame comes from the post-loop flush.
    assert os.path.exists(str(tmp_path / "fly_1.png"))
    assert "frame 1" in capsys.readouterr().out
    # Regression: Session frames arrive u8 display-encoded (u8_image=True);
    # save_png must write them verbatim, not re-apply the f32 encode (which
    # collapses u8 input to two-tone {0, 255} garbage).
    from PIL import Image

    px = np.asarray(Image.open(str(tmp_path / "fly_0.png")))
    assert px.shape == (16, 16, 3)
    uniq = np.unique(px)
    assert uniq.size > 2, f"two-tone PNG (values {uniq[:4]}): double-encoded"


def test_genworld_cmd(tmp_path, capsys):
    cli.main([
        "genworld", str(tmp_path / "w"), "--world-depth", "1",
        "--chunk-depth", "4",
    ])
    assert os.path.exists(str(tmp_path / "w" / "0.bin"))


def test_bench_cmd(capsys):
    cli.main([
        "bench", "--scene", SMALL, "--frames", "1", "--width", "32",
        "--height", "32", "--no-shadows",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(out)
    assert data["unit"] == "Mrays/s"
    assert data["value"] > 0


def test_unknown_command():
    with pytest.raises(SystemExit):
        cli.main(["nope"])


def test_headless_backends_agree(tmp_path):
    """The oracle and the JAX tracer produce matching images through the
    public headless API (knife-edge pixel budget)."""
    from octree_tracer_tpu.app.headless import render_scene

    img_o, _ = render_scene(SMALL, width=48, height=48, backend="oracle")
    img_t, _ = render_scene(SMALL, width=48, height=48, backend="tpu")
    diff = np.abs(img_o - img_t).max(axis=-1)
    assert (diff > 1 / 255).mean() < 0.005
