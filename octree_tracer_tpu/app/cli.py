"""Command-line interface.

The reference exposes its features through a GUI (reference: src/app.rs:122-
350: open file/world, regenerate, depth slider, sun, debug toggles); this CLI
exposes the same capabilities headlessly:

  render    one frame of a .vox/.rsvo scene -> PNG
  fly       adaptive streaming fly-through of a scene or saved world
  view      interactive browser viewer (WASD + mouse, egui-like panel)
  genworld  procedurally generate and save a world
  export    write a scene back out as .rsvo
  bench     throughput benchmark (see also bench.py at the repo root)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def cmd_render(args):
    from .headless import render_scene, save_png

    img, result = render_scene(
        args.scene,
        width=args.width, height=args.height, fov=args.fov,
        camera=args.camera,
        sun_dir=tuple(float(x) for x in args.sun.split(",")),
        shadows=not args.no_shadows,
        show_steps=args.show_steps,
        show_hits=args.show_hits,
        misc_bool=args.misc,
        octree_depth=args.depth,
        backend="oracle" if args.oracle else "tpu",
    )
    save_png(img, args.output)
    hits = int(np.asarray(result["hit"] if isinstance(result, dict)
                          else result.hit).sum())
    print(f"rendered {args.scene} -> {args.output} ({hits} hits)")


def cmd_fly(args):
    import os

    from ..world.world import World
    from ..io import load_file
    from .headless import save_png
    from .session import Session

    if os.path.isdir(args.scene):
        world = World.load_world(args.scene)
    else:
        world = World()
        world.chunks[0] = load_file(args.scene, args.depth)
        world.generate_mip_tree(0)

    session = Session(world, width=args.width, height=args.height)
    session.settings.shadows = not args.no_shadows
    session.settings.feedback_every = max(1, args.feedback_every)
    pending = None  # (frame index, device frame) — fetched one tick late so
    # the device->host transfer overlaps the next frame's compute (same
    # double buffering as the viewer; probes/session_pipeline_probe.py).
    for i in range(args.frames):
        t0 = time.time()
        img, _, stats = session.step()
        session.character.move(forward=args.speed)
        dispatch_ms = 1e3 * (time.time() - t0)
        if pending is not None:
            j, pimg = pending
            save_png(np.asarray(pimg), args.output.replace("%d", str(j)))
            pending = None
        if args.output and (i % args.every == 0 or i == args.frames - 1):
            pending = (i, img)
        tick_ms = 1e3 * (time.time() - t0)
        nodes, holes = session.node_stats()
        # "tick" = dispatch + the PREVIOUS frame's overlapped fetch/save
        # (the double-buffered steady-state wall); "dispatch" alone is the
        # number comparable to pre-overlap runs (ADVICE r3).
        timing = (f"{tick_ms:.0f} ms tick ({dispatch_ms:.0f} dispatch)"
                  if args.output else f"{tick_ms:.0f} ms")
        print(
            f"frame {i}: {timing}, "
            f"+{stats['subdivided']} -{stats['collapsed']} nodes, "
            f"pool {nodes / 1e6:.2f}M ({holes:.0f}% holes)"
        )
    if pending is not None:
        j, pimg = pending
        save_png(np.asarray(pimg), args.output.replace("%d", str(j)))


def cmd_genworld(args):
    from ..gen.procedural import Procedural
    from ..world.world import World

    world = World(verbose=True)
    proc = Procedural(chunk_depth=args.chunk_depth,
                      structures=args.structures)
    t0 = time.time()
    world.generate_world(
        args.dir, proc, world_depth=args.world_depth,
        progress=lambda i, n: print(f"{i}/{n} chunks generated"),
    )
    print(f"world written to {args.dir} in {time.time() - t0:.0f}s")


def cmd_bench(args):
    import jax
    import jax.numpy as jnp

    from ..io import load_file
    from ..render import tracer
    from ..render.camera import camera_matrices, generate_rays
    from .headless import parse_camera

    tree = load_file(args.scene, args.depth)
    words = jnp.asarray(tree.to_words())
    pos, look = parse_camera(args.camera or "0.4,0.6,-2.2:-0.2,-0.35,1.0")
    _, cam_inv = camera_matrices(pos, look, args.fov, args.width, args.height)
    origin, dirs = generate_rays(cam_inv, args.width, args.height)
    oj, dj = jnp.asarray(origin), jnp.asarray(dirs)
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    def frame():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=not args.no_shadows, mode="staged",
        )
        return res.hit

    import numpy as _np

    _np.asarray(frame())  # compile + sync
    t0 = time.time()
    for _ in range(args.frames):
        r = _np.asarray(frame())
    dt = (time.time() - t0) / args.frames
    rays = args.width * args.height * (2 if not args.no_shadows else 1)
    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/s",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "frame_ms": round(dt * 1e3, 1),
        "scene": args.scene,
        "resolution": f"{args.width}x{args.height}",
        "shadows": not args.no_shadows,
    }))


def main(argv=None):
    p = argparse.ArgumentParser(prog="octree-tracer-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_common(sp):
        sp.add_argument("--width", type=int, default=512)
        sp.add_argument("--height", type=int, default=512)
        sp.add_argument("--fov", type=float, default=90.0)
        sp.add_argument("--camera", default=None,
                        help="px,py,pz:lx,ly,lz")
        sp.add_argument("--depth", type=int, default=12,
                        help="octree import depth for .rsvo")
        sp.add_argument("--no-shadows", action="store_true")

    sp = sub.add_parser("render", help="render one frame to PNG")
    sp.add_argument("scene")
    sp.add_argument("-o", "--output", default="frame.png")
    sp.add_argument("--sun", default="-1.7,-1.0,0.8")
    sp.add_argument("--show-steps", action="store_true")
    sp.add_argument("--show-hits", action="store_true")
    sp.add_argument("--misc", action="store_true",
                    help=">= descent comparisons + gamma 1.0 (reference misc)")
    sp.add_argument("--oracle", action="store_true",
                    help="use the NumPy reference tracer")
    add_common(sp)
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("fly", help="adaptive streaming fly-through")
    sp.add_argument("scene", help=".vox/.rsvo file or world directory")
    sp.add_argument("--frames", type=int, default=30)
    sp.add_argument("--speed", type=float, default=1.0)
    sp.add_argument("-o", "--output", default=None,
                    help="PNG path; %%d is replaced by the frame index")
    sp.add_argument("--every", type=int, default=10)
    sp.add_argument("--feedback-every", type=int, default=1,
                    help="count visits + adapt LOD every Nth frame "
                         "(off-frames render ~2x faster; counted frames "
                         "keep exact reference semantics)")
    add_common(sp)
    sp.set_defaults(fn=cmd_fly)

    sp = sub.add_parser("view", help="interactive browser viewer")
    sp.add_argument("scene")
    sp.add_argument("--port", type=int, default=8000)
    sp.add_argument("--width", type=int, default=480)
    sp.add_argument("--height", type=int, default=360)
    sp.add_argument("--depth", type=int, default=12)

    def cmd_view(args):
        from .viewer import main as viewer_main

        viewer_main([
            args.scene, "--port", str(args.port), "--width", str(args.width),
            "--height", str(args.height), "--depth", str(args.depth),
        ])

    sp.set_defaults(fn=cmd_view)

    sp = sub.add_parser("export", help="write a scene as .rsvo")
    sp.add_argument("scene")
    sp.add_argument("-o", "--output", required=True)
    sp.add_argument("--depth", type=int, default=12)

    def cmd_export(args):
        from ..io import load_file

        tree = load_file(args.scene, args.depth)
        if args.output.lower().endswith(".vox"):
            # MagicaVoxel export (new capability; the reference only reads
            # .vox). Black #000000 voxels are not representable in the
            # octree encoding (payload VOXEL_OFFSET+0 == empty) and are
            # dropped — they are unhittable in the reference's shader too.
            from ..io.vox_export import save_vox

            data = save_vox(tree)
        else:
            from ..io.rsvo_export import save_rsvo

            data = save_rsvo(tree)
        with open(args.output, "wb") as f:
            f.write(data)
        print(f"exported {args.scene} -> {args.output} ({len(data)} bytes)")

    sp.set_defaults(fn=cmd_export)

    sp = sub.add_parser("genworld", help="generate a procedural world")
    sp.add_argument("dir")
    sp.add_argument("--world-depth", type=int, default=1)
    sp.add_argument("--chunk-depth", type=int, default=9)
    sp.add_argument("--structures", action="store_true",
                    help="stamp trees/crystals on generated grass "
                         "(reference rule, src/procedural.rs:263-295)")
    sp.set_defaults(fn=cmd_genworld)

    sp = sub.add_parser("bench", help="throughput benchmark")
    sp.add_argument("--scene", default="/root/reference/files/monu10.vox")
    sp.add_argument("--frames", type=int, default=5)
    sp.add_argument("--tile-size", type=int, default=64 * 1024)
    add_common(sp)
    sp.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
