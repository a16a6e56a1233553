"""Headless rendering helpers: scene -> image -> PNG."""

from __future__ import annotations

import numpy as np

from ..io import load_file
from ..render.camera import camera_matrices, default_character, generate_rays


def parse_camera(spec: str | None):
    """'px,py,pz:lx,ly,lz' -> (pos, look); None -> reference spawn
    (src/main.rs:128-136)."""
    if not spec:
        return default_character()
    p, l = spec.split(":")
    pos = np.array([float(x) for x in p.split(",")], dtype=np.float32)
    look = np.array([float(x) for x in l.split(",")], dtype=np.float32)
    return pos, look


def render_scene(
    scene_path: str,
    width: int = 512,
    height: int = 512,
    fov: float = 90.0,
    camera: str | None = None,
    sun_dir=(-1.7, -1.0, 0.8),
    shadows: bool = True,
    show_steps: bool = False,
    show_hits: bool = False,
    misc_bool: bool = False,
    octree_depth: int = 12,
    backend: str = "tpu",
    tile_size: int | None = 128 * 1024,
):
    """Load a scene file and render one frame. ``backend`` 'tpu' runs the JAX
    tracer on the default device; 'oracle' runs the NumPy reference."""
    tree = load_file(scene_path, octree_depth)
    words = tree.to_words()
    pos, look = parse_camera(camera)
    _, cam_inv = camera_matrices(pos, look, fov, width, height)
    origin, dirs = generate_rays(cam_inv, width, height)

    if backend == "oracle":
        from ..render import cpu_reference

        img, result, _ = cpu_reference.render_frame(
            words, origin, dirs, sun_dir=sun_dir, shadows=shadows,
            show_steps=show_steps, strict_descent=not misc_bool,
            gamma=2.2 - 1.2 * misc_bool,
        )
        return np.asarray(img), result

    import jax.numpy as jnp

    from ..render import tracer

    img, result, _ = tracer.render_frame(
        jnp.asarray(words), jnp.asarray(origin), jnp.asarray(dirs),
        jnp.asarray(np.asarray(sun_dir, dtype=np.float32)),
        shadows=shadows, show_steps=show_steps, show_hits=show_hits,
        tile_size=tile_size,
        mode="tiled" if show_hits else "staged",
        misc_bool=misc_bool,
    )
    return np.asarray(img), result


def save_png(img: np.ndarray, path: str) -> None:
    """Write an image as PNG: f32[H,W,3] linear input is display-encoded;
    u8[H,W,3] input (a ``u8_image`` device frame, e.g. ``Session.render``)
    is already encoded and saved verbatim."""
    from PIL import Image

    img = np.asarray(img)
    if img.dtype == np.uint8:
        Image.fromarray(img).save(path)
        return
    # Same encode as the device-side tracer.encode_u8 (truncation, not
    # rounding) so host-saved f32 frames match u8 device frames bit-exactly.
    srgb = np.clip(img, 0.0, 1.0) ** (1.0 / 2.2)
    Image.fromarray((srgb * 255.0).astype(np.uint8)).save(path)
