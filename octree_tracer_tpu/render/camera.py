"""Camera model: projection, view, and per-pixel ray generation.

Replicates the reference's camera math exactly so frames are pixel-comparable:
the custom projection (reference: src/main.rs:139-162 — a diagonal
``diag(aspect*s, s, -1, 1)`` with ``s = 1/tan(fov/2)`` and ``aspect = h/w``),
``look_at_rh`` view, and the fragment shader's inverse-project ray setup
(reference: src/shader.wgsl:54-59, 251-259).
"""

from __future__ import annotations

import functools

import numpy as np


def proj_matrix(fov_deg: float, aspect_h_over_w: float) -> np.ndarray:
    s = 1.0 / np.tan((fov_deg / 2.0) * (np.pi / 180.0))
    return np.diag([aspect_h_over_w * s, s, -1.0, 1.0]).astype(np.float32)


def look_at_rh(eye, center, up) -> np.ndarray:
    """Right-handed look-at view matrix (row-major, applied as ``M @ v``)."""
    eye = np.asarray(eye, dtype=np.float32)
    f = np.asarray(center, dtype=np.float32) - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, np.asarray(up, dtype=np.float32))
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def camera_matrices(pos, look, fov_deg: float, width: int, height: int):
    """(camera, camera_inverse) for a character at ``pos`` looking along
    ``look`` (reference: src/render.rs:191-206)."""
    pos = np.asarray(pos, dtype=np.float32)
    look = np.asarray(look, dtype=np.float32)
    view = look_at_rh(pos, pos + look, np.array([0.0, 1.0, 0.0], dtype=np.float32))
    proj = proj_matrix(fov_deg, height / width)
    camera = (proj @ view).astype(np.float32)
    camera_inverse = np.linalg.inv(camera.astype(np.float64)).astype(np.float32)
    return camera, camera_inverse


def clip_space(width: int, height: int) -> np.ndarray:
    """Per-pixel clip coords, matching the fragment-position convention
    (reference: src/shader.wgsl:54-59): frag_pos is the pixel centre
    (x+0.5, y+0.5) with y down; clip y is flipped."""
    xs = (np.arange(width, dtype=np.float32) + 0.5) / width * 2.0 - 1.0
    ys = ((np.arange(height, dtype=np.float32) + 0.5) / height * 2.0 - 1.0) * -1.0
    cx, cy = np.meshgrid(xs, ys)  # (H, W)
    return np.stack([cx, cy], axis=-1)


def generate_rays(camera_inverse: np.ndarray, width: int, height: int):
    """(origin f32[3], dirs f32[H, W, 3]) via inverse-projection of clip-space
    points at z=1 (reference: src/shader.wgsl:255-259)."""
    ci = camera_inverse.astype(np.float32)
    origin_h = ci @ np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)
    origin = origin_h[:3] / origin_h[3]

    cs = clip_space(width, height)  # (H, W, 2)
    pts = np.concatenate(
        [cs, np.ones(cs.shape[:-1] + (2,), dtype=np.float32)], axis=-1
    )  # (H, W, 4) = (cx, cy, 1, 1)
    world = pts @ ci.T  # (H, W, 4)
    world = world[..., :3] / world[..., 3:4]
    dirs = world - origin
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    return origin.astype(np.float32), dirs.astype(np.float32)


def generate_rays_device(camera_inverse, width: int, height: int,
                         block_major: int = 0):
    """Device-side ``generate_rays``: the same inverse-projection formulas
    evaluated by XLA from the 4x4 inverse camera matrix, so an interactive
    frame uploads 64 BYTES instead of an 11 MB (1080p) precomputed direction
    grid — the tunneled host->device link runs ~32-85 MB/s (PERF.md), which
    made the host grid a ~300 ms/frame tax on the streaming session.

    Directions can differ from the NumPy version by FMA-contraction ulps
    (same class of difference as the documented knife-edge budget); the
    exactness tests keep host-generated rays on both sides of every
    comparison."""
    import jax.numpy as jnp

    return _device_raygen(width, height, block_major)(
        jnp.asarray(camera_inverse, dtype=jnp.float32)
    )


@functools.lru_cache(maxsize=8)
def _device_raygen(w: int, h: int, block: int = 0):
    """Module-level cache of jitted ray-gen programs keyed on (w, h): JAX's
    trace cache is per wrapper instance, so the wrapper must outlive the
    call or every interactive frame re-traces (ADVICE round 2).

    ``block`` > 0 emits the flat f32[h*w, 3] direction array directly in
    BLOCK-MAJOR ray order (``tracer._pixel_to_block`` layout, row-major
    tiles): the pixel coordinate derives from the lane index by integer
    arithmetic, so the tracer's per-frame [n,3] f32 relayout of the
    direction grid disappears entirely (the permutation fuses into the
    direction computation). Bit-identical values, reordered."""
    import jax
    import jax.numpy as jnp

    def f(ci):
        origin_h = ci @ jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
        origin = origin_h[:3] / origin_h[3]
        if block:
            wb = w // block
            lanes = block * block
            i = jnp.arange(h * w, dtype=jnp.int32)
            b, l = i // lanes, i % lanes
            py = (b // wb) * block + l // block
            px = (b % wb) * block + l % block
            cx = (px.astype(jnp.float32) + 0.5) / w * 2.0 - 1.0
            cy = -((py.astype(jnp.float32) + 0.5) / h * 2.0 - 1.0)
        else:
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
            ys = -((jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0)
            cx, cy = jnp.meshgrid(xs, ys)
        ones = jnp.ones_like(cx)
        pts = jnp.stack([cx, cy, ones, ones], axis=-1)
        world = pts @ ci.T
        world = world[..., :3] / world[..., 3:4]
        dirs = world - origin
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        return origin, dirs

    return jax.jit(f)


def default_character():
    """Spawn state (reference: src/main.rs:128-136)."""
    pos = np.array([0.1, 0.2, -1.5], dtype=np.float32)
    look = -np.array([0.0, 0.0, -1.5], dtype=np.float32)
    return pos, look
