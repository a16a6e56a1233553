"""Shader math library in JAX: 3-D simplex noise and SDF primitives.

Vectorized port of the reference's WGSL helpers (reference: src/common.wgsl):
the McEwan/Gustavson simplex noise (common.wgsl:41-106, MIT), rounded-box and
cone SDFs (common.wgsl:109-187), and the polynomial smooth-min
(common.wgsl:189-192). All functions map over arbitrary leading batch dims
with the trailing axis as the vector component.
"""

from __future__ import annotations

import jax.numpy as jnp


def _permute4(x):
    return ((x * 34.0 + 1.0) * x) % 289.0


def _taylor_inv_sqrt4(r):
    return 1.79284291400159 - 0.85373472095314 * r


def simplex_noise3(v):
    """3-D simplex noise; ``v`` is f32[..., 3] -> f32[...]."""
    Cx, Cy = 1.0 / 6.0, 1.0 / 3.0
    D = jnp.array([0.0, 0.5, 1.0, 2.0], dtype=v.dtype)

    s = jnp.sum(v, axis=-1, keepdims=True) * Cy
    i = jnp.floor(v + s)
    t = jnp.sum(i, axis=-1, keepdims=True) * Cx
    x0 = v - i + t

    g = (x0 >= jnp.roll(x0, -1, axis=-1)).astype(v.dtype)  # step(x0.yzx, x0.xyz)
    l = 1.0 - g
    lzxy = jnp.roll(l, 1, axis=-1)
    i1 = jnp.minimum(g, lzxy)
    i2 = jnp.maximum(g, lzxy)

    x1 = x0 - i1 + Cx
    x2 = x0 - i2 + 2.0 * Cx
    x3 = x0 - 1.0 + 3.0 * Cx

    i = i % 289.0
    iz, iy, ix = i[..., 2:3], i[..., 1:2], i[..., 0:1]
    four = jnp.stack(
        [jnp.zeros_like(i1[..., 2]), i1[..., 2], i2[..., 2],
         jnp.ones_like(i1[..., 2])], axis=-1,
    )
    four_y = jnp.stack(
        [jnp.zeros_like(i1[..., 1]), i1[..., 1], i2[..., 1],
         jnp.ones_like(i1[..., 1])], axis=-1,
    )
    four_x = jnp.stack(
        [jnp.zeros_like(i1[..., 0]), i1[..., 0], i2[..., 0],
         jnp.ones_like(i1[..., 0])], axis=-1,
    )
    p = _permute4(_permute4(_permute4(iz + four) + iy + four_y) + ix + four_x)

    n_ = 1.0 / 7.0
    ns_x = n_ * D[3] - D[0]
    ns_y = n_ * D[1] - D[2]
    ns_z = n_ * D[2] - D[0]
    j = p - 49.0 * jnp.floor(p * ns_z * ns_z)
    x_ = jnp.floor(j * ns_z)
    y_ = jnp.floor(j - 7.0 * x_)
    x = x_ * ns_x + ns_y
    y = y_ * ns_x + ns_y
    h = 1.0 - jnp.abs(x) - jnp.abs(y)

    b0 = jnp.concatenate([x[..., 0:2], y[..., 0:2]], axis=-1)
    b1 = jnp.concatenate([x[..., 2:4], y[..., 2:4]], axis=-1)
    s0 = jnp.floor(b0) * 2.0 + 1.0
    s1 = jnp.floor(b1) * 2.0 + 1.0
    sh = -(h <= 0.0).astype(v.dtype)

    a0 = (
        b0[..., (0, 2, 1, 3)]
        + s0[..., (0, 2, 1, 3)] * sh[..., (0, 0, 1, 1)]
    )
    a1 = (
        b1[..., (0, 2, 1, 3)]
        + s1[..., (0, 2, 1, 3)] * sh[..., (2, 2, 3, 3)]
    )
    p0 = jnp.concatenate([a0[..., 0:2], h[..., 0:1]], axis=-1)
    p1 = jnp.concatenate([a0[..., 2:4], h[..., 1:2]], axis=-1)
    p2 = jnp.concatenate([a1[..., 0:2], h[..., 2:3]], axis=-1)
    p3 = jnp.concatenate([a1[..., 2:4], h[..., 3:4]], axis=-1)

    def dot(a, b):
        return jnp.sum(a * b, axis=-1)

    norm = _taylor_inv_sqrt4(
        jnp.stack([dot(p0, p0), dot(p1, p1), dot(p2, p2), dot(p3, p3)], axis=-1)
    )
    p0 = p0 * norm[..., 0:1]
    p1 = p1 * norm[..., 1:2]
    p2 = p2 * norm[..., 2:3]
    p3 = p3 * norm[..., 3:4]

    m = 0.6 - jnp.stack(
        [dot(x0, x0), dot(x1, x1), dot(x2, x2), dot(x3, x3)], axis=-1
    )
    m = jnp.maximum(m, 0.0)
    m = m * m
    grads = jnp.stack(
        [dot(p0, x0), dot(p1, x1), dot(p2, x2), dot(p3, x3)], axis=-1
    )
    return 42.0 * jnp.sum(m * m * grads, axis=-1)


def sdf_box(p, s):
    """Unsigned rounded box (reference: src/common.wgsl:109-112)."""
    q = jnp.abs(p) - jnp.asarray(s, dtype=p.dtype)
    outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
    inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
    return outside + inside


def sdf_cone(p, c, h):
    """Capped cone (reference: src/common.wgsl:114-187 — naga-expanded form of
    Inigo Quilez's sdCappedCone)."""
    c = jnp.asarray(c, dtype=p.dtype)
    q = h * jnp.stack([c[0] / c[1], -jnp.ones_like(c[1])], axis=-1)
    w = jnp.stack(
        [jnp.linalg.norm(p[..., (0, 2)], axis=-1), p[..., 1]], axis=-1
    )

    def dot(a, b):
        return jnp.sum(a * b, axis=-1)

    a = w - q * jnp.clip(dot(w, q) / dot(q, q), 0.0, 1.0)[..., None]
    b = w - q * jnp.stack(
        [jnp.clip(w[..., 0] / q[..., 0], 0.0, 1.0), jnp.ones_like(w[..., 0])],
        axis=-1,
    )
    k = jnp.sign(q[..., 1])
    d = jnp.minimum(dot(a, a), dot(b, b))
    s = jnp.maximum(
        k * (w[..., 0] * q[..., 1] - w[..., 1] * q[..., 0]),
        k * (w[..., 1] - q[..., 1]),
    )
    return jnp.sqrt(d) * jnp.sign(s)


def smin(a, b, k):
    """Polynomial smooth min (reference: src/common.wgsl:189-192)."""
    h = jnp.clip(0.5 + 0.5 * (a - b) / k, 0.0, 1.0)
    return a + (b - a) * h - k * h * (1.0 - h)


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def rotate_x(v, angle):
    """Rotate about +x (reference: src/common.wgsl:1-7)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [v[..., 0], v[..., 1] * c - v[..., 2] * s, v[..., 1] * s + v[..., 2] * c],
        axis=-1,
    )


def rotate_y(v, angle):
    """Rotate about +y (reference: src/common.wgsl:9-15)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [v[..., 0] * c + v[..., 2] * s, v[..., 1], v[..., 2] * c - v[..., 0] * s],
        axis=-1,
    )


def rotate_z(v, angle):
    """Rotate about +z (reference: src/common.wgsl:17-23)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [v[..., 0] * c - v[..., 1] * s, v[..., 0] * s + v[..., 1] * c, v[..., 2]],
        axis=-1,
    )


def rotate(v, axis, angle):
    """Rodrigues rotation about an arbitrary axis
    (reference: src/common.wgsl:25-35)."""
    axis = axis / jnp.linalg.norm(axis)
    c, s = jnp.cos(angle), jnp.sin(angle)
    return (
        v * c
        + jnp.cross(jnp.broadcast_to(axis, v.shape), v) * s
        + axis * jnp.sum(axis * v, axis=-1, keepdims=True) * (1 - c)
    )


def hash_rand(co):
    """Fract-sin hash (reference: src/common.wgsl:37-39)."""
    dot = co[..., 0] * 12.9898 + co[..., 1] * 78.233
    x = jnp.sin(dot) * 43758.5453
    return x - jnp.floor(x)
