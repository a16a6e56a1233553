"""Floating-island terrain SDF (reference: src/procedual.wgsl:109-148)."""

from __future__ import annotations

import jax.numpy as jnp

from .noise import sdf_box, sdf_cone, simplex_noise3, smin, smoothstep


def island_sdf(pos):
    """Signed distance of the island terrain; ``pos`` f32[..., 3] -> f32[...].

    Negative = inside. Composition per the reference: rounded box core, two
    octaves of simplex noise, smin-blended under-spikes, and a spike-noise bias
    term shaped by height and radial distance."""
    v = sdf_box(pos, (0.7, 0.1, 0.7)) - 0.1

    scale = 1.6
    base_noise = simplex_noise3(pos * scale) + 0.5 * simplex_noise3(
        pos * (scale * 2.0)
    )
    v = v + 0.07 * base_noise

    dist = jnp.sqrt(pos[..., 0] ** 2 + pos[..., 2] ** 2)

    cone = (
        sdf_cone(
            pos * jnp.asarray([1.5, -1.5, 1.5], dtype=pos.dtype)
            - jnp.asarray([0.0, 1.0, 0.0], dtype=pos.dtype),
            (0.5, 0.5),
            0.9,
        )
        - 0.1
    )
    v = smin(v, cone, 0.2)

    spike_scale = jnp.asarray([2.3, 0.4, 2.3], dtype=pos.dtype)
    spike_noise = simplex_noise3(pos * spike_scale) + 0.5 * simplex_noise3(
        pos * (spike_scale * 2.0)
    )
    height_bias = smoothstep(0.0, -1.5, pos[..., 1]) + smoothstep(
        0.0, 0.2, pos[..., 1]
    )
    spike_noise = spike_noise + 1.6 * dist + height_bias * 2.0 - 1.0
    v = v + 0.3 * spike_noise

    return v
