"""Procedural generation: SDF terrain evaluated on device, built level-synchronously."""

from .noise import sdf_box, sdf_cone, simplex_noise3, smin, smoothstep
from .procedural import GenSettings, Procedural
from .sdf import island_sdf

__all__ = [
    "GenSettings", "Procedural", "island_sdf", "sdf_box", "sdf_cone",
    "simplex_noise3", "smin", "smoothstep",
]
