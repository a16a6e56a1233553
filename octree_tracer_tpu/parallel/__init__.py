"""Multi-chip scaling: pixel-tile data parallelism over a jax.sharding.Mesh."""

from .mesh import make_mesh, render_frame_sharded, replicate, shard_rows

__all__ = ["make_mesh", "render_frame_sharded", "replicate", "shard_rows"]
