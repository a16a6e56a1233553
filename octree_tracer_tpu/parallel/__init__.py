"""Multi-chip scaling: pixel-tile data parallelism over a jax.sharding.Mesh."""

from .mesh import make_mesh, render_frame_sharded, replicate, shard_rows
from .session import ShardedSession

__all__ = [
    "ShardedSession", "make_mesh", "render_frame_sharded", "replicate",
    "shard_rows",
]
