"""World: chunk store, block library, mip trees, streaming, save/load."""

from .world import BLOCK_NAMES, World

__all__ = ["BLOCK_NAMES", "World"]
