"""Streamed octree: the flat uint32 node pool that is mirrored into TPU HBM.

Re-design of the reference's GPU-side octree (reference: src/octree.rs:43-161):
a pointerless-root flat pool whose first 8 slots are the root's children, with a
hole free-list for recycled child groups. Differences from the reference:

* nodes/positions are growable numpy arrays (amortised append) instead of Vec;
* every structural mutation is also recorded in a *patch journal* so the device
  copy can be updated with compact scatter patches instead of re-uploading the
  whole pool each frame (the reference re-uploads all 40 MB per frame,
  src/app.rs:113-118);
* the word's low 4 bits — the reference's in-word saturating hit counter
  (LAYOUT.md:4-8, src/shader.wgsl:157-161) — are spare here: visit counts live
  in a separate race-free scatter-add array (semantically equal because the
  reference resets counters every frame, src/app.rs:113-118; tested in
  test_tracer). Bit 0 is reclaimed by the brick-map path as the brick-root
  flag (render/bricks.py); bits 1-3 remain reserved.
"""

from __future__ import annotations

import numpy as np

from .voxel import (
    VOXEL_OFFSET,
    child_offset,
    interior_word,
    leaf_word,
    word_payload,
)


class Octree:
    """Streamed node pool with subdivide/unsubdivide and hole recycling."""

    def __init__(self, mask_rgb24):
        """``mask_rgb24``: 8 uint32 RGB24 colours for the root's children
        (reference: src/octree.rs:51-66)."""
        mask_rgb24 = np.asarray(mask_rgb24, dtype=np.uint32)
        if mask_rgb24.shape != (8,):
            raise ValueError("root mask must have 8 entries")
        self._cap = 64
        self._len = 8
        self._nodes = np.zeros(self._cap, dtype=np.uint32)
        self._positions = np.zeros((self._cap, 3), dtype=np.float32)
        self._nodes[:8] = leaf_word(mask_rgb24)
        self._positions[:8] = child_offset(np.arange(8), 1)
        self.hole_stack: list[int] = []
        # Patch journal: slot indices whose words changed since last drain.
        self._dirty: list[tuple[int, int]] = []  # (start, stop) spans
        # Freed-group journal: child-group base slots released by
        # unsubdivide since the last drain_freed(). Consumers (the session's
        # deferred-feedback path) use it to drop stale candidates that index
        # into groups freed by an intervening batch.
        self._freed: list[int] = []

    # -- views ---------------------------------------------------------------

    def __len__(self) -> int:
        return self._len

    @property
    def nodes(self) -> np.ndarray:
        """Live view of the node words (length == len(self))."""
        return self._nodes[: self._len]

    @property
    def positions(self) -> np.ndarray:
        """Live view of node-centre positions (CPU-only shadow array)."""
        return self._positions[: self._len]

    def get_node(self, index: int) -> int:
        """Payload of node ``index`` (reference: src/octree.rs:68)."""
        return int(word_payload(self._nodes[index]))

    def expanded(self, size: int) -> np.ndarray:
        """Zero-padded copy of the pool (reference: src/octree.rs:143-148)."""
        out = np.zeros(size, dtype=np.uint32)
        out[: self._len] = self.nodes
        return out

    # -- mutation ------------------------------------------------------------

    def _grow(self, need: int) -> None:
        while self._cap < need:
            self._cap *= 2
        if self._nodes.shape[0] < self._cap:
            nodes = np.zeros(self._cap, dtype=np.uint32)
            nodes[: self._len] = self._nodes[: self._len]
            positions = np.zeros((self._cap, 3), dtype=np.float32)
            positions[: self._len] = self._positions[: self._len]
            self._nodes = nodes
            self._positions = positions

    def _mark(self, start: int, stop: int) -> None:
        self._dirty.append((start, stop))

    def subdivide(self, node: int, mask_rgb24, depth: int) -> None:
        """Replace leaf ``node`` with an interior node whose 8 children take the
        colours ``mask_rgb24``; recycles a hole if one is available
        (reference: src/octree.rs:72-93)."""
        if self.get_node(node) < int(VOXEL_OFFSET):
            raise ValueError(f"node {node} already subdivided")
        mask_rgb24 = np.asarray(mask_rgb24, dtype=np.uint32)
        pos = self._positions[node]
        if self.hole_stack:
            index = self.hole_stack.pop()
        else:
            index = self._len
            self._grow(index + 8)
            self._len += 8
        self._nodes[node] = interior_word(index)
        self._nodes[index : index + 8] = leaf_word(mask_rgb24)
        self._positions[index : index + 8] = pos + child_offset(np.arange(8), depth)
        self._mark(node, node + 1)
        self._mark(index, index + 8)

    def unsubdivide(self, node: int) -> None:
        """Collapse interior ``node``: push its child group on the hole stack and
        mark it with a placeholder colour until the caller writes the proper mip
        colour (reference: src/octree.rs:95-110)."""
        tnipt = self.get_node(node)
        if tnipt >= int(VOXEL_OFFSET):
            return  # not subdivided; mirrors the reference's soft warning
        self.hole_stack.append(tnipt)
        self._freed.append(tnipt)
        self._nodes[node] = leaf_word(np.uint32(255 << 16))  # red placeholder
        self._mark(node, node + 1)

    def set_leaf(self, node: int, rgb24) -> None:
        """Write a leaf colour into slot ``node`` (used by the adaptive engine to
        stamp the world's mip colour after a collapse, reference:
        src/adaptive.rs:116)."""
        self._nodes[node] = leaf_word(np.uint32(rgb24))
        self._mark(node, node + 1)

    # -- queries -------------------------------------------------------------

    def find_voxel(self, pos, max_depth: int | None = None):
        """Point-location descent from the root; returns (index, depth, centre)
        (reference: src/octree.rs:113-141; uses ``>=`` comparisons)."""
        pos = np.asarray(pos, dtype=np.float32)
        node_index = 0
        node_pos = np.zeros(3, dtype=np.float32)
        depth = 0
        while True:
            depth += 1
            p = (pos >= node_pos).astype(np.int64)
            child_index = int(p[0] * 4 + p[1] * 2 + p[2])
            node_pos = node_pos + child_offset(child_index, depth)
            idx = node_index + child_index
            payload = self.get_node(idx)
            if payload >= int(VOXEL_OFFSET) or depth == (max_depth or 2**31):
                return idx, depth, node_pos
            node_index = payload

    def hole_fraction(self) -> float:
        """Fraction of pool slots sitting in holes (GUI stat,
        reference: src/app.rs:132-134)."""
        return 8.0 * len(self.hole_stack) / max(1, self._len)

    # -- patch journal -------------------------------------------------------

    def drain_freed(self) -> np.ndarray:
        """Slot indices of every child group freed (unsubdivided) since the
        last drain — the 8 slots of each released group. Whether a group was
        since *reused* by a subdivide does not matter to the consumer: either
        way the slots no longer hold the nodes a pre-collapse candidate list
        referred to."""
        if not self._freed:
            return np.zeros(0, dtype=np.int64)
        bases = np.asarray(self._freed, dtype=np.int64)
        self._freed = []
        return (bases[:, None] + np.arange(8, dtype=np.int64)[None]).reshape(-1)

    def drain_patches(self):
        """Return (indices, words) for all slots touched since the last drain and
        clear the journal. Device update is ``pool = pool.at[idx].set(words)``."""
        if not self._dirty:
            return (
                np.zeros(0, dtype=np.int32),
                np.zeros(0, dtype=np.uint32),
            )
        spans = self._dirty
        self._dirty = []
        idx = np.concatenate([np.arange(a, b, dtype=np.int32) for a, b in spans])
        idx = np.unique(idx)
        return idx, self._nodes[idx]
