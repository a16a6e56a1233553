"""Ground-truth chunk octree (full-resolution, host-resident).

Re-design of the reference's CPU octree (reference: src/cpu_octree.rs): a
growable SoA of ``(pointer, rgb24)`` pairs instead of a Vec of structs, so whole
trees convert to streamed node words or serialize with single vectorized ops.

Pointer semantics (reference: src/cpu_octree.rs:3-9, LAYOUT.md):
``ptr <  CHUNK_OFFSET``: index of this node's 8-child group.
``ptr == CHUNK_OFFSET``: leaf voxel; colour in ``value`` (black = empty).
``ptr >  CHUNK_OFFSET``: reference to chunk/block id ``ptr - CHUNK_OFFSET``;
``value`` holds the node's mip colour in every case.
"""

from __future__ import annotations

import numpy as np

from .voxel import CHUNK_OFFSET, VOXEL_OFFSET, child_offset, pack_rgb

_DEFAULT_TOP_MIP = pack_rgb(50, 255, 50)  # reference: src/cpu_octree.rs:25
_RED = pack_rgb(255, 0, 0)

# Canonical serialization layout: 8 bytes per node, little-endian —
# u32 pointer, then r, g, b, one zero pad byte. This is the documented
# equivalent of the reference's unsafe struct reinterpret
# (reference: src/cpu_octree.rs:262-272).
BIN_DTYPE = np.dtype(
    [("pointer", "<u4"), ("r", "u1"), ("g", "u1"), ("b", "u1"), ("pad", "u1")]
)


class CpuOctree:
    """Full-resolution ground-truth octree for one chunk."""

    def __init__(self, mask: int = 0, top_mip: int | None = None):
        self._cap = 64
        self._len = 0
        self._ptr = np.zeros(self._cap, dtype=np.uint32)
        self._val = np.zeros(self._cap, dtype=np.uint32)
        self.top_mip = np.uint32(_DEFAULT_TOP_MIP if top_mip is None else top_mip)
        self.add_voxels(mask)

    # -- construction helpers -------------------------------------------------

    @classmethod
    def from_arrays(cls, pointers, values, top_mip: int | None = None,
                    copy: bool = True) -> "CpuOctree":
        tree = cls.__new__(cls)
        pointers = np.ascontiguousarray(pointers, dtype=np.uint32)
        values = np.ascontiguousarray(values, dtype=np.uint32)
        if pointers.shape != values.shape or pointers.ndim != 1:
            raise ValueError("pointers/values must be equal-length 1-D arrays")
        tree._len = pointers.shape[0]
        if not copy and tree._len >= 64:
            # Adopt the buffers (production chunks are ~30M nodes; the copy
            # is 2x 120 MB of pure memmove). Callers must hand over ownership.
            tree._cap = tree._len
            tree._ptr = pointers
            tree._val = values
            tree.top_mip = np.uint32(
                _DEFAULT_TOP_MIP if top_mip is None else top_mip
            )
            return tree
        tree._cap = max(64, tree._len)
        tree._ptr = np.zeros(tree._cap, dtype=np.uint32)
        tree._val = np.zeros(tree._cap, dtype=np.uint32)
        tree._ptr[: tree._len] = pointers
        tree._val[: tree._len] = values
        tree.top_mip = np.uint32(_DEFAULT_TOP_MIP if top_mip is None else top_mip)
        return tree

    def _grow(self, need: int) -> None:
        if need <= self._cap:
            return
        while self._cap < need:
            self._cap *= 2
        ptr = np.zeros(self._cap, dtype=np.uint32)
        val = np.zeros(self._cap, dtype=np.uint32)
        ptr[: self._len] = self._ptr[: self._len]
        val[: self._len] = self._val[: self._len]
        self._ptr = ptr
        self._val = val

    def add_voxels(self, mask: int) -> None:
        """Append one 8-child group. Bits set in ``mask`` become block
        references cycling through block ids 1..8 by slot position — the
        reference's LOD-truncation trick that renders cut-off subtrees as
        library blocks (reference: src/cpu_octree.rs:32-45)."""
        base = self._len
        self._grow(base + 8)
        self._len = base + 8
        for i in range(8):
            if (mask >> i) & 1:
                self._ptr[base + i] = CHUNK_OFFSET + np.uint32((base + i) % 8 + 1)
                self._val[base + i] = _RED
            else:
                self._ptr[base + i] = CHUNK_OFFSET
                self._val[base + i] = 0

    # -- views ----------------------------------------------------------------

    def __len__(self) -> int:
        return self._len

    @property
    def pointers(self) -> np.ndarray:
        return self._ptr[: self._len]

    @property
    def values(self) -> np.ndarray:
        return self._val[: self._len]

    def free_nodes(self) -> None:
        """Drop node storage, keeping ``top_mip`` (world-gen RAM trick,
        reference: src/world.rs:122)."""
        self._len = 0
        self._cap = 64
        self._ptr = np.zeros(self._cap, dtype=np.uint32)
        self._val = np.zeros(self._cap, dtype=np.uint32)

    # -- queries --------------------------------------------------------------

    def find_voxel(self, pos, max_depth: int | None = None):
        """Descend to the leaf (or chunk ref) containing ``pos``; returns
        (index, depth, centre) (reference: src/cpu_octree.rs:48-76)."""
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
            ptr = int(self._ptr[idx])
            if ptr >= int(CHUNK_OFFSET) or depth == (max_depth or 2**31):
                return idx, depth, node_pos
            node_index = ptr

    def get_node_mask(self, node: int) -> np.ndarray:
        """The 8 children's colours starting at slot ``node`` (which points at
        the first child, not the parent) (reference: src/cpu_octree.rs:79-85)."""
        return self._val[node : node + 8].copy()

    # -- mutation -------------------------------------------------------------

    def put_in_voxel(self, pos, rgb24, depth: int) -> None:
        """Insert a voxel colour at ``pos``/``depth``, splitting empty leaves on
        the way down (reference: src/cpu_octree.rs:100-111)."""
        while True:
            node, node_depth, _ = self.find_voxel(pos)
            if node_depth == depth:
                self._ptr[node] = CHUNK_OFFSET
                self._val[node] = np.uint32(rgb24)
                return
            self._ptr[node] = np.uint32(self._len)
            self.add_voxels(0)

    def put_in_block(self, pos, block_id: int, depth: int) -> None:
        """Insert a chunk/block reference at ``pos``/``depth``
        (reference: src/cpu_octree.rs:87-98)."""
        while True:
            node, node_depth, _ = self.find_voxel(pos)
            if node_depth == depth:
                self._ptr[node] = CHUNK_OFFSET + np.uint32(block_id)
                self._val[node] = 0
                return
            self._ptr[node] = np.uint32(self._len)
            self.add_voxels(0)

    def adopt_arrays(self, pointers: np.ndarray, values: np.ndarray) -> None:
        """Replace this tree's storage in place (native batch operations
        return whole new SoA arrays; top_mip and identity are preserved)."""
        pointers = np.ascontiguousarray(pointers, dtype=np.uint32)
        values = np.ascontiguousarray(values, dtype=np.uint32)
        if pointers.shape != values.shape or pointers.ndim != 1:
            raise ValueError("pointers/values must be equal-length 1-D arrays")
        if pointers.shape[0] < 8:
            # A valid tree holds at least the root's 8 children; accepting an
            # empty array would also set _cap = 0 and hang a later _grow.
            raise ValueError("adopted arrays must hold at least 8 nodes")
        self._ptr = pointers
        self._val = values
        self._len = pointers.shape[0]
        self._cap = self._len

    # -- conversion -----------------------------------------------------------

    def to_words(self) -> np.ndarray:
        """Convert the whole tree to streamed node words in one vectorized pass
        (reference: src/cpu_octree.rs:233-252 ``to_octree``). Interior nodes
        keep their child pointers; every ``ptr >= CHUNK_OFFSET`` node becomes a
        leaf carrying its (mip) colour."""
        ptr = self.pointers
        val = self.values
        interior = ptr < CHUNK_OFFSET
        words = np.where(
            interior,
            ptr.astype(np.uint32) << np.uint32(4),
            (VOXEL_OFFSET + val) << np.uint32(4),
        ).astype(np.uint32)
        return words

    def raw(self) -> np.ndarray:
        """Pointer array only (reference: src/cpu_octree.rs:254-260)."""
        return self.pointers.copy()

    # -- serialization --------------------------------------------------------

    def _bin_rec(self) -> np.ndarray:
        rec = np.zeros(self._len, dtype=BIN_DTYPE)
        rec["pointer"] = self.pointers
        rec["r"] = (self.values >> 16) & 0xFF
        rec["g"] = (self.values >> 8) & 0xFF
        rec["b"] = self.values & 0xFF
        return rec

    def to_bin(self) -> bytes:
        """Serialize to the canonical 8-byte-per-node layout (see BIN_DTYPE)."""
        return self._bin_rec().tobytes()

    def to_file(self, path: str) -> None:
        """``to_bin`` straight to disk — ``ndarray.tofile`` skips the
        240 MB intermediate ``bytes`` a production chunk would otherwise
        round-trip through."""
        self._bin_rec().tofile(path)

    @classmethod
    def from_bin(cls, data: bytes) -> "CpuOctree":
        rec = np.frombuffer(data, dtype=BIN_DTYPE)
        values = (
            rec["r"].astype(np.uint32) << 16
            | rec["g"].astype(np.uint32) << 8
            | rec["b"].astype(np.uint32)
        )
        # from_bin resets top_mip to black (reference: src/cpu_octree.rs:266-272)
        return cls.from_arrays(rec["pointer"].copy(), values, top_mip=0)
