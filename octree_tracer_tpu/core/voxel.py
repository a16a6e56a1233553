"""Node/voxel bit formats shared by the host octrees and the TPU kernels.

Two node formats exist, mirroring the reference renderer's data layout
(reference: LAYOUT.md, src/octree.rs:5-34, src/cpu_octree.rs:3-9):

**Streamed (device) node word** — one ``uint32`` per node::

    [31........4][3..0]
      payload     hit counter (4-bit, saturating)

``payload < VOXEL_OFFSET``  -> index of this node's 8-child group.
``payload >= VOXEL_OFFSET`` -> leaf; ``payload - VOXEL_OFFSET`` is an RGB888
colour (``0`` means the empty voxel).

**Ground-truth (chunk) node** — ``(pointer: u32, value: rgb)``:

``pointer <  CHUNK_OFFSET`` -> index of 8-child group.
``pointer == CHUNK_OFFSET`` -> leaf voxel whose colour is ``value``.
``pointer >  CHUNK_OFFSET`` -> reference to chunk/block id
``pointer - CHUNK_OFFSET``; ``value`` doubles as the node's mip colour.
"""

from __future__ import annotations

import numpy as np

# A leaf payload at or above this marks a voxel (reference: src/octree.rs:5).
VOXEL_OFFSET = np.uint32(1 << 27)  # 134217728

# A chunk pointer at or above this marks a leaf / chunk ref
# (reference: src/cpu_octree.rs:3).
CHUNK_OFFSET = np.uint32(1 << 31)  # 2147483648

COUNTER_BITS = 4
COUNTER_MASK = np.uint32(0xF)
COUNTER_MAX = 15


def pack_rgb(r, g, b):
    """RGB888 -> 24-bit colour (reference: src/octree.rs:32-34)."""
    r = np.uint32(r)
    g = np.uint32(g)
    b = np.uint32(b)
    return (r << np.uint32(16)) | (g << np.uint32(8)) | b


def unpack_rgb(value):
    """24-bit colour -> (r, g, b) uint32 triple (reference: src/octree.rs:20-26)."""
    value = np.asarray(value, dtype=np.uint32)
    return (
        (value >> np.uint32(16)) & np.uint32(0xFF),
        (value >> np.uint32(8)) & np.uint32(0xFF),
        value & np.uint32(0xFF),
    )


def leaf_word(rgb24):
    """Streamed leaf word for a 24-bit colour, counter 0
    (reference: src/octree.rs:28-30 ``Voxel::to_value``)."""
    return (VOXEL_OFFSET + np.asarray(rgb24, dtype=np.uint32)) << np.uint32(COUNTER_BITS)


def interior_word(child_index):
    """Streamed interior word pointing at a child group, counter 0
    (reference: src/octree.rs:164 ``create_node``)."""
    return np.asarray(child_index, dtype=np.uint32) << np.uint32(COUNTER_BITS)


def word_payload(word):
    """Strip the hit counter (reference: src/octree.rs:68, src/shader.wgsl:119-121)."""
    return np.asarray(word, dtype=np.uint32) >> np.uint32(COUNTER_BITS)


def word_counter(word):
    """Extract the 4-bit hit counter."""
    return np.asarray(word, dtype=np.uint32) & COUNTER_MASK


def is_leaf_word(word):
    return word_payload(word) >= VOXEL_OFFSET


def child_offset(child_index, depth):
    """Centre offset of child ``child_index`` (0..7) at ``depth`` relative to its
    parent's centre, in the [-1, 1]^3 root cube
    (reference: src/octree.rs:154-161 ``pos_offset``).

    Child bit layout: bit2 = x, bit1 = y, bit0 = z.
    Accepts scalars or arrays; returns float32 array shaped (..., 3).
    """
    ci = np.asarray(child_index)
    x = (ci >> 2) & 1
    y = (ci >> 1) & 1
    z = ci & 1
    xyz = np.stack(
        [x.astype(np.float32), y.astype(np.float32), z.astype(np.float32)], axis=-1
    )
    scale = np.exp2(np.asarray(depth, dtype=np.float32))[..., None]
    return (xyz * 2.0 - 1.0) / scale
