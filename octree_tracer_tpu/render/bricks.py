"""Brick maps: 4x4x4 occupancy bitmasks for bottom-of-tree DDA marching.

The gather wall (PERF.md) prices every tree access at ~12-18 ns per fetched
row; near a surface the wavefront tracer pays ~2 rows per leaf cell crossed
(one re-descent + one boundary step). A *brick* collapses an interior node
whose subtree height is <= 2 into one 8-word row:

    w0  bit 0      valid flag (always 1 in a stored brick row)
        bits 1-8   coarse-leaf mask: child ``c`` is a leaf (not interior)
    w1  occupancy bits  0-31  (fine cell bit = ccode*8 + gcode)
    w2  occupancy bits 32-63
    w3  children group index (the brick root's payload)
    w4-w7  zero (reserved)

A ray positioned at a brick root fetches that single row and then marches
the 4x4x4 fine grid with *pure arithmetic* — point location is the same two
compare-per-axis decisions the tree descent makes, the boundary step uses the
actual leaf cell (coarse when the coarse-leaf mask says so), and hits hand
back to the ordinary descent — so results are bit-identical to the plain
traversal (tests assert it) while empty-space marching inside detailed
regions costs ~one gather per brick instead of ~two per cell.

Occupancy replicates a filled/empty *coarse* leaf into all 8 of its fine
bits, so the fine-granularity occupancy test answers "is the actual leaf at
this position filled" for every position in the brick.

Brick validity is advertised in bit 0 of the *decorated* node word so a
descending ray knows to switch modes without an extra fetch: the reference
keeps a 4-bit hit counter in those bits (reference: LAYOUT.md:4-8,
src/shader.wgsl:157-161) which this rebuild replaced with a separate visits
array, so the low nibble is free. ``word >> 4`` payload semantics are
unchanged; the canonical host pool stays undecorated.
"""

from __future__ import annotations

import numpy as np

from ..core.voxel import VOXEL_OFFSET

BRICK_VALID = 1  # bit 0 of w0 / of the decorated node word


def build_bricks_np(words: np.ndarray):
    """NumPy brick builder (host side, used by the Session and tests).

    Returns ``(words_dec, bricks)``: the decorated pool (bit 0 set on valid
    brick roots) and the (pool, 8) uint32 brick-row table (zeros for
    non-brick slots).
    """
    words = np.ascontiguousarray(words, dtype=np.uint32)
    pool = words.shape[0]
    pad = (-pool) % 8
    wp = np.pad(words, (0, pad))
    w2d = wp.reshape(-1, 8)
    voff = np.uint32(VOXEL_OFFSET)

    payload = words >> np.uint32(4)
    interior = payload < voff
    # Group pointers are 8-aligned (pool invariant); clamp to keep the padded
    # table in range for garbage/hole words.
    grp = np.minimum(payload, np.uint32(w2d.shape[0] * 8 - 8))
    children = w2d[grp // 8]                      # (pool, 8)
    cp = children >> np.uint32(4)
    child_leaf = cp >= voff                       # (pool, 8)
    child_filled = cp > voff
    ggrp = np.minimum(np.where(child_leaf, 0, cp), np.uint32(w2d.shape[0] * 8 - 8))
    grand = w2d[ggrp.reshape(-1) // 8].reshape(pool, 8, 8)
    gp = grand >> np.uint32(4)
    g_leaf = gp >= voff
    g_filled = gp > voff

    # word==0 slots (free-list holes, padding) also decode as interior with
    # payload 0; exclude them so decoration stays confined to live nodes.
    valid = (
        interior
        & (words != 0)
        & np.all(child_leaf | np.all(g_leaf, axis=2), axis=1)
    )

    occ = np.where(child_leaf[:, :, None], child_filled[:, :, None], g_filled)
    shifts = np.arange(8, dtype=np.uint32)
    cbytes = (occ.astype(np.uint32) << shifts).sum(axis=2).astype(np.uint32)
    lo = (
        cbytes[:, 0]
        | (cbytes[:, 1] << np.uint32(8))
        | (cbytes[:, 2] << np.uint32(16))
        | (cbytes[:, 3] << np.uint32(24))
    )
    hi = (
        cbytes[:, 4]
        | (cbytes[:, 5] << np.uint32(8))
        | (cbytes[:, 6] << np.uint32(16))
        | (cbytes[:, 7] << np.uint32(24))
    )
    w0 = np.uint32(BRICK_VALID) | (
        (child_leaf.astype(np.uint32) << (shifts + np.uint32(1))).sum(axis=1)
    ).astype(np.uint32)

    bricks = np.zeros((pool, 8), dtype=np.uint32)
    bricks[valid, 0] = w0[valid]
    bricks[valid, 1] = lo[valid]
    bricks[valid, 2] = hi[valid]
    bricks[valid, 3] = payload[valid]

    words_dec = words | valid.astype(np.uint32)
    return words_dec, bricks


def build_bricks(words):
    """JAX brick builder (device side, full rebuild for static scenes).

    Same contract as :func:`build_bricks_np`; runs as one fused pass of row
    gathers over the pool (~ms for typical scenes).
    """
    import jax.numpy as jnp

    words = words.astype(jnp.uint32)
    pool = words.shape[0]
    pad = (-pool) % 8
    wp = jnp.pad(words, (0, pad))
    w2d = wp.reshape(-1, 8)
    voff = jnp.uint32(VOXEL_OFFSET)
    cap = jnp.uint32(w2d.shape[0] * 8 - 8)

    payload = words >> jnp.uint32(4)
    interior = payload < voff
    grp = jnp.minimum(payload, cap)
    children = w2d[grp // 8]
    cp = children >> jnp.uint32(4)
    child_leaf = cp >= voff
    child_filled = cp > voff
    ggrp = jnp.minimum(jnp.where(child_leaf, jnp.uint32(0), cp), cap)
    grand = w2d[ggrp.reshape(-1) // 8].reshape(pool, 8, 8)
    gp = grand >> jnp.uint32(4)
    g_leaf = gp >= voff
    g_filled = gp > voff

    valid = (
        interior
        & (words != 0)
        & jnp.all(child_leaf | jnp.all(g_leaf, axis=2), axis=1)
    )

    occ = jnp.where(child_leaf[:, :, None], child_filled[:, :, None], g_filled)
    shifts = jnp.arange(8, dtype=jnp.uint32)
    cbytes = (occ.astype(jnp.uint32) << shifts).sum(
        axis=2, dtype=jnp.uint32
    )
    lo = (
        cbytes[:, 0]
        | (cbytes[:, 1] << jnp.uint32(8))
        | (cbytes[:, 2] << jnp.uint32(16))
        | (cbytes[:, 3] << jnp.uint32(24))
    )
    hi = (
        cbytes[:, 4]
        | (cbytes[:, 5] << jnp.uint32(8))
        | (cbytes[:, 6] << jnp.uint32(16))
        | (cbytes[:, 7] << jnp.uint32(24))
    )
    w0 = jnp.uint32(BRICK_VALID) | (
        (child_leaf.astype(jnp.uint32) << (shifts + jnp.uint32(1))).sum(
            axis=1, dtype=jnp.uint32
        )
    )

    v32 = valid.astype(jnp.uint32)
    z = jnp.zeros(pool, dtype=jnp.uint32)
    bricks = jnp.stack(
        [w0 * v32, lo * v32, hi * v32, payload * v32, z, z, z, z], axis=1
    )
    words_dec = words | v32
    return words_dec, bricks
