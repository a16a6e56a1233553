"""Device-side LOD feedback: candidate selection over the node pool.

Replaces the reference's atomic stream-compaction compute pass
(reference: src/compute.wgsl:27-47, src/compute.rs:99-127) with a vectorized
mask + fixed-size ``jnp.nonzero`` compaction — race-free, deterministic
(ascending slot order instead of arbitrary atomic order; the reference
processes an arbitrary subset when the cap overflows, we process the lowest
slots).

Per-frame counters: the reference's 4-bit in-word counters are zeroed by the
full pool re-upload each frame (src/app.rs:113-118), so the scan effectively
sees *this frame's* saturating visit count; ``min(visits, 15)`` reproduces it
exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.voxel import VOXEL_OFFSET
from ..render.tracer import fast_nonzero

# Candidate caps (reference: src/adaptive.rs:3-4). The reference reserves word
# 0 of each buffer for the atomic counter, so its effective cap is N-1.
MAX_SUBDIVISIONS_PER_FRAME = 1024000
MAX_UNSUBDIVISIONS_PER_FRAME = 1024000


@functools.partial(jax.jit, static_argnames=("sub_cap", "unsub_cap"))
def select_candidates(
    words: jax.Array,
    visits: jax.Array,
    node_len: jax.Array,
    sub_cap: int = MAX_SUBDIVISIONS_PER_FRAME - 1,
    unsub_cap: int = MAX_UNSUBDIVISIONS_PER_FRAME - 1,
    offset: jax.Array | int = 0,
):
    """Scan the pool: visited leaves (count >= 4) become subdivision
    candidates, unvisited interior nodes become collapse candidates
    (reference: src/compute.wgsl:35-46).

    ``offset`` rotates the selection priority: candidates are taken in slot
    order starting at ``offset`` (wrapping), so a per-frame overflow of the
    caps cannot permanently starve high slots — the reference's atomic
    compaction has no deterministic order at all, so any order is parity;
    callers advance the offset each frame (Session does). With no overflow
    the selected SET is identical for every offset.

    Returns (sub_idx, sub_count, unsub_idx, unsub_count); index arrays are
    fixed-size, -1 padded.
    """
    n = words.shape[0]
    counter = jnp.minimum(visits, 15)
    payload = words >> jnp.uint32(4)
    slot = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    valid = (words != 0) & (slot < node_len)

    unsub = valid & (counter == 0) & (payload < jnp.uint32(VOXEL_OFFSET))
    sub = valid & (counter >= 4) & (payload > jnp.uint32(VOXEL_OFFSET))

    offset = jnp.asarray(offset, dtype=jnp.int32) % jnp.int32(n)

    def pick(mask, cap):
        rolled = jnp.roll(mask, -offset)
        ri = fast_nonzero(rolled, cap, n)
        idx = (ri + offset) % jnp.int32(n)
        return jnp.where(ri >= n, -1, idx)

    return pick(sub, sub_cap), sub.sum(), pick(unsub, unsub_cap), unsub.sum()


@functools.partial(jax.jit, static_argnames=("sub_cap", "unsub_cap"))
def select_candidates_packed(
    words, visits, node_len,
    sub_cap: int = MAX_SUBDIVISIONS_PER_FRAME - 1,
    unsub_cap: int = MAX_UNSUBDIVISIONS_PER_FRAME - 1,
    offset: jax.Array | int = 0,
):
    """Like select_candidates but returns ONE int32 array
    ``[sub_n, unsub_n, sub_idx..., unsub_idx...]`` so the host needs a single
    device->host transfer per frame (the tunnel costs ~30 ms per sync)."""
    sub_idx, sub_n, unsub_idx, unsub_n = select_candidates(
        words, visits, node_len, sub_cap=sub_cap, unsub_cap=unsub_cap,
        offset=offset,
    )
    return jnp.concatenate([
        jnp.stack([sub_n.astype(jnp.int32), unsub_n.astype(jnp.int32)]),
        sub_idx, unsub_idx,
    ])


@functools.partial(jax.jit, static_argnames=("passes",))
def propagate_visits(words: jax.Array, visits: jax.Array,
                     passes: int = 14) -> jax.Array:
    """Upward closure of the visit set: mark every interior node whose
    subtree was touched (VERDICT r4 #3 — exact counted-frame warp).

    Warp/skip restarts resume a re-descent BELOW ancestors the reference's
    full root re-descent would have counted (src/shader.wgsl:130-161), so
    raw warped visits under-mark shallow interiors and the collapse
    threshold (counter == 0 for interiors, src/compute.wgsl:39-46) could
    fire on nodes rays actually looked through. The exact interior visit
    SET is reconstructible without any extra in-loop work: the reference
    visits interior X iff some ray's descent passes through X, and every
    such descent also touches a node strictly below X (descents only end at
    leaves) — while any tracer restart mode touches the final leaf of each
    descent. Hence

        reference-visited(X)  <=>  some touched node lies in X's subtree,

    which is the fixpoint of ``visit(X) |= any(visit(children(X)))`` over
    the touched set — one pass per tree level, bottom-up (``passes`` >= max
    node depth; extra passes are no-ops). Interior MAGNITUDES remain
    approximate (documented invariant — the thresholds only read the
    interior zero-set); filled-leaf counts are untouched (closure writes
    interiors only). Stale words in free-list holes propagate garbage only
    into hole slots themselves (making a dead interior look visited merely
    skips a no-op collapse).
    """
    payload = (words >> jnp.uint32(4)).astype(jnp.int32)
    interior = (payload < jnp.int32(VOXEL_OFFSET)) & (words != 0)
    pad = (-visits.shape[0]) % 8
    rows = (visits.shape[0] + pad) // 8
    # 8-aligned child groups; clip guards slots whose stale word points past
    # the pool (cannot happen for live nodes, harmless for holes).
    grp = jnp.clip(jnp.where(interior, payload, 0) // 8, 0, rows - 1)

    def one(_, v):
        v8 = jnp.pad(v, (0, pad)) if pad else v
        child_any = (v8.reshape(-1, 8)[grp] > 0).any(axis=1)
        return jnp.where(interior & child_any & (v == 0), 1, v)

    return jax.lax.fori_loop(0, passes, one, visits)


def apply_patches(words: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """Scatter compact host patches into the device pool — the delta-upload
    replacement for the reference's full 40 MB re-upload per frame
    (src/app.rs:113-118). ``idx`` entries of -1 are dropped (bucket padding)."""
    return _apply_patches_jit(words, idx, vals)


@jax.jit
def _apply_patches_jit(words, idx, vals):
    return words.at[idx].set(vals, mode="drop")


def pad_patches(idx, vals, buckets=(256, 4096, 65536, 1048576)):
    """Pad (idx, vals) to the next bucket size so patch application compiles a
    bounded number of shapes."""
    import numpy as np

    n = idx.shape[0]
    for b in buckets:
        if n <= b:
            pidx = np.full(b, -1, dtype=np.int32)
            pvals = np.zeros(b, dtype=np.uint32)
            pidx[:n] = idx
            pvals[:n] = vals
            return pidx, pvals
    raise ValueError(f"patch of {n} words exceeds largest bucket {buckets[-1]}")
