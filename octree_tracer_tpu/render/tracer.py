"""TPU wavefront tracer — the hot path, in pure JAX/XLA.

The reference's per-pixel re-descend-from-root loop (reference:
src/shader.wgsl:130-248) is recast as a *unified masked lane-parallel loop*:
each ``lax.while_loop`` iteration advances every active ray by exactly one
descent level, or — when the ray sits on an empty leaf — by one t_max boundary
step plus a root restart. Every iteration is a single uint32 gather plus VPU
element-wise math, so lanes never diverge structurally; finished rays are
masked out and the loop exits when the whole wavefront is done.

Hit counters are accumulated as per-iteration scatter-adds into a separate
visit-count array instead of the shader's non-atomic read-modify-write
(src/shader.wgsl:157-161) — race-free and exactly equivalent because the
reference zeroes counters with its full re-upload every frame
(src/app.rs:113-118).

Semantics are float32-identical to ``render.cpu_reference`` (the NumPy
oracle); tests assert hit-voxel-exact agreement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.voxel import VOXEL_OFFSET

MAX_STEPS = 100

# Pool size (u32 words) above which the traversal row gather runs at the
# big-pool rate (~20 ns/row in-loop vs ~9 below the VMEM-residency break,
# measured in (4.2, 16.8] MB — PERF.md round-3 gather characterization).
# Above it the default stage pyramids trade differently: straggler
# iterations cost width x the dearer gather, so sparse wavefronts take a
# longer, narrower-completing ladder, and the per-iteration body fuses the
# sibling step (more VPU math for fewer iterations).
BIG_POOL_WORDS = 1 << 22  # 16 MB
# XLA's row-gather lowering is fast only up to ~2^17 table ROWS (measured,
# probes/row_width_probe.py grid — the break is on row count, not bytes).
# Pools beyond 2^17 groups re-pack as 72-wide rows of 9 groups (pack9),
# halving the in-loop fetch cost (probes/pack72_probe.py).
PACK_POOL_WORDS = 1 << 20  # 4.2 MB = 2^17 groups
# Plain Python floats: weakly-typed in jax (round to the same f32 values the
# reference uses) and keep module import from initializing a backend.
_EPS_DIR = 1e-6
_EPS_NUDGE = 2e-6
_EPS_SHADOW = 2.5e-6
DEFAULT_SUN = (-1.7, -1.0, 0.8)  # reference: src/render.rs:312


class TraceResult(NamedTuple):
    hit: jax.Array        # bool[N]
    forced: jax.Array     # bool[N] — 100-step-cap forced hits
    index: jax.Array      # int32[N] node slot of the hit leaf (-1 otherwise)
    hit_pos: jax.Array    # f32[N,3]
    normal: jax.Array     # f32[N,3]
    steps: jax.Array      # int32[N]
    depth: jax.Array      # int32[N]
    word: jax.Array       # uint32[N] raw pool word of the hit leaf; equals
    #                       words[index] for real hits, 0 on miss/forced.
    #                       Recorded during traversal so shading needs no
    #                       full-width gather (src/shader.wgsl:251-305 re-calls
    #                       node(); here the word rides the result).


def fast_ranks(mask: jax.Array) -> jax.Array:
    """Exclusive rank of each true element (position among the trues), via a
    two-level cumsum: XLA's native 1-D cumsum lowering costs ~18 ns/elem on
    v5e while the blocked row/column formulation is ~1 ns/elem (PERF.md)."""
    n = mask.shape[0]
    cols = 256
    rows = -(-n // cols)
    pad = rows * cols - n
    m = jnp.pad(mask, (0, pad)).reshape(rows, cols)
    x = m.astype(jnp.int32)
    within = jnp.cumsum(x, axis=1)
    rowtot = within[:, -1]
    offs = jnp.cumsum(rowtot) - rowtot
    return (within + offs[:, None]).reshape(-1)[:n] - 1


def fast_nonzero(
    mask: jax.Array, size: int, fill_value: int, ranks: jax.Array = None
) -> jax.Array:
    """``jnp.nonzero(mask, size=size, fill_value=fill)[0]``; ``ranks`` may be
    passed in when the caller already holds ``fast_ranks(mask)``."""
    n = mask.shape[0]
    if ranks is None:
        ranks = fast_ranks(mask)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    out = jnp.full(size, fill_value, dtype=jnp.int32)
    tgt = jnp.where(mask & (ranks < size), ranks, size)
    return out.at[tgt].set(idx, mode="drop")


def _in_bounds(v: jax.Array) -> jax.Array:
    """All components in [-1, 1) (reference: src/shader.wgsl:177-180)."""
    return jnp.all((v >= -1.0) & (v < 1.0), axis=-1)


def _row_select(rows: jax.Array, child: jax.Array) -> jax.Array:
    """Pick ``rows[i, child[i]]`` from (w, 8) rows via a binary mux tree —
    three shrinking element-wise selects. The obvious one-hot masked sum
    lowers to a minor-axis reduce that costs ~0.4 ms per iteration at 518K
    width on v5e; the mux tree stays inside the element-wise fusion."""
    b2 = (child & 4) != 0
    r4 = jnp.where(b2[:, None], rows[:, 4:8], rows[:, 0:4])
    b1 = (child & 2) != 0
    r2 = jnp.where(b1[:, None], r4[:, 2:4], r4[:, 0:2])
    b0 = (child & 1) != 0
    return jnp.where(b0, r2[:, 1], r2[:, 0])


def _ray_box_dist(pos: jax.Array, dirs: jax.Array) -> jax.Array:
    """Slab entry distance to the root cube, 0 == miss
    (reference: src/shader.wgsl:66-80)."""
    t1 = (-1.0 - pos) / dirs
    t2 = (1.0 - pos) / dirs
    v7 = jnp.minimum(t1, t2).max(axis=-1)
    v8 = jnp.maximum(t1, t2).min(axis=-1)
    return jnp.where((v8 < 0.0) | (v7 > v8), 0.0, v7)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_steps", "strict_descent", "with_visits", "max_iters",
        "parent_restart", "unroll", "warp_levels", "fuse_sibling",
        "brick_k", "paged", "visit_flags",
    ),
)
def trace(
    words: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    active_init: jax.Array | None = None,
    max_steps: int = MAX_STEPS,
    strict_descent: bool = True,
    with_visits: bool = False,
    max_iters: int | None = None,
    parent_restart: bool = True,
    unroll: int = 1,
    start=None,
    warp_table=None,
    warp_levels: int | None = None,
    fuse_sibling: bool = False,
    bricks: jax.Array | None = None,
    brick_k: int = 4,
    paged: tuple | None = None,
    visit_flags: bool = False,
):
    """Trace ``dirs.shape[0]`` rays through node pool ``words`` (uint32[pool]).

    ``visit_flags``: record visits as 0/1 touched flags (scatter-SET, ~28%
    cheaper in-loop than the exact scatter-add — see ``_visit_mark``). The
    interior zero-set stays exact; FILLED-leaf counts must then be
    reconstructed by the caller from the hit indices (``render_frame`` does).

    ``origins`` is f32[N,3] (broadcast upstream for shared-origin primaries).
    ``active_init`` masks rays off entirely (shadow pass for miss pixels).
    Returns (TraceResult, visits) where visits is int32[pool] when
    ``with_visits`` else None.

    ``parent_restart`` enables the stackless short-stack optimization: after a
    boundary step, if the new position provably stays inside the current leaf's
    parent cell, the next descent starts from the parent instead of the root —
    one gather per sibling step instead of a depth-long chain. The in-cell test
    uses the same ``(lo, hi]`` boundary semantics the strict ``>`` descent
    induces, and falls back to a root restart whenever it fails, so hit results
    are bit-identical to the reference's full re-descent
    (src/shader.wgsl:213-245). Per-node *visit counts* then only cover the
    levels actually re-descended; the adaptive thresholds are unaffected
    (leaf counts are identical — one visit per step — and an interior node's
    count is zero iff no ray entered its subtree, both invariant under
    restart depth). Callers that need exact reference counter *magnitudes*
    (some tests do) must pass ``parent_restart=False`` explicitly;
    ``with_visits`` alone does not change the restart behaviour.

    ``bricks``: the (pool, 8) uint32 brick-row table from
    ``render.bricks.build_bricks`` — ``words`` must then be the *decorated*
    pool from the same call. Rays descending into a brick root switch to an
    arithmetic 4x4x4 DDA (``brick_k`` sub-steps per fetched row); results
    stay bit-identical (see bricks.py). Mutually exclusive with
    ``warp_table``/``fuse_sibling``.
    """
    words = words.astype(jnp.uint32)
    if warp_table is not None and warp_levels is None:
        warp_levels = warp_table_levels(warp_table)
    warp = (
        (warp_table, warp_levels, strict_descent, False,
         warp_table_combined(warp_table))
        if warp_table is not None else None
    )
    state = _init_state(
        words, origins, dirs, active_init, with_visits=with_visits,
        start=start, warp=warp,
    )
    if max_iters is None:
        max_iters = (max_steps + 2) * 26
        if paged is not None:
            # Majority-page scheduling bound: each trip advances every
            # active ray of the largest page, so remaining work R shrinks
            # by >= R/(per_ray_cap * n_pages) per trip — trips <=
            # per_ray_cap * n_pages * ln(R0). ln(n * cap) < 32 for any
            # realistic wavefront; the cap is a pure safety bound (the
            # loop exits when every ray retires), so over-providing it is
            # free at runtime and keeps stalled-but-alive rays from being
            # terminated unresolved (bit-exactness invariant).
            max_iters *= paged[2] * 32
    body = _make_body(
        words,
        max_steps=max_steps,
        strict_descent=strict_descent,
        with_visits=with_visits,
        parent_restart=parent_restart,
        warp=warp,
        fuse_sibling=fuse_sibling,
        bricks=bricks,
        brick_k=brick_k,
        paged=paged,
        visit_flags=visit_flags,
    )

    body = _unrolled(body, unroll)

    def cond(s):
        return jnp.any(s["active"]) & (s["it"] < max_iters)

    s = jax.lax.while_loop(cond, body, state)
    res = _finish(s)
    if bricks is not None:
        res = _refetch_words(words, res)
    return res, (s["visits"] if with_visits else None)


def _init_state(words, origins, dirs, active_init, with_visits, start=None,
                warp=None):
    """Per-ray wavefront state, stored component-wise (SoA): positions,
    directions, normals and cell centres live as separate [n] f32 arrays —
    (n,3) arrays inside TPU while-loops provoke per-iteration layout
    conversions (see _make_beam_body). ``start`` optionally provides
    precomputed descent start points (node_index, node_pos f32[n,3], depth)
    from a beam pre-pass; ``warp`` (table, levels, strict) computes them from
    the warp table instead."""
    n = dirs.shape[0]
    pos0 = origins.astype(jnp.float32)
    d = dirs.astype(jnp.float32)
    d = jnp.where(d == 0.0, _EPS_DIR, d)

    inside = _in_bounds(pos0)
    dist = _ray_box_dist(pos0, d)
    entered = inside | (dist != 0.0)
    pos = jnp.where(inside[:, None], pos0, pos0 + d * dist[:, None])

    active = entered
    if active_init is not None:
        active = active & active_init

    skw0 = None
    if start is None and warp is not None:
        if len(warp) > 4 and warp[4]:
            start, _, sk_w0 = _warp_lookup(
                warp[0], warp[1], pos, strict=warp[2], pack=warp[3],
                combined=True,
            )
            oct0 = (
                (d[:, 0] > 0).astype(jnp.int32) * 4
                + (d[:, 1] > 0).astype(jnp.int32) * 2
                + (d[:, 2] > 0).astype(jnp.int32)
            )
            nib0 = (
                (sk_w0 >> (jnp.uint32(4) * oct0.astype(jnp.uint32)))
                & jnp.uint32(15)
            ).astype(jnp.int32)
            skw0 = jnp.where(nib0 <= 12, nib0, (nib0 - 11) * 8)
        else:
            start, _ = _warp_lookup(
                warp[0], warp[1], pos, strict=warp[2], pack=warp[3]
            )
    if start is None:
        node_index = jnp.zeros(n, dtype=jnp.int32)
        node_pos = jnp.zeros((n, 3), dtype=jnp.float32)
        depth = jnp.zeros(n, dtype=jnp.int32)
    else:
        node_index, node_pos, depth = start

    normal = jnp.trunc(pos * 1.000001)
    z = jnp.zeros(n, dtype=jnp.float32)
    zi = jnp.zeros(n, dtype=jnp.int32)
    return dict(
        it=jnp.int32(0),
        active=active,
        hit=jnp.zeros(n, dtype=bool),
        forced=jnp.zeros(n, dtype=bool),
        index=jnp.full(n, -1, dtype=jnp.int32),
        opx=z, opy=z, opz=z,
        onx=z, ony=z, onz=z,
        out_steps=zi,
        out_depth=zi,
        out_word=jnp.zeros(n, dtype=jnp.uint32),
        ox=pos[:, 0], oy=pos[:, 1], oz=pos[:, 2],
        dx=d[:, 0], dy=d[:, 1], dz=d[:, 2],
        vx=pos[:, 0], vy=pos[:, 1], vz=pos[:, 2],
        nx=normal[:, 0], ny=normal[:, 1], nz=normal[:, 2],
        steps=zi,
        node_index=node_index,
        cpx=node_pos[:, 0], cpy=node_pos[:, 1], cpz=node_pos[:, 2],
        depth=depth,
        bmode=jnp.zeros(n, dtype=bool),
        skw=(skw0 if skw0 is not None else zi),
        visits=jnp.zeros(words.shape[0] if with_visits else 1, dtype=jnp.int32),
    )


def _refetch_words(words: jax.Array, result: TraceResult) -> TraceResult:
    """Recompute ``result.word`` as ``words[index]`` via a group-row gather.

    Used by the brick-map path: the occupancy DDA detects hits from brick
    bits alone, never touching the leaf word, so the recorded word is filled
    in post-hoc. The recompute is definitionally what the other paths record
    (the word fetched at the hit slot), keeping the field bit-equal across
    every tracer configuration."""
    wpad = words
    if wpad.shape[0] % 8:
        wpad = jnp.pad(wpad, (0, (-wpad.shape[0]) % 8))
    idx = jnp.maximum(result.index, 0)
    rows = wpad.reshape(-1, 8)[idx // 8]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
        == (idx & 7)[:, None]
    )
    w = jnp.sum(
        jnp.where(onehot, rows, jnp.uint32(0)), axis=1, dtype=jnp.uint32
    )
    w = jnp.where(result.hit & ~result.forced, w, jnp.uint32(0))
    return result._replace(word=w)


def _finish(s) -> TraceResult:
    return TraceResult(
        hit=s["hit"],
        forced=s["forced"],
        index=s["index"],
        hit_pos=jnp.stack([s["opx"], s["opy"], s["opz"]], axis=-1),
        normal=jnp.stack([s["onx"], s["ony"], s["onz"]], axis=-1),
        steps=s["out_steps"],
        depth=s["out_depth"],
        word=s["out_word"],
    )


def _visit_mark(visits, idx, mask, visit_flags):
    """Record a descend-into event on the visit array.

    Exact mode scatters a count add; ``visit_flags`` scatters a constant-1
    SET instead — measured ~28% cheaper in-loop on v5e (scatter-set 4.9 vs
    scatter-add 6.7 ns/lane/iter, probes/visit_scatter_probe.py). Flags keep
    the interior zero-set exact (same touched indices); exact FILLED-leaf
    counts are reconstructed by ``render_frame`` from the hit indices (a
    filled-leaf visit always ends its ray, so hits enumerate them exactly —
    reference counters: src/shader.wgsl:157-161)."""
    if visit_flags:
        return visits.at[jnp.where(mask, idx, jnp.int32(1 << 30))].set(
            jnp.int32(1), mode="drop"
        )
    return visits.at[idx].add(mask.astype(jnp.int32), mode="drop")


def _make_body(words, max_steps, strict_descent, with_visits, parent_restart,
               warp=None, fuse_sibling=False, bricks=None, brick_k=4,
               paged=None, pack9=False, visit_flags=False):
    """One unified traversal iteration (descend one level / boundary step +
    restart) over the whole wavefront state.

    The node fetch is a *group row* gather: child groups are always 8-aligned
    in the pool (root group at 0, groups allocated in eights, holes recycle
    whole groups), so ``words`` reshapes to (pool/8, 8) and one row gather
    fetches all 8 siblings — measured ~4x cheaper per ray than a single
    element gather on v5e (PERF.md), with the child picked by a free one-hot
    select on the VPU. All vector state is component-wise [n] arrays (SoA);
    the arithmetic is the exact per-component expansion of the reference
    formulas, with (voxel_size * 0.5) == exp2(-depth1) exactly (powers of
    two), so results are bit-identical to the previous (n,3) form.

    ``pack9``: view the pool as 72-wide rows of 9 consecutive groups and
    pick the child by a 72-way one-hot. XLA's row-gather lowering is fast
    only up to ~2^17 TABLE ROWS (independent of bytes — measured,
    probes/row_width_probe.py grid), so dividing the row count by 9 pulls
    multi-MB pools back into the fast class: 20.2 -> 9.7 ns per group
    fetch at a 33.6 MB pool WITH the wider select included
    (probes/pack72_probe.py; word values identical, so results are
    bit-exact)."""
    voxel_offset = jnp.uint32(VOXEL_OFFSET)
    # Combined warp+skip table (warp = (table, levels, strict, pack,
    # combined)): enables the free-space-skip step override below.
    skip_on = warp is not None and len(warp) > 4 and warp[4]
    if words.shape[0] % 8:  # pool invariant: groups are 8-aligned
        words = jnp.pad(words, (0, (-words.shape[0]) % 8))
    words2d = words.reshape(-1, 8)
    if pack9:
        if bricks is not None or paged is not None:
            raise ValueError("pack9 excludes bricks/paged")
        pad_g = (-words2d.shape[0]) % 9
        packed72 = jnp.concatenate(
            [words2d, jnp.zeros((pad_g, 8), words2d.dtype)], axis=0
        ).reshape(-1, 72)
    if paged is not None:
        # Subtree paging (render/paging.py): rows [0, t_rows) are the top
        # table, page p occupies rows [t_rows + p*p_rows, t_rows + (p+1)*
        # p_rows). Each iteration serves the majority page: its window is
        # dynamic-sliced (loop-variant slices of a big pool gather at the
        # small-pool rate — probes P3/P3b), rays elsewhere stall (masked
        # exactly like inactive lanes; results are bit-identical, stalls
        # only delay independent rays). A ray only changes page through a
        # root restart into the top table, so a served ray's fetch is always
        # in the top table or the scheduled window.
        if bricks is not None or warp is not None or fuse_sibling:
            raise ValueError("paged excludes bricks/warp_table/fuse_sibling")
        t_rows, p_rows, n_pages = paged
        top2d = words2d[:t_rows]
    if bricks is not None:
        if warp is not None or fuse_sibling:
            raise ValueError("bricks exclude warp_table/fuse_sibling")
        # Mega-table: node rows first, then one brick row per node slot. A
        # ray fetches exactly ONE row per iteration either way — brick mode
        # just keys into the second region (see bricks.py).
        mega = jnp.concatenate([words2d, bricks.astype(jnp.uint32)], axis=0)
        brick_r0 = words2d.shape[0]

    def body(s):
        a = s["active"]
        if bricks is not None:
            bm = s["bmode"]
            a = a & ~bm
        if paged is not None:
            g_all = s["node_index"] // 8
            in_top = g_all < t_rows
            ray_page = (g_all - t_rows) // p_rows
            pg_act = a & ~in_top
            counts = jnp.sum(
                (ray_page[None, :] == jnp.arange(n_pages)[:, None])
                & pg_act[None, :],
                axis=1,
            )
            cur_page = jnp.argmax(counts).astype(jnp.int32)
            a = a & (in_top | (ray_page == cur_page))
        ox, oy, oz = s["ox"], s["oy"], s["oz"]
        dx, dy, dz = s["dx"], s["dy"], s["dz"]
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        cpx, cpy, cpz = s["cpx"], s["cpy"], s["cpz"]
        rsx, rsy, rsz = jnp.sign(dx), jnp.sign(dy), jnp.sign(dz)
        depth1 = s["depth"] + 1
        if strict_descent:
            px, py, pz = vx > cpx, vy > cpy, vz > cpz
        else:
            px, py, pz = vx >= cpx, vy >= cpy, vz >= cpz
        child = (
            px.astype(jnp.int32) * 4
            + py.astype(jnp.int32) * 2
            + pz.astype(jnp.int32)
        )
        inv1 = 1.0 / jnp.exp2(depth1.astype(jnp.float32))
        npx = cpx + (px.astype(jnp.float32) * 2.0 - 1.0) * inv1
        npy = cpy + (py.astype(jnp.float32) * 2.0 - 1.0) * inv1
        npz = cpz + (pz.astype(jnp.float32) * 2.0 - 1.0) * inv1
        idx = s["node_index"] + child

        if bricks is not None:
            rows = mega[
                jnp.where(bm, brick_r0 + s["node_index"], s["node_index"] // 8)
            ]
        elif paged is not None:
            win = jax.lax.dynamic_slice(
                words2d,
                (t_rows + cur_page * p_rows, jnp.int32(0)),
                (p_rows, 8),
            )
            local = jnp.clip(g_all - t_rows - cur_page * p_rows, 0, p_rows - 1)
            rows = jnp.where(
                in_top[:, None],
                top2d[jnp.clip(g_all, 0, t_rows - 1)],
                win[local],
            )
        elif pack9:
            gi = s["node_index"] // 8
            rows = packed72[gi // 9]
            sel_base = (gi % 9) * 8
        else:
            rows = words2d[s["node_index"] // 8]
        if not pack9:
            sel_base = jnp.int32(0)
        # One-hot masked sum: at wavefront widths the minor-axis reduce
        # (~0.4 ms/iter at n/4) beats the _row_select mux tree, whose
        # shrinking (w,4)/(w,2) slices lower to slice_select fusions costing
        # ~2.3 ms/iter at the same width (profiled on v5e both ways).
        # Under pack9 the row holds 9 groups; sel_base offsets into ours.
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
            == (sel_base + child)[:, None]
        )
        word = jnp.sum(
            jnp.where(onehot, rows, jnp.uint32(0)), axis=1, dtype=jnp.uint32
        )
        payload = word >> jnp.uint32(4)
        leaf = payload >= voxel_offset
        filled = payload > voxel_offset

        hit_now = a & leaf & filled
        interior = a & ~leaf
        stepping = a & leaf & ~filled

        if bricks is not None:
            # Descending into a brick root (decorated bit 0) switches the lane
            # to brick mode: node_index then holds the brick root's SLOT (the
            # key into the mega-table's brick region) and (cp, depth) its cell.
            enter_b = interior & ((word & jnp.uint32(1)) != 0)
            desc_tgt = jnp.where(enter_b, idx, payload.astype(jnp.int32))
        else:
            desc_tgt = payload.astype(jnp.int32)

        visits = s["visits"]
        if with_visits:
            visits = _visit_mark(visits, idx, a, visit_flags)

        # Boundary step quantities (computed for all lanes, used by `stepping`).
        tx = (npx - ox + rsx * inv1) / dx
        ty = (npy - oy + rsy * inv1) / dy
        tz = (npz - oz + rsz * inv1) / dz
        if skip_on:
            # Free-space skip (render/skip.py): ``skw`` carries the cube side
            # B (in 2^-levels grid cells) of the provably-empty octant-
            # directed cube anchored at the ray position's grid cell, fetched
            # by the previous restart's combined warp lookup (positions only
            # change at boundary steps, so the carried value is exact for
            # this position; _warp_lookup and this anchor use the identical
            # cell expression, so they agree bit-for-bit). When the cube's
            # exit lies beyond the leaf's own exit, one step crosses the
            # whole cube instead of one cell. ``steps`` counts 1 per skip (a
            # lower bound vs the reference's cell-by-cell count); hits stay
            # exact — only provably-empty space is skipped.
            skb = s["skw"].astype(jnp.float32)
            sk_side = 1 << warp[1]
            sk_cw = 2.0 / sk_side
            cix = jnp.clip(jnp.floor((vx + 1.0) * (sk_side / 2.0)),
                           0, sk_side - 1)
            ciy = jnp.clip(jnp.floor((vy + 1.0) * (sk_side / 2.0)),
                           0, sk_side - 1)
            ciz = jnp.clip(jnp.floor((vz + 1.0) * (sk_side / 2.0)),
                           0, sk_side - 1)

            def _sk_plane(ci, rs):
                clo = ci * sk_cw - 1.0
                return jnp.where(rs > 0, clo + skb * sk_cw,
                                 clo + sk_cw - skb * sk_cw)

            stx = (_sk_plane(cix, rsx) - ox) / dx
            sty = (_sk_plane(ciy, rsy) - oy) / dy
            stz = (_sk_plane(ciz, rsz) - oz) / dz
            sk_use = (s["skw"] > 0) & (
                jnp.minimum(jnp.minimum(stx, sty), stz)
                > jnp.minimum(jnp.minimum(tx, ty), tz)
            )
            tx = jnp.where(sk_use, stx, tx)
            ty = jnp.where(sk_use, sty, ty)
            tz = jnp.where(sk_use, stz, tz)
        fx = (tx <= jnp.minimum(ty, tz)).astype(jnp.float32)
        fy = (ty <= jnp.minimum(tz, tx)).astype(jnp.float32)
        fz = (tz <= jnp.minimum(tx, ty)).astype(jnp.float32)
        nnx, nny, nnz = fx * -rsx, fy * -rsy, fz * -rsz
        t_cur = jnp.minimum(jnp.minimum(tx, ty), tz)
        nvx = ox + dx * t_cur - nnx * _EPS_NUDGE
        nvy = oy + dy * t_cur - nny * _EPS_NUDGE
        nvz = oz + dz * t_cur - nnz * _EPS_NUDGE
        inb = (
            (nvx >= -1.0) & (nvx < 1.0)
            & (nvy >= -1.0) & (nvy < 1.0)
            & (nvz >= -1.0) & (nvz < 1.0)
        )

        oob = stepping & ~inb
        steps_new = s["steps"] + 1
        over = stepping & ~oob & (steps_new > max_steps)
        go = stepping & ~oob & ~over

        if warp is not None:
            # Warp-table restart: resume at the precomputed depth-``levels``
            # state instead of the root; invalid (boundary-exact) lookups fall
            # back to a root restart, keeping results bit-identical.
            new_vp3 = jnp.stack([nvx, nvy, nvz], axis=-1)
            if skip_on:
                (w_i, w_p, w_d), w_valid, sk_w = _warp_lookup(
                    warp[0], warp[1], new_vp3, strict=warp[2], pack=warp[3],
                    combined=True,
                )
            else:
                (w_i, w_p, w_d), w_valid = _warp_lookup(
                    warp[0], warp[1], new_vp3, strict=warp[2], pack=warp[3]
                )
            w_px, w_py, w_pz = w_p[:, 0], w_p[:, 1], w_p[:, 2]
        if parent_restart:
            # The leaf's parent cell is centred on the pre-update node_pos
            # with half-size 2/2^depth1 == 2*inv1; boundary semantics follow
            # the descent comparison ((lo, hi] for strict '>', [lo, hi) for
            # '>='). If the stepped position is provably inside, the next
            # descent starts from the parent (the current group) instead of
            # the root. Failure falls back to a root restart, so results are
            # identical either way.
            vs = 2.0 * inv1
            if strict_descent:
                in_parent = (
                    (nvx > cpx - vs) & (nvx <= cpx + vs)
                    & (nvy > cpy - vs) & (nvy <= cpy + vs)
                    & (nvz > cpz - vs) & (nvz <= cpz + vs)
                )
            else:
                in_parent = (
                    (nvx >= cpx - vs) & (nvx < cpx + vs)
                    & (nvy >= cpy - vs) & (nvy < cpy + vs)
                    & (nvz >= cpz - vs) & (nvz < cpz + vs)
                )
            go_parent = go & in_parent
        else:
            go_parent = jnp.zeros_like(go)
        go_root = go & ~go_parent
        if warp is not None:
            go_warp = go_root & w_valid
            go_root = go_root & ~go_warp
        else:
            go_warp = jnp.zeros_like(go_root)
            w_i = w_d = jnp.int32(0)
            w_px = w_py = w_pz = jnp.float32(0.0)

        # Fused sibling step: a ray stepping within its parent group already
        # holds the group's row, so the next descend (the exact computation
        # the following iteration would perform) resolves now for free —
        # either an immediate hit, a deeper interior to descend from, or an
        # empty sibling that steps again next iteration. Visit-count caveat:
        # an empty sibling is counted here AND by the next iteration's
        # re-descend; only *empty* leaves can double-count, and the feedback
        # scan ignores them entirely (they are neither interior nor filled,
        # src/compute.wgsl:39-46), so the adaptive invariants hold exactly:
        # filled-leaf counts and interior zero-sets are unchanged (tests).
        if fuse_sibling and parent_restart:
            if strict_descent:
                qx, qy, qz = nvx > cpx, nvy > cpy, nvz > cpz
            else:
                qx, qy, qz = nvx >= cpx, nvy >= cpy, nvz >= cpz
            child2 = (
                qx.astype(jnp.int32) * 4
                + qy.astype(jnp.int32) * 2
                + qz.astype(jnp.int32)
            )
            onehot2 = (
                jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
                == (sel_base + child2)[:, None]
            )
            word2 = jnp.sum(
                jnp.where(onehot2, rows, jnp.uint32(0)), axis=1,
                dtype=jnp.uint32,
            )
            payload2 = word2 >> jnp.uint32(4)
            idx2 = s["node_index"] + child2
            np2x = cpx + (qx.astype(jnp.float32) * 2.0 - 1.0) * inv1
            np2y = cpy + (qy.astype(jnp.float32) * 2.0 - 1.0) * inv1
            np2z = cpz + (qz.astype(jnp.float32) * 2.0 - 1.0) * inv1
            leaf2 = payload2 >= voxel_offset
            filled2 = payload2 > voxel_offset
            hit2 = go_parent & leaf2 & filled2
            interior2 = go_parent & ~leaf2
            if with_visits:
                visits = _visit_mark(visits, idx2, go_parent, visit_flags)
        else:
            hit2 = interior2 = jnp.zeros_like(go_parent)
            payload2 = word2 = jnp.uint32(0)
            idx2 = jnp.int32(0)
            np2x = np2y = np2z = jnp.float32(0.0)

        done_now = hit_now | oob | over | hit2

        # Out-of-bounds misses report zero pos/normal (reference:
        # src/shader.wgsl:238 returns vec3(0) for both).
        def rec(hit_old, new_v, old_v):
            return jnp.where(
                hit_now | hit2,
                jnp.where(hit2, new_v, hit_old),
                jnp.where(over, new_v, 0.0),
            )

        record_px = rec(vx, nvx, None)
        record_py = rec(vy, nvy, None)
        record_pz = rec(vz, nvz, None)
        record_nx = rec(s["nx"], nnx, None)
        record_ny = rec(s["ny"], nny, None)
        record_nz = rec(s["nz"], nnz, None)
        record_steps = jnp.where(over | hit2, steps_new, s["steps"])
        record_depth = jnp.where(over, max_steps, depth1)

        adv = go | interior2 | hit2  # rays whose voxel_pos/normal advanced
        if skip_on:
            # Refresh the carried skip cube for every lane whose position
            # moved: the combined lookup (at the post-step position) already
            # fetched the cell's skip word; extract this ray's octant nibble
            # and decode through the 0..12,16,24,32 codebook.
            sk_oct = (
                (dx > 0).astype(jnp.int32) * 4
                + (dy > 0).astype(jnp.int32) * 2
                + (dz > 0).astype(jnp.int32)
            )
            sk_nib = (
                (sk_w >> (jnp.uint32(4) * sk_oct.astype(jnp.uint32)))
                & jnp.uint32(15)
            ).astype(jnp.int32)
            sk_b = jnp.where(sk_nib <= 12, sk_nib, (sk_nib - 11) * 8)
            skw_new = jnp.where(adv, sk_b, s["skw"])
        else:
            skw_new = s["skw"]
        # interior2/hit2 keep the stepped position; plain go ditto.
        new_vx = jnp.where(go | (hit2 | interior2), nvx, vx)
        new_vy = jnp.where(go | (hit2 | interior2), nvy, vy)
        new_vz = jnp.where(go | (hit2 | interior2), nvz, vz)
        new_nx = jnp.where(go | (hit2 | interior2), nnx, s["nx"])
        new_ny = jnp.where(go | (hit2 | interior2), nny, s["ny"])
        new_nz = jnp.where(go | (hit2 | interior2), nnz, s["nz"])

        out = dict(
            it=s["it"] + 1,
            # Paged mode: lanes whose page is not scheduled this iteration
            # were masked out of ``a`` (stalled) but must REMAIN active.
            active=(s["active"] if paged is not None else a) & ~done_now,
            hit=s["hit"] | hit_now | over | hit2,
            forced=s["forced"] | over,
            index=jnp.where(hit_now, idx, jnp.where(hit2, idx2, s["index"])),
            out_word=jnp.where(
                hit_now, word,
                jnp.where(hit2, word2, s["out_word"]),
            ),
            opx=jnp.where(done_now, record_px, s["opx"]),
            opy=jnp.where(done_now, record_py, s["opy"]),
            opz=jnp.where(done_now, record_pz, s["opz"]),
            onx=jnp.where(done_now, record_nx, s["onx"]),
            ony=jnp.where(done_now, record_ny, s["ony"]),
            onz=jnp.where(done_now, record_nz, s["onz"]),
            out_steps=jnp.where(done_now, record_steps, s["out_steps"]),
            out_depth=jnp.where(done_now, record_depth, s["out_depth"]),
            ox=ox, oy=oy, oz=oz,
            dx=dx, dy=dy, dz=dz,
            vx=new_vx, vy=new_vy, vz=new_vz,
            nx=new_nx, ny=new_ny, nz=new_nz,
            steps=jnp.where(go | interior2 | hit2, steps_new, s["steps"]),
            node_index=jnp.where(
                interior,
                desc_tgt,
                jnp.where(
                    interior2,
                    payload2.astype(jnp.int32),
                    jnp.where(
                        go_warp, w_i, jnp.where(go_root, 0, s["node_index"])
                    ),
                ),
            ),
            cpx=jnp.where(
                go_root, 0.0,
                jnp.where(
                    go_warp, w_px,
                    jnp.where(
                        interior2, np2x,
                        jnp.where(
                            go_parent, cpx,
                            jnp.where(interior | stepping, npx, cpx),
                        ),
                    ),
                ),
            ),
            cpy=jnp.where(
                go_root, 0.0,
                jnp.where(
                    go_warp, w_py,
                    jnp.where(
                        interior2, np2y,
                        jnp.where(
                            go_parent, cpy,
                            jnp.where(interior | stepping, npy, cpy),
                        ),
                    ),
                ),
            ),
            cpz=jnp.where(
                go_root, 0.0,
                jnp.where(
                    go_warp, w_pz,
                    jnp.where(
                        interior2, np2z,
                        jnp.where(
                            go_parent, cpz,
                            jnp.where(interior | stepping, npz, cpz),
                        ),
                    ),
                ),
            ),
            depth=jnp.where(
                go_root, 0,
                jnp.where(
                    go_warp, w_d,
                    jnp.where(
                        interior2, depth1,
                        jnp.where(
                            go_parent, depth1 - 1,
                            jnp.where(a, depth1, s["depth"]),
                        ),
                    ),
                ),
            ),
            bmode=(enter_b if bricks is not None else s["bmode"]),
            skw=skw_new,
            visits=visits,
        )

        if bricks is not None:
            out = _brick_substeps(
                s, out, rows, bm, max_steps=max_steps,
                strict_descent=strict_descent, with_visits=with_visits,
                brick_k=brick_k, visit_flags=visit_flags,
            )
        return out

    return body


def _brick_substeps(s, out, rows, bm, max_steps, strict_descent, with_visits,
                    brick_k, visit_flags=False):
    """Run ``brick_k`` arithmetic DDA sub-steps for the lanes in brick mode
    and merge their updates into the normal-path output dict ``out``.

    A lane in brick mode sits at a brick root: ``(cpx, cpy, cpz, depth)`` is
    the root's cell and ``rows`` its fetched brick row (bricks.py layout).
    Each sub-step reproduces exactly one reference traversal step at *actual
    leaf granularity*:

    * point location inside the brick is the same two compare-per-axis
      decisions the two-level tree descent makes (strict ``>`` or ``>=``), so
      the located cell is bit-identical to a root re-descent's landing cell;
    * the occupancy bit answers "is the actual leaf here filled" (coarse
      leaves are replicated into their 8 fine bits by the builder);
    * empty cells take the standard t_max boundary step *from the actual
      cell* (the coarse child when the coarse-leaf mask says so) — the same
      formulas as the main body, so positions/normals/step counts match the
      per-ray path bit-for-bit;
    * a filled coarse leaf resolves the hit immediately (index is
      ``children_group + ccode``); a filled *fine* cell hands the lane to the
      interior child's own brick (a brick root's interior child always has
      height <= 1, hence is itself a valid brick root), which resolves it as
      a coarse hit next iteration — also scattering the exact +1 visit on the
      hit leaf;
    * leaving the brick cell falls back to a root restart, exactly like the
      main body's failed parent-containment test.

    Visit counts: every sub-step scatters +1 to ``children_group + ccode`` —
    the interior child when the actual cell is fine (preserving the adaptive
    interior zero-set), the empty/filled coarse leaf otherwise (empty-leaf
    magnitudes are ignored by the feedback scan; the filled-leaf +1 lands
    exactly once, at the hit sub-step). See trace_staged's exactness note.
    """
    act = s["active"]
    cx, cy, cz = s["cpx"], s["cpy"], s["cpz"]
    db = s["depth"]
    h = jnp.exp2(-db.astype(jnp.float32))
    q1 = h * 0.5
    q2 = h * 0.25
    w0 = rows[:, 0]
    occ_lo = rows[:, 1]
    occ_hi = rows[:, 2]
    cgroup = rows[:, 3].astype(jnp.int32)
    ox, oy, oz = s["ox"], s["oy"], s["oz"]
    dx, dy, dz = s["dx"], s["dy"], s["dz"]
    rsx, rsy, rsz = jnp.sign(dx), jnp.sign(dy), jnp.sign(dz)

    bvx, bvy, bvz = s["vx"], s["vy"], s["vz"]
    bnx, bny, bnz = s["nx"], s["ny"], s["nz"]
    bsteps = s["steps"]
    b_hit, b_forced, b_index = s["hit"], s["forced"], s["index"]
    b_opx, b_opy, b_opz = s["opx"], s["opy"], s["opz"]
    b_onx, b_ony, b_onz = s["onx"], s["ony"], s["onz"]
    b_osteps, b_odepth = s["out_steps"], s["out_depth"]
    visits = out["visits"]

    instint = bm & act
    b_done = jnp.zeros_like(bm)
    b_desc = jnp.zeros_like(bm)   # hand off into the interior child's brick
    b_par = jnp.zeros_like(bm)    # left the brick cell into its parent
    b_root = jnp.zeros_like(bm)   # left the parent cell too: root restart
    zi = jnp.zeros_like(db)
    zf = jnp.zeros_like(cx)
    d_idx = zi       # child-brick slot recorded at desc time
    d_cx, d_cy, d_cz = zf, zf, zf

    # The brick root's parent cell, for the exit handoff: the slot's low
    # three bits are its child code within its group (children live at
    # group+code everywhere), and dyadic cell centres are exact in f32, so
    # ``C - (2*bit - 1) * h`` recovers the parent centre bit-exactly.
    code = s["node_index"] & 7
    pcx = cx - (((code >> 2) & 1).astype(jnp.float32) * 2.0 - 1.0) * h
    pcy = cy - (((code >> 1) & 1).astype(jnp.float32) * 2.0 - 1.0) * h
    pcz = cz - ((code & 1).astype(jnp.float32) * 2.0 - 1.0) * h
    h2 = h * 2.0

    for _ in range(brick_k):
        # --- point location: the 2-level descent, arithmetically -------------
        if strict_descent:
            b1x, b1y, b1z = bvx > cx, bvy > cy, bvz > cz
        else:
            b1x, b1y, b1z = bvx >= cx, bvy >= cy, bvz >= cz
        m1x = cx + (b1x.astype(jnp.float32) * 2.0 - 1.0) * q1
        m1y = cy + (b1y.astype(jnp.float32) * 2.0 - 1.0) * q1
        m1z = cz + (b1z.astype(jnp.float32) * 2.0 - 1.0) * q1
        if strict_descent:
            b2x, b2y, b2z = bvx > m1x, bvy > m1y, bvz > m1z
        else:
            b2x, b2y, b2z = bvx >= m1x, bvy >= m1y, bvz >= m1z
        m2x = m1x + (b2x.astype(jnp.float32) * 2.0 - 1.0) * q2
        m2y = m1y + (b2y.astype(jnp.float32) * 2.0 - 1.0) * q2
        m2z = m1z + (b2z.astype(jnp.float32) * 2.0 - 1.0) * q2
        ccode = (
            b1x.astype(jnp.int32) * 4
            + b1y.astype(jnp.int32) * 2
            + b1z.astype(jnp.int32)
        )
        gcode = (
            b2x.astype(jnp.int32) * 4
            + b2y.astype(jnp.int32) * 2
            + b2z.astype(jnp.int32)
        )
        bit = (ccode * 8 + gcode).astype(jnp.uint32)
        occ_word = jnp.where(bit < jnp.uint32(32), occ_lo, occ_hi)
        occ = ((occ_word >> (bit & jnp.uint32(31))) & jnp.uint32(1)) != 0
        cl = (
            (w0 >> (ccode + 1).astype(jnp.uint32)) & jnp.uint32(1)
        ) != 0
        tgt = cgroup + ccode

        if with_visits:
            visits = _visit_mark(
                visits, tgt, instint, visit_flags
            ) if visit_flags else visits.at[
                jnp.where(instint, tgt, jnp.int32(2**30))
            ].add(1, mode="drop")

        # --- filled cell: coarse hit now, or descend into the child brick ---
        hitc = instint & occ & cl
        desc = instint & occ & ~cl
        b_hit = b_hit | hitc
        b_index = jnp.where(hitc, tgt, b_index)
        b_opx = jnp.where(hitc, bvx, b_opx)
        b_opy = jnp.where(hitc, bvy, b_opy)
        b_opz = jnp.where(hitc, bvz, b_opz)
        b_onx = jnp.where(hitc, bnx, b_onx)
        b_ony = jnp.where(hitc, bny, b_ony)
        b_onz = jnp.where(hitc, bnz, b_onz)
        b_osteps = jnp.where(hitc, bsteps, b_osteps)
        b_odepth = jnp.where(hitc, db + 1, b_odepth)
        b_done = b_done | hitc
        b_desc = b_desc | desc
        d_idx = jnp.where(desc, tgt, d_idx)
        d_cx = jnp.where(desc, m1x, d_cx)
        d_cy = jnp.where(desc, m1y, d_cy)
        d_cz = jnp.where(desc, m1z, d_cz)

        # --- empty cell: boundary step from the ACTUAL cell -----------------
        stepping = instint & ~occ
        ctr_x = jnp.where(cl, m1x, m2x)
        ctr_y = jnp.where(cl, m1y, m2y)
        ctr_z = jnp.where(cl, m1z, m2z)
        halfs = jnp.where(cl, q1, q2)
        tx = (ctr_x - ox + rsx * halfs) / dx
        ty = (ctr_y - oy + rsy * halfs) / dy
        tz = (ctr_z - oz + rsz * halfs) / dz
        fx = (tx <= jnp.minimum(ty, tz)).astype(jnp.float32)
        fy = (ty <= jnp.minimum(tz, tx)).astype(jnp.float32)
        fz = (tz <= jnp.minimum(tx, ty)).astype(jnp.float32)
        nnx, nny, nnz = fx * -rsx, fy * -rsy, fz * -rsz
        t_cur = jnp.minimum(jnp.minimum(tx, ty), tz)
        qx = ox + dx * t_cur - nnx * _EPS_NUDGE
        qy = oy + dy * t_cur - nny * _EPS_NUDGE
        qz = oz + dz * t_cur - nnz * _EPS_NUDGE
        inb = (
            (qx >= -1.0) & (qx < 1.0)
            & (qy >= -1.0) & (qy < 1.0)
            & (qz >= -1.0) & (qz < 1.0)
        )
        oob = stepping & ~inb
        b_osteps = jnp.where(oob, bsteps, b_osteps)
        b_odepth = jnp.where(oob, db + jnp.where(cl, 1, 2), b_odepth)
        b_opx = jnp.where(oob, 0.0, b_opx)
        b_opy = jnp.where(oob, 0.0, b_opy)
        b_opz = jnp.where(oob, 0.0, b_opz)
        b_onx = jnp.where(oob, 0.0, b_onx)
        b_ony = jnp.where(oob, 0.0, b_ony)
        b_onz = jnp.where(oob, 0.0, b_onz)
        b_done = b_done | oob
        steps_new = bsteps + 1
        over = stepping & ~oob & (steps_new > max_steps)
        b_hit = b_hit | over
        b_forced = b_forced | over
        b_opx = jnp.where(over, qx, b_opx)
        b_opy = jnp.where(over, qy, b_opy)
        b_opz = jnp.where(over, qz, b_opz)
        b_onx = jnp.where(over, nnx, b_onx)
        b_ony = jnp.where(over, nny, b_ony)
        b_onz = jnp.where(over, nnz, b_onz)
        b_osteps = jnp.where(over, steps_new, b_osteps)
        b_odepth = jnp.where(over, max_steps, b_odepth)
        b_done = b_done | over
        go = stepping & ~oob & ~over

        # Still inside the brick cell? Same (lo, hi] containment the main
        # body's parent-restart uses. Exits resume from the brick root's
        # PARENT when its cell provably contains the stepped position (the
        # exact analogue of the main body's parent restart — one descent
        # instead of a full re-descent), falling back to the root otherwise.
        if strict_descent:
            inc = (
                (qx > cx - h) & (qx <= cx + h)
                & (qy > cy - h) & (qy <= cy + h)
                & (qz > cz - h) & (qz <= cz + h)
            )
            inp = (
                (qx > pcx - h2) & (qx <= pcx + h2)
                & (qy > pcy - h2) & (qy <= pcy + h2)
                & (qz > pcz - h2) & (qz <= pcz + h2)
            )
        else:
            inc = (
                (qx >= cx - h) & (qx < cx + h)
                & (qy >= cy - h) & (qy < cy + h)
                & (qz >= cz - h) & (qz < cz + h)
            )
            inp = (
                (qx >= pcx - h2) & (qx < pcx + h2)
                & (qy >= pcy - h2) & (qy < pcy + h2)
                & (qz >= pcz - h2) & (qz < pcz + h2)
            )
        exit_b = go & ~inc
        b_par = b_par | (exit_b & inp)
        b_root = b_root | (exit_b & ~inp)
        bvx = jnp.where(go, qx, bvx)
        bvy = jnp.where(go, qy, bvy)
        bvz = jnp.where(go, qz, bvz)
        bnx = jnp.where(go, nnx, bnx)
        bny = jnp.where(go, nny, bny)
        bnz = jnp.where(go, nnz, bnz)
        bsteps = jnp.where(go, steps_new, bsteps)
        instint = go & inc

    # --- merge into the normal-path output ----------------------------------
    out["active"] = jnp.where(bm, act & ~b_done, out["active"])
    out["hit"] = jnp.where(bm, b_hit, out["hit"])
    out["forced"] = jnp.where(bm, b_forced, out["forced"])
    out["index"] = jnp.where(bm, b_index, out["index"])
    for k, v in (
        ("opx", b_opx), ("opy", b_opy), ("opz", b_opz),
        ("onx", b_onx), ("ony", b_ony), ("onz", b_onz),
        ("out_steps", b_osteps), ("out_depth", b_odepth),
        ("vx", bvx), ("vy", bvy), ("vz", bvz),
        ("nx", bnx), ("ny", bny), ("nz", bnz),
        ("steps", bsteps),
    ):
        out[k] = jnp.where(bm, v, out[k])
    out["node_index"] = jnp.where(
        bm,
        jnp.where(
            b_desc, d_idx,
            jnp.where(
                b_par, s["node_index"] & ~7,
                jnp.where(b_root, 0, s["node_index"]),
            ),
        ),
        out["node_index"],
    )
    out["cpx"] = jnp.where(
        bm,
        jnp.where(
            b_desc, d_cx,
            jnp.where(b_par, pcx, jnp.where(b_root, 0.0, cx)),
        ),
        out["cpx"],
    )
    out["cpy"] = jnp.where(
        bm,
        jnp.where(
            b_desc, d_cy,
            jnp.where(b_par, pcy, jnp.where(b_root, 0.0, cy)),
        ),
        out["cpy"],
    )
    out["cpz"] = jnp.where(
        bm,
        jnp.where(
            b_desc, d_cz,
            jnp.where(b_par, pcz, jnp.where(b_root, 0.0, cz)),
        ),
        out["cpz"],
    )
    out["depth"] = jnp.where(
        bm,
        jnp.where(
            b_desc, db + 1,
            jnp.where(b_par, db - 1, jnp.where(b_root, 0, db)),
        ),
        out["depth"],
    )
    out["bmode"] = jnp.where(bm, instint | b_desc, out["bmode"])
    out["visits"] = visits
    return out


def _unrolled(body, unroll: int):
    """Compose the unified iteration ``unroll`` times per loop trip: inactive
    lanes are masked inside the body, so composition is exact; it amortizes
    the per-trip fixed cost (kernel launches, `any` reductions) over several
    gathers."""
    if unroll <= 1:
        return body

    def body_u(s):
        for _ in range(unroll):
            s = body(s)
        return s

    return body_u


def _pixel_to_block(x, h: int, w: int, block: int, morton: bool = False):
    """Permute a flat pixel-row-major ray array into block-major order (each
    ``block``x``block`` tile's rays contiguous); inverse is
    ``_block_to_pixel``. One relayout costs ~1 ms for f32[2M,3] on v5e — paid
    once per trace, so every per-iteration block reduce/broadcast becomes a
    minor-axis op (~0.05 ms vs ~0.75 ms for the strided pixel-order form,
    measured).

    ``morton``: lay each tile out in interleaved-bit (Morton) order — pixel
    (y, x) at offset y_k x_k ... y_0 x_0 — so every power-of-two sub-tile
    (4x4, 2x2, ...) is contiguous too, which lets the beam cascade re-tile at
    finer granularity without any relayout. The Morton transpose costs ~10 ms
    more per frame than the plain row-major tile at 1080p, so it is only used
    when a multi-stage cascade asks for it."""
    hb, wb = h // block, w // block
    if not morton:
        t = x.reshape((hb, block, wb, block) + x.shape[1:])
        return jnp.swapaxes(t, 1, 2).reshape((h * w,) + x.shape[1:])
    lv = block.bit_length() - 1
    assert block == 1 << lv
    t = x.reshape((hb,) + (2,) * lv + (wb,) + (2,) * lv + x.shape[1:])
    # (hb, y_hi..y_lo, wb, x_hi..x_lo) -> (hb, wb, y_hi, x_hi, ..., y_lo, x_lo)
    perm = [0, lv + 1]
    for k in range(lv):
        perm += [1 + k, lv + 2 + k]
    perm += list(range(2 * lv + 2, t.ndim))
    return t.transpose(perm).reshape((h * w,) + x.shape[1:])


def _block_to_pixel(x, h: int, w: int, block: int, morton: bool = False):
    hb, wb = h // block, w // block
    if not morton:
        t = x.reshape((hb, wb, block, block) + x.shape[1:])
        return jnp.swapaxes(t, 1, 2).reshape((h * w,) + x.shape[1:])
    lv = block.bit_length() - 1
    t = x.reshape((hb, wb) + (2, 2) * lv + x.shape[1:])
    perm = [0] + [2 + 2 * k for k in range(lv)] + [1] \
        + [3 + 2 * k for k in range(lv)] + list(range(2 + 2 * lv, t.ndim))
    return t.transpose(perm).reshape((h * w,) + x.shape[1:])


def _block_ops(nb: int, lanes: int):
    """Reduce/broadcast helpers between the block-major flat ray axis
    (n = nb*lanes, each block contiguous) and the block axis. All minor-axis
    ops — they stay inside the loop fusion."""

    def down(x, op):
        shp = (nb, lanes) + x.shape[1:]
        return op(x.reshape(shp), axis=1)

    def down_and_u32(x):
        return jax.lax.reduce(
            x.reshape(nb, lanes), jnp.uint32(0xFFFFFFFF),
            jax.lax.bitwise_and, (1,),
        )

    def down_any(x):
        return down(x, jnp.any)

    def down_sum(x):
        return down(x, jnp.sum)

    def up(x):
        t = jnp.broadcast_to(
            x[:, None], (nb, lanes) + x.shape[1:]
        )
        return t.reshape((nb * lanes,) + x.shape[1:])

    return down_and_u32, down_any, down_sum, up


# Beam meta word layout (one int32 per ray replaces seven bookkeeping
# arrays in the loop carry): bits 0-6 step count, 7-13 depth recorded at
# retirement, 14 alive, 15 hit, 16 forced. Requires max_steps <= 127.
_BM_ALIVE = 1 << 14
_BM_HIT = 1 << 15
_BM_FORCED = 1 << 16


def _make_beam_body(words, nb, lanes, max_steps, strict_descent,
                    with_visits, pack9=False, visit_flags=False):
    """One block-synchronous ("beam") traversal iteration over block-major
    rays (``nb`` blocks of ``lanes`` contiguous rays).

    While every active ray of a pixel tile picks the same child octant, the
    whole tile advances as one: the node fetch happens ONCE PER BLOCK — a
    (1,8) row gather at n/lanes width instead of per ray — and the fetched
    word drives the shared action. Everything per-ray (t_max boundary
    stepping, the 2e-6 nudge, step counts, OOB/step-cap retirement, hit
    records) uses exactly the per-ray formulas of ``_make_body`` on each ray's
    own state, so results are bit-identical to the per-ray wavefront by
    construction: sharing the gather is valid because ``find_voxel`` is a pure
    function of position (reference: src/shader.wgsl:130-175) and the
    agreement test is exact, never epsilon-truncated — blocks decohere
    conservatively, which costs speed, never correctness.

    Performance shape (all measured on v5e): per iteration the full-width
    work is ONE uint32 AND-reduce of a packed predicate mask (child bits 0-2,
    complements 3-5, cell containment 6, inactivity 7) plus fused
    element-wise math. The carry is deliberately minimal — one packed int32
    ``meta`` (steps/depth/alive/hit/forced) plus per-COMPONENT f32 arrays:
    (n,3) arrays inside a TPU while-loop provoke per-iteration layout
    conversions (XLA materializes f32[1,3,n] transposes via wide loops +
    dynamic-update-slices, ~4 ms/iteration at 1080p), so positions, normals
    and directions stay as separate [n] vectors here.

    The containment bit is load-bearing only right after a boundary step — it
    decides resume-at-parent vs root restart, the block-level analogue of
    per-ray parent_restart. Mid-descent it is ignored: descent comparisons
    clamp out-of-cell positions identically per ray (entry positions sit
    exactly ON the cube faces, where (lo, hi] tests are legitimately false).

    On child disagreement the block *decoheres*: it records its cell as the
    per-BLOCK handoff; each frozen ray later resumes there iff its own
    containment bit validates (else from the root — always exact, since
    find_voxel is position-pure).

    Visit counts: every shared visit scatters the block's active-ray count, so
    *leaf* counts (filled and empty) are exactly the per-ray counts; interior
    magnitudes vary with restart policy exactly as ``parent_restart`` does,
    preserving the adaptive invariants (interior zero-set; filled-leaf
    counts — see trace's docstring).
    """
    voxel_offset = jnp.uint32(VOXEL_OFFSET)
    if words.shape[0] % 8:
        words = jnp.pad(words, (0, (-words.shape[0]) % 8))
    words2d = words.reshape(-1, 8)
    if pack9:
        # Same 72-wide 9-group row packing as _make_body (see there): the
        # block fetch still reads from the big pool, so it rides the same
        # row-count break.
        pad_g = (-words2d.shape[0]) % 9
        packed72 = jnp.concatenate(
            [words2d, jnp.zeros((pad_g, 8), words2d.dtype)], axis=0
        ).reshape(-1, 72)
    down_and_u32, down_any, down_sum, up = _block_ops(nb, lanes)

    def body(s):
        meta = s["meta"]
        alive = (meta & _BM_ALIVE) != 0
        live_b = s["b_live"]
        live = up(live_b) & alive
        vx, vy, vz = s["vx"], s["vy"], s["vz"]
        ox, oy, oz = s["ox"], s["oy"], s["oz"]
        dx, dy, dz = s["dx"], s["dy"], s["dz"]
        rsx, rsy, rsz = jnp.sign(dx), jnp.sign(dy), jnp.sign(dz)

        # --- the ONE full-width reduce: packed predicate mask ---------------
        cx, cy, cz = up(s["bpx"]), up(s["bpy"]), up(s["bpz"])
        half = up(jnp.exp2(-s["b_depth"].astype(jnp.float32)))
        if strict_descent:
            pbx, pby, pbz = vx > cx, vy > cy, vz > cz
            ic = (
                (vx > cx - half) & (vx <= cx + half)
                & (vy > cy - half) & (vy <= cy + half)
                & (vz > cz - half) & (vz <= cz + half)
            )
        else:
            pbx, pby, pbz = vx >= cx, vy >= cy, vz >= cz
            ic = (
                (vx >= cx - half) & (vx < cx + half)
                & (vy >= cy - half) & (vy < cy + half)
                & (vz >= cz - half) & (vz < cz + half)
            )
        m = (
            pbx.astype(jnp.uint32)
            | (pby.astype(jnp.uint32) << 1)
            | (pbz.astype(jnp.uint32) << 2)
            | ((~pbx).astype(jnp.uint32) << 3)
            | ((~pby).astype(jnp.uint32) << 4)
            | ((~pbz).astype(jnp.uint32) << 5)
            | (ic.astype(jnp.uint32) << 6)
        )
        r = down_and_u32(jnp.where(live, m, jnp.uint32(0xFF)))

        has_ray = (r >> 7) & 1 == 0
        all_in = (r >> 6) & 1 == 1
        agree = (
            ((r | (r >> 3)) & 1 == 1)
            & (((r >> 1) | (r >> 4)) & 1 == 1)
            & (((r >> 2) | (r >> 5)) & 1 == 1)
        )
        ok = live_b & has_ray
        root_b = ok & s["b_stepped"] & ~all_in & (s["b_depth"] > 0)
        eligible = ok & ~root_b
        decohere_b = eligible & ~agree
        act_b = eligible & agree

        c0 = (r & 1).astype(jnp.float32)
        c1 = ((r >> 1) & 1).astype(jnp.float32)
        c2 = ((r >> 2) & 1).astype(jnp.float32)
        child_b = (r & 1).astype(jnp.int32) * 4 \
            + ((r >> 1) & 1).astype(jnp.int32) * 2 \
            + ((r >> 2) & 1).astype(jnp.int32)
        depth1_b = s["b_depth"] + 1
        inv1_b = 1.0 / jnp.exp2(depth1_b.astype(jnp.float32))
        npx1_b = s["bpx"] + (c0 * 2.0 - 1.0) * inv1_b
        npy1_b = s["bpy"] + (c1 * 2.0 - 1.0) * inv1_b
        npz1_b = s["bpz"] + (c2 * 2.0 - 1.0) * inv1_b
        idx_b = s["b_index"] + child_b

        # --- ONE fetch per block (the whole point) --------------------------
        gi_b = s["b_index"] // 8
        if pack9:
            rows = packed72[gi_b // 9]
            sel_b = (gi_b % 9) * 8 + child_b
        else:
            rows = words2d[gi_b]
            sel_b = child_b
        onehot_b = (
            jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
            == sel_b[:, None]
        )
        word_b = jnp.sum(
            jnp.where(onehot_b, rows, jnp.uint32(0)), axis=1, dtype=jnp.uint32
        )
        payload_b = word_b >> jnp.uint32(4)
        leaf_b = payload_b >= voxel_offset
        filled_b = payload_b > voxel_offset

        hit_b = act_b & leaf_b & filled_b
        int_b = act_b & ~leaf_b
        step_b = act_b & leaf_b & ~filled_b

        visits = s["visits"]
        if with_visits:
            if visit_flags:
                visits = _visit_mark(visits, idx_b, act_b, True)
            else:
                cnt_b = down_sum(live.astype(jnp.int32))
                visits = visits.at[
                    jnp.where(act_b, idx_b, jnp.int32(2**30))
                ].add(cnt_b, mode="drop")

        # --- per-ray boundary step (identical formulas to _make_body,
        # expanded per component; (voxel_size * 0.5) == inv1 exactly — powers
        # of two) -------------------------------------------------------------
        stepping = live & up(step_b)
        vs_half = up(inv1_b)
        npx, npy, npz = up(npx1_b), up(npy1_b), up(npz1_b)
        tx = (npx - ox + rsx * vs_half) / dx
        ty = (npy - oy + rsy * vs_half) / dy
        tz = (npz - oz + rsz * vs_half) / dz
        fx = (tx <= jnp.minimum(ty, tz)).astype(jnp.float32)
        fy = (ty <= jnp.minimum(tz, tx)).astype(jnp.float32)
        fz = (tz <= jnp.minimum(tx, ty)).astype(jnp.float32)
        nnx, nny, nnz = fx * -rsx, fy * -rsy, fz * -rsz
        t_cur = jnp.minimum(jnp.minimum(tx, ty), tz)
        nvx = ox + dx * t_cur - nnx * _EPS_NUDGE
        nvy = oy + dy * t_cur - nny * _EPS_NUDGE
        nvz = oz + dz * t_cur - nnz * _EPS_NUDGE

        inb = (
            (nvx >= -1.0) & (nvx < 1.0)
            & (nvy >= -1.0) & (nvy < 1.0)
            & (nvz >= -1.0) & (nvz < 1.0)
        )
        oob = stepping & ~inb
        steps = meta & 127
        steps_new = steps + 1
        over = stepping & ~oob & (steps_new > max_steps)
        go = stepping & ~oob & ~over
        hit_now = live & up(hit_b)
        done = hit_now | oob | over

        # --- meta/state updates (retired rays freeze their record) ---------
        # Normals are always axis-aligned sign vectors (components in
        # {-1,0,1} — the initial trunc() and every face*-sign step), so the
        # carried normal packs into 5 meta bits (base-3 code) instead of
        # three full-width f32 arrays.
        depth1 = up(depth1_b)
        depth_rec = jnp.where(
            done,
            jnp.where(over, max_steps, depth1),
            (meta >> 7) & 127,
        )
        adv = go | over
        e_new = (
            (nnx.astype(jnp.int32) + 1)
            + 3 * (nny.astype(jnp.int32) + 1)
            + 9 * (nnz.astype(jnp.int32) + 1)
        )
        norm_code = jnp.where(adv, e_new, (meta >> 17) & 31)
        meta_new = (
            jnp.where(go | over, steps_new, steps)
            | (depth_rec << 7)
            | jnp.where(alive & ~done, _BM_ALIVE, 0)
            | jnp.where(
                ((meta & _BM_HIT) != 0) | hit_now | over, _BM_HIT, 0
            )
            | jnp.where(((meta & _BM_FORCED) != 0) | over, _BM_FORCED, 0)
            | (norm_code << 17)
        )

        return dict(
            b_it=s["b_it"] + 1,
            meta=meta_new,
            vx=jnp.where(adv, nvx, vx),
            vy=jnp.where(adv, nvy, vy),
            vz=jnp.where(adv, nvz, vz),
            index=jnp.where(hit_now, up(idx_b), s["index"]),
            # A coherent hit retires every live lane of the block at once, so
            # one per-BLOCK word records the hit leaf's word for all of them
            # (upsampled to per-ray after the stage) — no full-width carry.
            bhw=jnp.where(hit_b, word_b, s["bhw"]),
            hword=s["hword"],
            ox=ox, oy=oy, oz=oz,
            dx=dx, dy=dy, dz=dz,
            visits=visits,
            b_index=jnp.where(
                int_b, payload_b.astype(jnp.int32),
                jnp.where(root_b, 0, s["b_index"]),
            ),
            bpx=jnp.where(int_b, npx1_b, jnp.where(root_b, 0.0, s["bpx"])),
            bpy=jnp.where(int_b, npy1_b, jnp.where(root_b, 0.0, s["bpy"])),
            bpz=jnp.where(int_b, npz1_b, jnp.where(root_b, 0.0, s["bpz"])),
            b_depth=jnp.where(
                int_b, depth1_b, jnp.where(root_b, 0, s["b_depth"])
            ),
            b_live=(act_b & ~hit_b) | root_b,
            b_stepped=step_b,
            b_h_index=jnp.where(decohere_b, s["b_index"], s["b_h_index"]),
            bhx=jnp.where(decohere_b, s["bpx"], s["bhx"]),
            bhy=jnp.where(decohere_b, s["bpy"], s["bhy"]),
            bhz=jnp.where(decohere_b, s["bpz"], s["bhz"]),
            b_h_depth=jnp.where(decohere_b, s["b_depth"], s["b_h_depth"]),
        )

    return body


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_steps", "strict_descent", "with_visits", "parent_restart",
        "schedule", "backstop_size", "unroll", "warp_levels", "warp_in_body",
        "fuse_sibling", "entry_width", "beam_shape", "beam_iters",
        "beam_unroll", "beam_raw", "beam_pre_permuted", "beam_aux",
        "brick_k", "paged", "tail_unroll", "slim_result", "rebeam_lanes",
        "rebeam_k", "beam_sparse_skip", "tail_fine", "tail_burst",
        "fit_stages", "pack_pool", "beam_pack", "visit_flags",
    ),
)
def trace_staged(
    words: jax.Array,
    origins: jax.Array,
    dirs: jax.Array,
    active_init: jax.Array | None = None,
    max_steps: int = MAX_STEPS,
    strict_descent: bool = True,
    with_visits: bool = False,
    parent_restart: bool = True,
    schedule: tuple | None = None,
    backstop_size: int | None = None,
    unroll: int = 1,
    tail_unroll: int = 8,
    start=None,
    warp_table=None,
    warp_levels: int | None = None,
    warp_in_body: bool = False,
    fuse_sibling: bool | None = None,
    entry_width: int | None = None,
    beam_shape: tuple | None = None,
    beam_iters: int = 16,
    beam_unroll: int = 1,
    beam_raw: bool = False,
    beam_pre_permuted: bool = False,
    beam_aux: bool = False,
    bricks: jax.Array | None = None,
    brick_k: int = 4,
    paged: tuple | None = None,
    slim_result: bool = False,
    rebeam_lanes: int = 64,
    rebeam_k: int = 0,
    beam_sparse_skip: int | None = None,
    tail_fine: int | None = None,
    tail_burst: int = 64,
    fit_stages: bool = True,
    pack_pool: bool | None = None,
    beam_pack: bool = False,
    visit_flags: bool = False,
):
    """Schedule-driven staged-compaction wavefront.

    ``visit_flags``: visits as 0/1 touched flags (see ``trace``) — interior
    zero-set exact; filled-leaf counts reconstructed by the caller from hit
    indices.

    ``beam_pack``: apply the pack9 72-wide row view to the BEAM stage's
    block fetch too. Default OFF — measured a 2.5x deep-frame REGRESSION
    (1089 vs 432 ms, probes/pack_tune_probe.py): at block widths the
    72-wide gather hits the same bad lowering as the width-16/32
    anomalies (PERF.md row-width scaling). Probe knob.

    ``beam_shape``: ``(h, w, block)`` — run a block-synchronous beam stage
    first (see ``_make_beam_body``): rays are pixels of an ``h``x``w`` frame
    (row-major) and ``block``x``block`` tiles march in lockstep with ONE node
    fetch per block while they share cells, for at most ``beam_iters``
    iterations. Rays from decohered tiles (and leftovers when the stage ends)
    continue through the normal per-ray schedule from their exact handoff
    state; results are bit-identical to the plain wavefront. Mutually
    exclusive with ``start``/``entry_width``.

    ``entry_width``: compact the wavefront *before the first iteration* into
    this width by recomputing state from (origin, dir) — at iteration 0 the
    whole live state is a function of the ray itself, so the compaction
    gathers 3-6 floats per ray instead of 24. Ideal when ``active_init``
    pre-kills most rays (the shadow pass). A schedule width of ``None`` then
    means "keep the current working set" (no shuffle).

    ``beam_sparse_skip``: runtime occupancy gate on the beam stage — when
    the live-ray count at entry is <= this threshold, the lockstep stage's
    iteration budget is zeroed via one traced scalar (bit-identical to
    ``beam_iters=0``: blocks hand off the root cell and the pyramid resumes
    per-ray). Sparse wavefronts (the backface-culled shadow pass, ~10%
    occupancy) skip straight to compaction instead of paying ``beam_iters``
    full-width lockstep bodies; dense frames keep the beam. No recompile —
    both behaviors live in the one compiled program.

    ``beam_raw``: skip the final block->pixel un-permute — the returned
    TraceResult's per-ray arrays stay in BLOCK-MAJOR ray order (the
    ``_pixel_to_block`` order of ``beam_shape``). For callers that only
    reduce the result or reorder a single field (e.g. the shadow pass needs
    just the hit mask), this saves a ~10 ms full-width relayout at 1080p.

    ``schedule`` is a tuple of ``(iters, width)`` stages. The wavefront starts
    full-width; before each stage the still-active rays are compacted into a
    ``width``-wide buffer (completed rays scatter their results to the master
    first), then the stage runs at that width until its live set FITS the
    next compaction width (fit-based advancement — one cheap reduce per
    trip; ``iters`` bounds the stage at 2x its value). ``fit_stages=False``
    restores the static behavior: exactly ``iters`` iterations per stage
    (``iters=None`` = run to completion either way). Results are
    bit-identical under both (compaction timing only moves work between
    stages/backstop); static budgets are knife-edged across scenes
    (PERF.md probes/sweep3-4). A stage may carry a third element
    ``beam_k``: after its compaction, the working set is re-tiled into
    ``rebeam_lanes``-wide lockstep beams that march with one shared node
    fetch per block for up to ``beam_k`` iterations before the per-ray body
    runs (mid-march re-beaming, see ``run_rebeam`` — bit-exact; ignored on
    ``with_visits``/bricks/paged traces and when ``max_steps > 127``). Rays exceeding a stage's width are
    *dropped mid-flight* and re-traced from scratch by the final backstop pass
    over the master — traversal is deterministic, so a replay produces
    identical results; only throughput suffers on overflow.

    Exactness: bit-identical hits to ``trace``. Per-node visit counts are
    exact only when no ray overflows a stage width: a replayed ray re-counts
    its early path. The adaptive invariants survive overflow exactly, though:
    visiting a filled leaf ends a ray, so a dropped ray can never have visited
    a filled leaf before the drop — *filled-leaf counts stay exact* — and
    double counts only raise interior/empty-leaf magnitudes, so the *interior
    zero-set is preserved*. Those two are precisely what the feedback scan
    thresholds read (src/compute.wgsl:39-46), which is why the frame API may
    run ``with_visits`` frames on this path.
    """
    n = dirs.shape[0]
    if max_steps > 1023:
        raise ValueError("trace_staged packs steps/depth into 10 bits")
    if slim_result and (beam_aux or bricks is not None):
        raise ValueError("slim_result excludes beam_aux/bricks")
    adaptive_schedules = None
    if schedule is None:
        # Seeded externally-masked wavefronts (start + active_init: the
        # shadow-seed path) take the same compact-first pyramids + runtime
        # occupancy switch as the post-beam transition — their initial live
        # count plays the survivor count's role.
        if beam_shape is not None or (
            start is not None and active_init is not None
        ):
            # After the beam stage only rays near geometry survive; compact
            # straight away (widths tuned on monu10@1080p: ~25% of rays
            # survive the beam stage). Dense frames (deep scenes, inside-the-
            # world cameras) can leave far more survivors than width0 — a
            # runtime lax.switch on the survivor count picks a wider pyramid
            # instead of overflowing into serial backstop replays.
            schedule = (
                (24, max(1024, n // 4)),
                (48, max(1024, n // 16)),
                (None, max(1024, n // 64)),
            )
            # Only for production-size wavefronts: at small n the pyramids
            # degenerate to the same 1024-wide stages (and the backstop is
            # cheap anyway), so the extra switch branches would just triple
            # compile time for the test-scale frames.
            if n >= (1 << 18):
                # Branch thresholds on the post-beam survivor count s:
                # s <= n/8 (sparse wavefronts — the backface-culled shadow
                # pass runs ~10% occupancy and was riding a 2.4x
                # overprovisioned pyramid, VERDICT r2 weak #4), s <= n/4
                # (the tuned default), s <= n/2, else a full-width burst.
                # The sparse branch CANNOT overflow its first stage (the
                # switch guarantees s <= width0); its later stages are
                # covered by the guarded tail + backstop. This differs from
                # the REVERTED round-2 4-branch split, which carved up the
                # (n/8, n/4] band instead: monu10's ~25% survivors landed in
                # it (+45 ms). Here s in (n/8, n/4] still takes the tuned
                # default.
                if words.shape[0] >= BIG_POOL_WORDS and (
                    active_init is not None
                ):
                    # Big-pool SECONDARY wavefronts (externally masked via
                    # active_init — the deep-scene shadow pass): stragglers
                    # ride 1000+ serial iterations whose cost is width x
                    # the big-pool gather rate, so the 3-stage pyramid's
                    # n/64-wide tail dominated the frame (1384 ms of the
                    # deep10 shadow pass). A longer ladder that keeps MID
                    # stages wide (narrowing at 72 iters cliffs: 1517 ms)
                    # and completes at 2048 lanes measured 294.5 ms,
                    # bit-identical (probes/deep_tail_probe.py, deep2/3,
                    # 2026-08-18). Occupancy alone CANNOT key this:
                    # deep-scene primaries land in the same s <= n/4
                    # band and reject every narrow-tailed variant
                    # (907-1517 vs 595-737 ms — their straggler SETS
                    # overflow narrow stages into backstop churn), so the
                    # ladder keys on the static active_init signal and
                    # primaries keep the classic pyramids.
                    adaptive_schedules = (
                        # s <= n/8: the same ladder with its first two
                        # stages merged at n/8 (equal narrowing point,
                        # ~25% less stage-1/2 lane work).
                        (
                            (96, max(1024, n // 8)),
                            (64, max(1024, n // 32)),
                            (96, max(1024, n // 256)),
                            (None, 2048),
                        ),
                        (
                            (32, max(1024, n // 4)),
                            (64, max(1024, n // 8)),
                            (64, max(1024, n // 32)),
                            (96, max(1024, n // 256)),
                            (None, 2048),
                        ),
                        (
                            (32, max(1024, n // 2)),
                            (64, max(1024, n // 8)),
                            (None, max(1024, n // 32)),
                        ),
                        (
                            (32, None),
                            (64, max(1024, n // 4)),
                            (None, max(1024, n // 16)),
                        ),
                    )
                else:
                    adaptive_schedules = (
                        # Only the first stage narrows (n/8): the full
                        # sparse pyramid (n/8, n/32, n/128) was measured
                        # 66 ms WORSE on the monu10 shadow pass (overflow
                        # churn in the later stages — same cliff as round
                        # 2's static-schedule sweep).
                        (
                            (24, max(1024, n // 8)),
                            (48, max(1024, n // 16)),
                            (None, max(1024, n // 64)),
                        ),
                        schedule,
                        (
                            (32, max(1024, n // 2)),
                            (64, max(1024, n // 8)),
                            (None, max(1024, n // 32)),
                        ),
                        (
                            (32, None),
                            (64, max(1024, n // 4)),
                            (None, max(1024, n // 16)),
                        ),
                    )
        else:
            # Tuned on monu10@1080p (PERF.md): a ~20-iteration near-full burst
            # retires the bulk, then three shrinking tail stages. Widths are
            # safety-margined; overflow is correct but slow.
            schedule = (
                (20, None),
                (36, max(1024, n // 8)),
                (48, max(1024, n // 32)),
                (None, max(1024, n // 64)),
            )
        if rebeam_k:
            # Inject mid-march re-beaming into every default stage (the
            # guarded tail handles itself); user-passed schedules are never
            # rewritten.
            def _rb(s):
                return tuple(
                    e if len(e) > 2 or e[0] is None else e + (rebeam_k,)
                    for e in s
                )

            schedule = _rb(schedule)
            if adaptive_schedules is not None:
                adaptive_schedules = tuple(
                    _rb(s) for s in adaptive_schedules
                )
    if backstop_size is None:
        backstop_size = max(1024, n // 8)
    backstop_size = min(backstop_size, n)
    words = words.astype(jnp.uint32)
    if pack_pool is None:
        # Auto: re-pack pools whose group count exceeds the measured
        # row-gather break (see PACK_POOL_WORDS) — and ALWAYS when a warp
        # table above that break rides along: the per-iteration warp-table
        # gather is subject to the same row-count cliff as the pool
        # (a level-7 table is 2M cells; unpacked it measured a 2x frame
        # REGRESSION on a small pool — probes/scene_cam_tune_probe.py,
        # defualt camera: 617 default / 1260 warp7-unpacked / 487
        # warp7+pack9).
        pack_pool = bricks is None and paged is None and (
            words.shape[0] > PACK_POOL_WORDS
            or (warp_table is not None
                and warp_table.shape[0] > PACK_POOL_WORDS)
        )
    if warp_table is not None and warp_levels is None:
        warp_levels = warp_table_levels(warp_table)
    warp = (
        (warp_table, warp_levels, strict_descent, pack_pool,
         warp_table_combined(warp_table))
        if warp_table is not None else None
    )
    if (
        fuse_sibling is None
        and words.shape[0] >= BIG_POOL_WORDS
        and not with_visits
        and parent_restart
        and bricks is None
        and paged is None
        and not (warp is not None and warp_in_body)
    ):
        # Big pools: the row gather dominates the iteration body, so
        # resolving the next descend from the already-fetched row wins —
        # deep10 primaries 737 -> 661 ms measured (probes/deep2_probe.py,
        # 2026-08-18) — the opposite of the small-pool trade (8% loss on
        # monu10, PERF.md). Result-exact; only empty-leaf visit counts can
        # double, hence the with_visits gate (same rule as the fused tail
        # body below). ``fuse_sibling=None`` means auto; an explicit False
        # forces the plain body (for A/Bs under pack9).
        fuse_sibling = True
    fuse_sibling = bool(fuse_sibling)
    body = _make_body(
        words,
        max_steps=max_steps,
        strict_descent=strict_descent,
        with_visits=with_visits,
        parent_restart=parent_restart,
        warp=warp if warp_in_body else None,
        fuse_sibling=fuse_sibling,
        bricks=bricks,
        brick_k=brick_k,
        paged=paged,
        pack9=pack_pool,
        visit_flags=visit_flags,
    )
    # --- beam stage: block-synchronous lockstep marching --------------------
    # The whole trace runs in BLOCK-MAJOR ray order (each tile's rays
    # contiguous): inputs permute here, the packed result matrices permute
    # back at the very end. One relayout each way (~1 ms) buys minor-axis
    # block reduces/broadcasts (~0.05 ms vs ~0.75 ms strided, measured).
    beam_perm = None
    if beam_shape is not None:
        bh, bw, bb = beam_shape
        if bh * bw != n or bh % bb or bw % bb:
            raise ValueError(f"beam_shape {beam_shape} incompatible with {n}")
        if start is not None or entry_width is not None:
            raise ValueError("beam_shape excludes start/entry_width")
        morton = not isinstance(beam_iters, int) and len(beam_iters) > 1
        beam_perm = (bh, bw, bb, morton)
        if not beam_pre_permuted:
            origins = _pixel_to_block(origins, *beam_perm)
            dirs = _pixel_to_block(dirs, *beam_perm)
            if active_init is not None:
                active_init = _pixel_to_block(active_init, *beam_perm)

    master = _init_state(
        words, origins, dirs, active_init, with_visits=with_visits,
        start=start, warp=warp,
    )
    cap = (max_steps + 2) * 26
    if paged is not None:
        # Same majority-scheduling safety bound as trace(): trips <=
        # per_ray_cap * n_pages * ln(R0); ln factor over-provided at 32.
        cap *= paged[2] * 32
    body_u = _unrolled(body, unroll)
    # Run-to-completion loops (tail stages, backstop) ride a handful of
    # straggler rays for hundreds of serial iterations whose cost is the
    # ~0.1-0.2 ms per-trip fixed overhead, not lane work (PERF.md roadmap
    # #3). Composing the body ``tail_unroll`` times per trip divides that
    # serial floor by the unroll factor; inactive lanes are masked inside
    # the body, so results are bit-identical (extra calls after the last
    # ray retires are no-ops). The tail body additionally fuses the sibling
    # step (resolve the next descend from the already-fetched row): ~40%
    # more VPU math per iteration — an 8% net LOSS at full width (PERF.md)
    # but a win in the tail, where stragglers' ITERATION COUNT is the cost
    # (deep10's tail loop was 267 ms of a 661 ms frame, profiled). Exact
    # for hits; only EMPTY-leaf visit counts can double (the feedback scan
    # ignores empty leaves), so it is gated off under with_visits to keep
    # trace_staged == trace bit-exact there.
    tail_body = body
    if (
        tail_unroll > unroll
        and not with_visits
        and not fuse_sibling
        and parent_restart
        and bricks is None
        and paged is None
        and not (warp is not None and warp_in_body)
    ):
        tail_body = _make_body(
            words,
            max_steps=max_steps,
            strict_descent=strict_descent,
            with_visits=with_visits,
            parent_restart=parent_restart,
            warp=None,
            fuse_sibling=True,
            bricks=None,
            brick_k=brick_k,
            pack9=pack_pool,
            visit_flags=visit_flags,
        )
    body_t = _unrolled(tail_body, max(unroll, tail_unroll))

    if beam_shape is not None:
        if max_steps > 127:
            raise ValueError("beam mode packs steps into 7 bits")
        # Clamp before encoding: never-entered rays keep their camera position,
        # whose trunc()ed "normal" can fall outside {-1,0,1}. Those rays are
        # inactive so the value is never read, but an out-of-range code would
        # corrupt the flag bits above it.
        e0 = (
            (jnp.clip(master["nx"], -1, 1).astype(jnp.int32) + 1)
            + 3 * (jnp.clip(master["ny"], -1, 1).astype(jnp.int32) + 1)
            + 9 * (jnp.clip(master["nz"], -1, 1).astype(jnp.int32) + 1)
        )
        carry = dict(
            meta=jnp.where(master["active"], _BM_ALIVE, 0) | (e0 << 17),
            vx=master["vx"], vy=master["vy"], vz=master["vz"],
            index=master["index"],
            hword=jnp.zeros(n, dtype=jnp.uint32),
            ox=master["ox"], oy=master["oy"], oz=master["oz"],
            dx=master["dx"], dy=master["dy"], dz=master["dz"],
            visits=master["visits"],
        )

        # Runtime sparse skip: secondary passes (shadows) arrive at ~10%
        # occupancy, where the full-width lockstep body is pure overhead —
        # compact-first measured 103.8 ms vs the entry beam's 122.5 ms on
        # the 1080p shadow set (probes/shadow_probe.py, 2026-08-17). One
        # traced scalar zeroes the iteration budget when the live count is
        # at or below the threshold; that is bit-identical to beam_iters=0
        # (the stage hands off the root cell and the pyramid resumes
        # per-ray), so dense frames keep the beam and sparse ones skip
        # straight to compaction with no recompile.
        beam_on = None
        if beam_sparse_skip is not None:
            beam_on = (
                jnp.count_nonzero((carry["meta"] & _BM_ALIVE) != 0)
                > beam_sparse_skip
            )

        # --- beam cascade: re-tile at halving block sizes -------------------
        # Tile-Morton ray order keeps every power-of-two sub-tile contiguous,
        # so after the 8x8 stage decoheres near geometry, 4x4 and then 2x2
        # tiles re-coalesce the survivors with NO relayout: at 1080p a voxel
        # spans several pixels, so most hit rays retire in lockstep before
        # ever reaching the per-ray pipeline. Each stage initialises its
        # blocks from the parent stage's handoff cell when that cell provably
        # contains every live ray of the block (exact test; root otherwise).
        stage_sizes = []
        sbb = bb
        while sbb >= 2:
            stage_sizes.append(sbb)
            sbb //= 2
        if isinstance(beam_iters, int):
            # Default: a single lockstep stage. Finer re-tiles are available
            # (beam_iters=(16, 12, ...)) but measured a net loss on v5e at
            # 1080p: halving the tile halves the fetch amortization, so the
            # block-level row gather approaches full-width cost while the
            # full-width body still runs every iteration.
            stage_iters = (beam_iters,)
        else:
            stage_iters = tuple(beam_iters)
        stage_sizes = stage_sizes[: len(stage_iters)]
        h_prev = None  # (index, x, y, z, depth) at nb_prev
        for sbb, it_budget in zip(stage_sizes, stage_iters):
            lanes = sbb * sbb
            nb = n // lanes
            _, down_any, _, bup = _block_ops(nb, lanes)
            alive = (carry["meta"] & _BM_ALIVE) != 0
            if h_prev is None:
                b_index0 = jnp.zeros(nb, dtype=jnp.int32)
                bp0 = [jnp.zeros(nb, dtype=jnp.float32) for _ in range(3)]
                b_depth0 = jnp.zeros(nb, dtype=jnp.int32)
            else:
                rep = h_prev[0].shape[0]
                fan = nb // rep

                def widen(a):
                    return jnp.broadcast_to(
                        a[:, None], (rep, fan)
                    ).reshape(nb)

                ci = widen(h_prev[0])
                cx0, cy0, cz0 = (widen(h_prev[k]) for k in (1, 2, 3))
                cd = widen(h_prev[4])
                # validate: the candidate cell must contain every live ray
                hx_r, hy_r, hz_r = bup(cx0), bup(cy0), bup(cz0)
                half0 = bup(jnp.exp2(-cd.astype(jnp.float32)))
                vx_, vy_, vz_ = carry["vx"], carry["vy"], carry["vz"]
                if strict_descent:
                    okr = (
                        (vx_ > hx_r - half0) & (vx_ <= hx_r + half0)
                        & (vy_ > hy_r - half0) & (vy_ <= hy_r + half0)
                        & (vz_ > hz_r - half0) & (vz_ <= hz_r + half0)
                    )
                else:
                    okr = (
                        (vx_ >= hx_r - half0) & (vx_ < hx_r + half0)
                        & (vy_ >= hy_r - half0) & (vy_ < hy_r + half0)
                        & (vz_ >= hz_r - half0) & (vz_ < hz_r + half0)
                    )
                okb = jnp.all(
                    (okr | ~alive).reshape(nb, lanes), axis=1
                )
                b_index0 = jnp.where(okb, ci, 0)
                bp0 = [
                    jnp.where(okb, c, 0.0) for c in (cx0, cy0, cz0)
                ]
                b_depth0 = jnp.where(okb, cd, 0)
            bstate = dict(
                carry,
                b_it=jnp.int32(0),
                b_index=b_index0,
                bpx=bp0[0], bpy=bp0[1], bpz=bp0[2],
                b_depth=b_depth0,
                b_live=down_any(alive),
                b_stepped=jnp.zeros(nb, dtype=bool),
                b_h_index=jnp.zeros(nb, dtype=jnp.int32),
                bhw=jnp.zeros(nb, dtype=jnp.uint32),
                bhx=jnp.zeros(nb, dtype=jnp.float32),
                bhy=jnp.zeros(nb, dtype=jnp.float32),
                bhz=jnp.zeros(nb, dtype=jnp.float32),
                b_h_depth=jnp.zeros(nb, dtype=jnp.int32),
            )
            pre_hit = (carry["meta"] & _BM_HIT) != 0
            beam_body = _unrolled(
                _make_beam_body(
                    words, nb, lanes,
                    max_steps=max_steps, strict_descent=strict_descent,
                    with_visits=with_visits, pack9=pack_pool and beam_pack,
                    visit_flags=visit_flags,
                ),
                beam_unroll,
            )
            # The beam budget stays STATIC: an occupancy-adaptive variant
            # (march while live beams cover > n/4 lanes, bounded 2x) was
            # measured a monu10 LOSS — fit 174 vs 135 ms with it reverted
            # (probes/sweep6.py runs, 2026-08-18): beams retiring rays in
            # lockstep stay profitable well below the occupancy threshold,
            # and no cheap runtime signal separates "still retiring" from
            # "stalled". The fit machinery covers the per-ray stages only.
            k_dyn = (
                it_budget if beam_on is None
                else jnp.where(beam_on, it_budget, 0)
            )
            bstate = jax.lax.while_loop(
                lambda s2, k=k_dyn: (
                    jnp.any(s2["b_live"]) & (s2["b_it"] < k)
                ),
                beam_body,
                bstate,
            )
            h_prev = (
                jnp.where(
                    bstate["b_live"], bstate["b_index"], bstate["b_h_index"]
                ),
                jnp.where(bstate["b_live"], bstate["bpx"], bstate["bhx"]),
                jnp.where(bstate["b_live"], bstate["bpy"], bstate["bhy"]),
                jnp.where(bstate["b_live"], bstate["bpz"], bstate["bhz"]),
                jnp.where(
                    bstate["b_live"], bstate["b_depth"], bstate["b_h_depth"]
                ),
            )
            carry = {k: bstate[k] for k in carry}
            # Only genuinely-hit rays take the block word: a step-cap-forced
            # ray sets the HIT bit too, but its block may hit later in the
            # stage and its word must stay 0 (forced pixels shade red).
            carry["hword"] = jnp.where(
                ((bstate["meta"] & _BM_HIT) != 0)
                & ((bstate["meta"] & _BM_FORCED) == 0)
                & ~pre_hit,
                bup(bstate["bhw"]),
                carry["hword"],
            )

        # Reconstruct the master wavefront from the slim beam carry. Rays of
        # still-live blocks (iteration budget exhausted) and decohered blocks
        # resume per-ray from the recorded block handoff — valid iff the cell
        # provably contains the ray's frozen position (exact per-ray test);
        # failures resume from the root, always valid.
        beam_lanes = lanes
        bstate = dict(carry)
        meta = bstate["meta"]
        hit = (meta & _BM_HIT) != 0
        master["active"] = (meta & _BM_ALIVE) != 0
        master["hit"] = hit
        master["forced"] = (meta & _BM_FORCED) != 0
        master["steps"] = meta & 127
        master["out_steps"] = meta & 127
        master["out_depth"] = (meta >> 7) & 127
        e = (meta >> 17) & 31
        dec = {
            "nx": (e % 3 - 1).astype(jnp.float32),
            "ny": (e // 3 % 3 - 1).astype(jnp.float32),
            "nz": (e // 9 - 1).astype(jnp.float32),
        }
        for out_k, in_k in (("opx", "vx"), ("opy", "vy"), ("opz", "vz")):
            master[out_k] = jnp.where(hit, bstate[in_k], 0.0)
        for out_k, in_k in (("onx", "nx"), ("ony", "ny"), ("onz", "nz")):
            master[out_k] = jnp.where(hit, dec[in_k], 0.0)
        master["index"] = bstate["index"]
        master["out_word"] = bstate["hword"]
        for k in ("vx", "vy", "vz"):
            master[k] = bstate[k]
        master.update(dec)
        master["visits"] = bstate["visits"]
        # Positions moved during the beam march without a skip lookup: the
        # carried skip cube is stale — zero it (first post-beam step is a
        # plain one; the restart after it refreshes).
        master["skw"] = jnp.zeros(n, dtype=jnp.int32)

        h_index_b, hxb, hyb, hzb, h_depth_b = h_prev
        h_index, h_depth = bup(h_index_b), bup(h_depth_b)
        hx, hy, hz = bup(hxb), bup(hyb), bup(hzb)
        half_r = bup(jnp.exp2(-h_depth_b.astype(jnp.float32)))
        vx, vy, vz = bstate["vx"], bstate["vy"], bstate["vz"]
        if strict_descent:
            in_end = (
                (vx > hx - half_r) & (vx <= hx + half_r)
                & (vy > hy - half_r) & (vy <= hy + half_r)
                & (vz > hz - half_r) & (vz <= hz + half_r)
            )
        else:
            in_end = (
                (vx >= hx - half_r) & (vx < hx + half_r)
                & (vy >= hy - half_r) & (vy < hy + half_r)
                & (vz >= hz - half_r) & (vz < hz + half_r)
            )
        master["node_index"] = jnp.where(in_end, h_index, 0)
        master["cpx"] = jnp.where(in_end, hx, 0.0)
        master["cpy"] = jnp.where(in_end, hy, 0.0)
        master["cpz"] = jnp.where(in_end, hz, 0.0)
        master["depth"] = jnp.where(in_end, h_depth, 0)

    # --- packed-row state shuffles -----------------------------------------
    # Element gathers cost ~7 ns each; contiguous 8-wide rows ~2.3 ns per ROW
    # (PERF.md) — but only 8-wide rows hit the fast path (22-wide degrades to
    # ~5 ns/elem, profiled). So state packs into 8-lane bitcast f32 matrices:
    # three live (L0..L2), two results (R0, R1). r_sign is recomputed from d.

    def _f32(x):
        if x.dtype == jnp.bool_:
            x = x.astype(jnp.int32)
        if x.dtype != jnp.float32:
            x = jax.lax.bitcast_convert_type(x, jnp.float32)
        return x

    def _i32(x):
        return jax.lax.bitcast_convert_type(x, jnp.int32)

    def _col(x):
        return _f32(x)[:, None]

    def pack_live(s):
        w = s["steps"].shape[0]
        z = jnp.zeros((w, 1), jnp.float32)
        l0 = jnp.concatenate(
            [_col(s["active"]), _col(s["steps"]), _col(s["node_index"]),
             _col(s["depth"]), _col(s["ox"]), _col(s["oy"]), _col(s["oz"]),
             _col(s["bmode"])], axis=1)
        l1 = jnp.concatenate(
            [_col(s["dx"]), _col(s["dy"]), _col(s["dz"]),
             _col(s["vx"]), _col(s["vy"]), _col(s["vz"]),
             _col(s["skw"]), z], axis=1)
        l2 = jnp.concatenate(
            [_col(s["nx"]), _col(s["ny"]), _col(s["nz"]),
             _col(s["cpx"]), _col(s["cpy"]), _col(s["cpz"]), z, z], axis=1)
        return l0, l1, l2

    def unpack_live(l0, l1, l2):
        return dict(
            active=_i32(l0[:, 0]) != 0,
            steps=_i32(l0[:, 1]),
            node_index=_i32(l0[:, 2]),
            depth=_i32(l0[:, 3]),
            ox=l0[:, 4], oy=l0[:, 5], oz=l0[:, 6],
            bmode=_i32(l0[:, 7]) != 0,
            dx=l1[:, 0], dy=l1[:, 1], dz=l1[:, 2],
            vx=l1[:, 3], vy=l1[:, 4], vz=l1[:, 5],
            skw=_i32(l1[:, 6]),
            nx=l2[:, 0], ny=l2[:, 1], nz=l2[:, 2],
            cpx=l2[:, 3], cpy=l2[:, 4], cpz=l2[:, 5],
        )

    def meta2_of(s):
        # meta2 = steps(0:10) | depth(10:20) | active(20) | hit(21) |
        # forced(22) | normal-code(23:28) — out-normals are always sign
        # vectors (components in {-1,0,1}), base-3-coded in 5 bits.
        e = (
            (s["onx"].astype(jnp.int32) + 1)
            + 3 * (s["ony"].astype(jnp.int32) + 1)
            + 9 * (s["onz"].astype(jnp.int32) + 1)
        )
        return (
            s["out_steps"]
            | (s["out_depth"] << 10)
            | jnp.where(s["active"], 1 << 20, 0)
            | jnp.where(s["hit"], 1 << 21, 0)
            | jnp.where(s["forced"], 1 << 22, 0)
            | (e << 23)
        )

    def pack_result(s):
        # ONE 8-lane result mat: scatters cost ~10 ns/elem on v5e (the
        # write-back of a 518K-wide stage costs 45 ms at 16 lanes, measured),
        # so results pack into [meta2, index, out_pos xyz, word, 0, 0].
        # Lane 5 carries the hit leaf's raw pool word so shading needs no
        # gather.
        w = s["hit"].shape[0]
        z = jnp.zeros((w, 2), jnp.float32)
        return jnp.concatenate(
            [_col(meta2_of(s)), _col(s["index"]),
             _col(s["opx"]), _col(s["opy"]), _col(s["opz"]),
             _col(s["out_word"]), z], axis=1)

    def Rpack(s):
        """The composable result record (INT domain): the full 8-lane mat,
        or just the meta2 word when ``slim_result`` — callers like the
        shadow pass consume only hit/forced/steps/depth/normal, all of
        which live in meta2, so the backward compose shrinks from [n,8]
        row gathers to [n] element gathers (the master-width compose row
        gather was 34 ms of the 1080p shadow frame, profiled)."""
        return meta2_of(s) if slim_result else _i32(pack_result(s))

    def fresh_outputs(width):
        z = jnp.zeros(width, dtype=jnp.float32)
        return dict(
            hit=jnp.zeros(width, dtype=bool),
            forced=jnp.zeros(width, dtype=bool),
            index=jnp.full(width, -1, dtype=jnp.int32),
            opx=z, opy=z, opz=z,
            onx=z, ony=z, onz=z,
            out_steps=jnp.zeros(width, dtype=jnp.int32),
            out_depth=jnp.zeros(width, dtype=jnp.int32),
            out_word=jnp.zeros(width, dtype=jnp.uint32),
        )

    def make_sub(live_rows, active, visits, it):
        sub = unpack_live(*live_rows)
        sub["active"] = active
        sub.update(fresh_outputs(active.shape[0]))
        sub["it"] = it
        sub["visits"] = visits
        return sub

    def run_rebeam(sub, beam_k, lanes):
        """Mid-march re-beaming (VERDICT r2 #3): re-tile the current working
        set into fresh ``lanes``-wide lockstep beams and march them with ONE
        shared node fetch per block (``_make_beam_body``) for up to ``beam_k``
        iterations before the per-ray stage body resumes.

        Stage compaction preserves block-major ray order, so consecutive
        survivors are spatially coherent; and survivors of a tile whose
        decoherence was caused by rays that have since RETIRED re-cohere in
        place. A fresh block re-descends from the root as one (shared
        fetches) and its rays advance in lockstep until the block decoheres,
        at which point lanes freeze and resume per-ray from the recorded
        block handoff — the identical exactness argument as the entry beam
        stage: every per-ray formula is ``_make_body``'s own, and sharing the
        fetch is valid because find_voxel is position-pure (reference:
        src/shader.wgsl:130-175). Mid-march re-descent can RE-COUNT the empty
        leaf a ray already sits in, so ``with_visits`` frames skip re-beaming
        (the caller gates ``beam_k``), keeping trace_staged == trace on
        visit counts exactly."""
        w = sub["active"].shape[0]
        if w % lanes:
            return sub
        nb = w // lanes
        _, down_any_r, _, bup_r = _block_ops(nb, lanes)
        alive0 = sub["active"]
        e0 = (
            (jnp.clip(sub["nx"], -1, 1).astype(jnp.int32) + 1)
            + 3 * (jnp.clip(sub["ny"], -1, 1).astype(jnp.int32) + 1)
            + 9 * (jnp.clip(sub["nz"], -1, 1).astype(jnp.int32) + 1)
        )
        zb = jnp.zeros(nb, dtype=jnp.float32)
        zbi = jnp.zeros(nb, dtype=jnp.int32)
        carry = dict(
            b_it=jnp.int32(0),
            meta=jnp.where(alive0, _BM_ALIVE, 0) | sub["steps"] | (e0 << 17),
            vx=sub["vx"], vy=sub["vy"], vz=sub["vz"],
            index=sub["index"],
            hword=jnp.zeros(w, dtype=jnp.uint32),
            ox=sub["ox"], oy=sub["oy"], oz=sub["oz"],
            dx=sub["dx"], dy=sub["dy"], dz=sub["dz"],
            visits=sub["visits"],
            b_index=zbi, bpx=zb, bpy=zb, bpz=zb, b_depth=zbi,
            b_live=down_any_r(alive0),
            b_stepped=jnp.zeros(nb, dtype=bool),
            b_h_index=zbi,
            bhw=jnp.zeros(nb, dtype=jnp.uint32),
            bhx=zb, bhy=zb, bhz=zb, b_h_depth=zbi,
        )
        bbody = _unrolled(
            _make_beam_body(
                words, nb, lanes, max_steps=max_steps,
                strict_descent=strict_descent, with_visits=with_visits,
                pack9=pack_pool and beam_pack, visit_flags=visit_flags,
            ),
            beam_unroll,
        )
        bst = jax.lax.while_loop(
            lambda s2: jnp.any(s2["b_live"]) & (s2["b_it"] < beam_k),
            bbody, carry,
        )
        m2 = bst["meta"]
        hit_n = ((m2 & _BM_HIT) != 0) & alive0
        retired = alive0 & ((m2 & _BM_ALIVE) == 0)
        e = (m2 >> 17) & 31
        enx = (e % 3 - 1).astype(jnp.float32)
        eny = (e // 3 % 3 - 1).astype(jnp.float32)
        enz = (e // 9 - 1).astype(jnp.float32)
        out = dict(sub)
        out["active"] = (m2 & _BM_ALIVE) != 0
        out["steps"] = jnp.where(alive0, m2 & 127, sub["steps"])
        out["hit"] = jnp.where(alive0, hit_n, sub["hit"])
        out["forced"] = jnp.where(
            alive0, (m2 & _BM_FORCED) != 0, sub["forced"]
        )
        out["out_steps"] = jnp.where(retired, m2 & 127, sub["out_steps"])
        out["out_depth"] = jnp.where(
            retired, (m2 >> 7) & 127, sub["out_depth"]
        )
        out["index"] = bst["index"]
        # Only genuinely-hit rays take the block word (forced pixels shade
        # red; their block may have hit later in the stage).
        out["out_word"] = jnp.where(
            hit_n & ((m2 & _BM_FORCED) == 0),
            bup_r(bst["bhw"]),
            sub["out_word"],
        )
        for k_out, k_in in (("opx", "vx"), ("opy", "vy"), ("opz", "vz")):
            out[k_out] = jnp.where(hit_n, bst[k_in], sub[k_out])
        for k_out, v in (("onx", enx), ("ony", eny), ("onz", enz)):
            out[k_out] = jnp.where(hit_n, v, sub[k_out])
        for k in ("vx", "vy", "vz"):
            out[k] = bst[k]
        # Live rays carry their CURRENT normal in the meta code.
        out["nx"] = jnp.where(alive0, enx, sub["nx"])
        out["ny"] = jnp.where(alive0, eny, sub["ny"])
        out["nz"] = jnp.where(alive0, enz, sub["nz"])
        out["visits"] = bst["visits"]
        # Resume ancestor: the block handoff (the current cell for blocks
        # that merely ran out of budget), validated per ray by the exact
        # containment test; failures restart from the root — always valid.
        h_i = jnp.where(bst["b_live"], bst["b_index"], bst["b_h_index"])
        h_d = jnp.where(bst["b_live"], bst["b_depth"], bst["b_h_depth"])
        hxr = bup_r(jnp.where(bst["b_live"], bst["bpx"], bst["bhx"]))
        hyr = bup_r(jnp.where(bst["b_live"], bst["bpy"], bst["bhy"]))
        hzr = bup_r(jnp.where(bst["b_live"], bst["bpz"], bst["bhz"]))
        half_r = bup_r(jnp.exp2(-h_d.astype(jnp.float32)))
        vx_, vy_, vz_ = bst["vx"], bst["vy"], bst["vz"]
        if strict_descent:
            okr = (
                (vx_ > hxr - half_r) & (vx_ <= hxr + half_r)
                & (vy_ > hyr - half_r) & (vy_ <= hyr + half_r)
                & (vz_ > hzr - half_r) & (vz_ <= hzr + half_r)
            )
        else:
            okr = (
                (vx_ >= hxr - half_r) & (vx_ < hxr + half_r)
                & (vy_ >= hyr - half_r) & (vy_ < hyr + half_r)
                & (vz_ >= hzr - half_r) & (vz_ < hzr + half_r)
            )
        out["node_index"] = jnp.where(okr, bup_r(h_i), 0)
        out["cpx"] = jnp.where(okr, hxr, 0.0)
        out["cpy"] = jnp.where(okr, hyr, 0.0)
        out["cpz"] = jnp.where(okr, hzr, 0.0)
        out["depth"] = jnp.where(okr, bup_r(h_d), 0)
        out["skw"] = jnp.zeros_like(sub["skw"])  # positions moved in-beam
        return out

    # Re-beaming recounts empty leaves (see run_rebeam) and the beam body
    # reads undecorated pool words, so it only runs on plain exact-count-free
    # traces; elsewhere schedule beam_k entries silently degrade to per-ray.
    rebeam_ok = (
        not with_visits and bricks is None and paged is None
        and max_steps <= 127
    )

    M0, M1, M2 = pack_live(master)     # initial live state (replay source)
    R_master = Rpack(master)           # results; meta2 bit 20 = live flag

    def scatter_R(R, sub, tgt):
        return R.at[tgt].set(Rpack(sub), mode="drop")

    def r_active(R):
        m = R if slim_result else R[:, 0]
        return (m & (1 << 20)) != 0

    # Stage pipeline: compact (from the previous subset) -> run. A stage
    # width of None runs the current working set unshuffled (the full
    # wavefront when no compaction has happened yet) — big-table row gathers
    # cost ~3.6 ns/elem, so compactions are deferred until the active set is
    # small or recomputable.
    #
    # Results are NEVER scattered back to the master between stages: on v5e a
    # row scatter costs ~87 ns/row vs ~1.3 ns/row for the equivalent gather
    # (profiled — the two write-backs alone were 56 ms of a 222 ms frame).
    # Each compaction instead records (parent active mask, ranks, width,
    # parent packed results) in ``chain``; after the last stage the master
    # result composes BACKWARD through the chain with one row gather per
    # stage at the parent's width. The compose runs in the int domain:
    # gathers move bits verbatim, and int selects can't flush the denormal
    # bit patterns the packed lanes carry.
    # The whole post-beam pipeline (slim transition -> stages -> backward
    # compose -> backstop) is a function of the schedule so it can be traced
    # per branch of the adaptive-schedule switch below.
    def run_schedule(schedule):
      sub = None
      chain = []        # (mask, ranks, width, parent packed results as i32)

      if (
        beam_perm is not None
        and schedule
        and schedule[0][1] is not None
      ):
          # Slim post-beam compaction: the surviving rays' live state is fully
          # described by (meta, d, voxel_pos) plus the per-BLOCK handoff cell,
          # so the first transition gathers ONE 8-lane matrix (+ one more for
          # per-ray origins unless shared) instead of the three generic live
          # mats — the generic 24-lane gather at n/4 costs ~45 ms on v5e.
          width0 = min(schedule[0][1], n)
          schedule = (
              ((schedule[0][0], None) + tuple(schedule[0][2:]),)
              + tuple(schedule[1:])
          )
          ranks0 = fast_ranks(master["active"])
          sel = fast_nonzero(master["active"], width0, n, ranks=ranks0)
          chain.append((master["active"], ranks0, width0, R_master))
          safe = jnp.minimum(sel, n - 1)
          valid = sel < n
          B0 = jnp.concatenate(
              [_col(meta), _col(master["dx"]), _col(master["dy"]),
               _col(master["dz"]), _col(master["vx"]), _col(master["vy"]),
               _col(master["vz"]), jnp.zeros((n, 1), jnp.float32)], axis=1)
          b0 = B0[safe]
          meta_s = _i32(b0[:, 0])
          alive_s = ((meta_s & _BM_ALIVE) != 0) & valid
          e_s = (meta_s >> 17) & 31
          # Per-block handoff state rides ONE packed row per surviving ray
          # (five separate element gathers cost ~10 ms at n/4, profiled).
          BH = jnp.concatenate(
              [_col(h_index_b), _col(hxb), _col(hyb), _col(hzb),
               _col(h_depth_b),
               jnp.zeros((h_index_b.shape[0], 3), jnp.float32)], axis=1)
          bh = BH[safe // beam_lanes]  # final cascade stage's block row
          h_i_s = _i32(bh[:, 0])
          hx_s, hy_s, hz_s = bh[:, 1], bh[:, 2], bh[:, 3]
          h_d_s = _i32(bh[:, 4])
          half_s = jnp.exp2(-h_d_s.astype(jnp.float32))
          vx_s, vy_s, vz_s = b0[:, 4], b0[:, 5], b0[:, 6]
          if strict_descent:
              ie_s = (
                  (vx_s > hx_s - half_s) & (vx_s <= hx_s + half_s)
                  & (vy_s > hy_s - half_s) & (vy_s <= hy_s + half_s)
                  & (vz_s > hz_s - half_s) & (vz_s <= hz_s + half_s)
              )
          else:
              ie_s = (
                  (vx_s >= hx_s - half_s) & (vx_s < hx_s + half_s)
                  & (vy_s >= hy_s - half_s) & (vy_s < hy_s + half_s)
                  & (vz_s >= hz_s - half_s) & (vz_s < hz_s + half_s)
              )
          # Entry positions are per-ray even for a shared camera origin (the
          # slab advance differs per pixel), so they are always gathered.
          B1 = jnp.concatenate(
              [_col(master["ox"]), _col(master["oy"]), _col(master["oz"]),
               jnp.zeros((n, 5), jnp.float32)], axis=1)
          b1 = B1[safe]
          ox_s, oy_s, oz_s = b1[:, 0], b1[:, 1], b1[:, 2]
          sub = dict(
              it=jnp.int32(0),
              active=alive_s,
              steps=meta_s & 127,
              node_index=jnp.where(ie_s, h_i_s, 0),
              cpx=jnp.where(ie_s, hx_s, 0.0),
              cpy=jnp.where(ie_s, hy_s, 0.0),
              cpz=jnp.where(ie_s, hz_s, 0.0),
              depth=jnp.where(ie_s, h_d_s, 0),
              ox=ox_s, oy=oy_s, oz=oz_s,
              dx=b0[:, 1], dy=b0[:, 2], dz=b0[:, 3],
              vx=vx_s, vy=vy_s, vz=vz_s,
              nx=(e_s % 3 - 1).astype(jnp.float32),
              ny=(e_s // 3 % 3 - 1).astype(jnp.float32),
              nz=(e_s // 9 - 1).astype(jnp.float32),
              bmode=jnp.zeros(width0, dtype=bool),
              skw=jnp.zeros(width0, dtype=jnp.int32),
              visits=master["visits"],
          )
          sub.update(fresh_outputs(width0))

      if (
        start is not None
        and beam_perm is None
        and sub is None
        and schedule
        and schedule[0][1] is not None
      ):
          # Seeded entry compaction: at it=0 the whole live state is a pure
          # function of (origin, dir, seed) — ``_init_state`` is
          # deterministic — so the first transition regenerates it from an
          # 11-lane gather (origins, dirs, seed idx/pos/depth) instead of
          # the three generic 24-lane live mats (the n/4-wide 24-lane gather
          # costs ~45 ms at 1080p, profiled — same motivation as the slim
          # post-beam compaction above).
          width0 = min(schedule[0][1], n)
          schedule = (
              ((schedule[0][0], None) + tuple(schedule[0][2:]),)
              + tuple(schedule[1:])
          )
          ranks0 = fast_ranks(master["active"])
          sel = fast_nonzero(master["active"], width0, n, ranks=ranks0)
          chain.append((master["active"], ranks0, width0, R_master))
          safe = jnp.minimum(sel, n - 1)
          sub = _init_state(
              words, origins[safe], dirs[safe],
              (master["active"][safe] & (sel < n)),
              with_visits=False,
              start=(start[0][safe], start[1][safe], start[2][safe]),
          )
          sub["visits"] = master["visits"]

      if entry_width is not None:
          ew = min(entry_width, n)
          ranks0 = fast_ranks(master["active"])
          sel = fast_nonzero(master["active"], ew, n, ranks=ranks0)
          chain.append((master["active"], ranks0, ew, R_master))
          safe = jnp.minimum(sel, n - 1)
          sub = _init_state(
              words,
              origins[safe],
              dirs[safe],
              (master["active"][safe] & (sel < n)),
              with_visits=with_visits,
          )
          sub["visits"] = master["visits"]

      # The final (None, width) stage's compaction is GUARDED (lax.cond):
      # if more rays survive than the tail width, the compaction is skipped
      # and the tail runs at the current stage's width instead — dropping
      # them into the serial backstop costs ~1 s on long-tailed loads (the
      # deep10 shadow pass, profiled: the backstop's replay loop was the
      # single biggest op in the frame).
      guard_tail = (
          len(schedule) >= 2
          and schedule[-1][0] is None
          and schedule[-1][1] is not None
      )
      main_sched = schedule[:-1] if guard_tail else schedule

      def next_width(si):
          """The width of the NEXT compaction after stage ``si`` (the fit
          target for fit-based stage advancement), or None when no later
          stage compacts."""
          for e2 in main_sched[si + 1:]:
              if e2[1] is not None:
                  return min(e2[1], n)
          if guard_tail:
              return min(schedule[-1][1], n)
          return None

      for si, entry in enumerate(main_sched):
          iters, width = entry[0], entry[1]
          beam_k = entry[2] if len(entry) > 2 and rebeam_ok else 0
          if sub is None:
              if width is None:
                  sub = dict(master)
              else:
                  width = min(width, n)
                  ranks0 = fast_ranks(master["active"])
                  sel = fast_nonzero(master["active"], width, n, ranks=ranks0)
                  chain.append((master["active"], ranks0, width, R_master))
                  safe = jnp.minimum(sel, n - 1)
                  sub = make_sub(
                      (M0[safe], M1[safe], M2[safe]), (sel < n),
                      master["visits"], jnp.int32(0),
                  )
          elif width is None:
              pass  # keep the current working set, run more iterations
          else:
              w_prev = sub["active"].shape[0]
              width = min(width, w_prev)
              ranks = fast_ranks(sub["active"])
              sel = fast_nonzero(sub["active"], width, w_prev, ranks=ranks)
              chain.append((sub["active"], ranks, width, Rpack(sub)))
              safe = jnp.minimum(sel, w_prev - 1)
              valid = sel < w_prev
              l0, l1, l2 = pack_live(sub)
              sub2 = make_sub(
                  (l0[safe], l1[safe], l2[safe]),
                  sub["active"][safe] & valid,
                  sub["visits"],
                  sub["it"],
              )
              sub = sub2

          if beam_k:
              sub = run_rebeam(sub, beam_k, rebeam_lanes)

          if iters is None:
              def cond(s2):
                  return jnp.any(s2["active"]) & (s2["it"] < cap)

              sub = jax.lax.while_loop(cond, body_t, sub)
          elif iters > 0:
              nxt = next_width(si)
              if fit_stages and nxt is not None and (
                  nxt < sub["active"].shape[0]
              ):
                  # Fit-based stage advancement: run until the live set FITS
                  # the next compaction width, then compact immediately —
                  # wider iterations are pure overhead once survivors fit,
                  # and compacting before they fit drops rays into serial
                  # backstop replays. Static budgets are knife-edged across
                  # scenes (monu10's optimum (20,n/4)(40,n/16) cliffs
                  # defualt +475 ms and deep +1 s, probes/sweep3-4); the
                  # fit test adapts per scene for one cheap reduce per
                  # trip. ``iters`` becomes the budget scale: the stage is
                  # bounded at 2x its scheduled iterations (beyond that,
                  # compaction overflow + backstop replay — today's static
                  # behavior — is the fallback).
                  it0 = sub["it"]
                  max_it = 2 * iters

                  def acond(s2, _it0=it0, _nxt=nxt, _max=max_it):
                      live = jnp.sum(s2["active"].astype(jnp.int32))
                      return (live > _nxt) & (s2["it"] - _it0 < _max)

                  sub = jax.lax.while_loop(acond, body_u, sub)
              else:
                  sub = jax.lax.fori_loop(
                      0, -(-iters // unroll), lambda i, s2: body_u(s2), sub
                  )

      # Backward compose: gather each parent's retired-or-deeper results from
      # the child stage; rays dropped at a compaction (rank >= width) keep
      # their parent row's live flag and fall through to the backstop.
      def compose(sub2, chain2):
          acc = Rpack(sub2)
          for mact, ranks, w, parent_r in reversed(chain2):
              taken = mact & (ranks < w)
              g = acc[jnp.clip(ranks, 0, w - 1)]
              sel_t = taken if slim_result else taken[:, None]
              acc = jnp.where(sel_t, g, parent_r)
          return acc, sub2["visits"]

      def tail_cond(s2):
          return jnp.any(s2["active"]) & (s2["it"] < cap)

      def narrow_to(s2, chain2, w_new):
          """Compact ``s2`` into a ``w_new``-wide working set, linking the
          transition into the compose chain (identical machinery to the
          scheduled stage hops)."""
          w_cur = s2["active"].shape[0]
          ranks = fast_ranks(s2["active"])
          sel = fast_nonzero(s2["active"], w_new, w_cur, ranks=ranks)
          safe = jnp.minimum(sel, w_cur - 1)
          l0, l1, l2 = pack_live(s2)
          s3 = make_sub(
              (l0[safe], l1[safe], l2[safe]),
              s2["active"][safe] & (sel < w_cur),
              s2["visits"],
              s2["it"],
          )
          return s3, chain2 + [(s2["active"], ranks, w_new, Rpack(s2))]

      def completion(s3, chain3):
          s3 = jax.lax.while_loop(tail_cond, body_t, s3)
          return compose(s3, chain3)

      if guard_tail and sub is not None:
          w_prev = sub["active"].shape[0]
          w_tail = min(schedule[-1][1], w_prev)
          # Second-level tail: run a short burst at w_tail, then — ONLY if
          # every live ray fits (strict count test, so no ray can drop to
          # the backstop) — compact once more to a much narrower completion
          # width. Stragglers ride hundreds of serial iterations whose cost
          # is width x big-pool gather rate: the deep10 shadow tail at n/64
          # (32K lanes over a 253 MB pool) was 56.5% of the 2 s frame
          # (xprof 2026-08-17); completing at ~4K lanes instead measured
          # 1447 -> 484 ms for the whole pass (probes/deep_tail_probe.py),
          # bit-identical hits.
          w_fine = max(1024, w_tail // 8) if tail_fine is None else min(
              tail_fine, w_tail
          )

          def tail_finish(s3, chain3):
              if w_fine >= w_tail or tail_burst <= 0:
                  return completion(s3, chain3)
              tu = max(unroll, tail_unroll)
              if fit_stages:
                  # Fit-based burst: ride w_tail only until the live set
                  # fits the fine completion width (checked every unrolled
                  # trip), bounded at 2x the static budget — same
                  # adaptivity as the scheduled stages above.
                  it1 = s3["it"]

                  def bcond(s4):
                      live = jnp.sum(s4["active"].astype(jnp.int32))
                      return (live > w_fine) & (
                          s4["it"] - it1 < 2 * tail_burst
                      )

                  s3 = jax.lax.while_loop(bcond, body_t, s3)
              else:
                  s3 = jax.lax.fori_loop(
                      0, -(-tail_burst // tu), lambda i, s: body_t(s), s3
                  )
              n2 = jnp.sum(s3["active"].astype(jnp.int32))

              def fine():
                  s4, chain4 = narrow_to(s3, chain3, w_fine)
                  return completion(s4, chain4)

              return jax.lax.cond(
                  n2 <= w_fine, fine, lambda: completion(dict(s3), chain3)
              )

          if w_tail >= w_prev:
              R, visits = tail_finish(sub, chain)
          else:
              def tail_narrow():
                  s3, chain3 = narrow_to(sub, chain, w_tail)
                  return tail_finish(s3, chain3)

              def tail_wide():
                  return completion(dict(sub), chain)

              # Moderate overflow (a few backstop passes) is CHEAPER than
              # riding the whole tail at the previous stage's width
              # (measured on the deep10 shadow pass: ~2.2 s via overflow vs
              # ~2.9 s wide-tail), so the wide tail engages only when the
              # overflow would be pathological (> ~4 backstop passes).
              n_act = jnp.sum(sub["active"].astype(jnp.int32))
              R, visits = jax.lax.cond(
                  n_act <= 4 * w_tail, tail_narrow, tail_wide
              )
      else:
          if guard_tail:
              # main_sched never materialised a working set (sub is None);
              # run the tail stage through the generic path at full width.
              width = min(schedule[-1][1], n)
              ranks0 = fast_ranks(master["active"])
              sel = fast_nonzero(master["active"], width, n, ranks=ranks0)
              chain.append(
                  (master["active"], ranks0, width, _i32(R_master))
              )
              safe = jnp.minimum(sel, n - 1)
              sub = make_sub(
                  (M0[safe], M1[safe], M2[safe]), (sel < n),
                  master["visits"], jnp.int32(0),
              )
              sub = jax.lax.while_loop(tail_cond, body_t, sub)
          R, visits = compose(sub, chain)

      # Backstop: any ray still flagged live (stage overflow or cap) replays
      # from its initial state, a bounded number per pass.
      def pass_body(carry):
          R, visits = carry
          act = r_active(R)
          sel = fast_nonzero(act, backstop_size, n)
          safe = jnp.minimum(sel, n - 1)
          b = make_sub(
              (M0[safe], M1[safe], M2[safe]), act[safe] & (sel < n),
              visits, jnp.int32(0),
          )

          def cond(s2):
              return jnp.any(s2["active"]) & (s2["it"] < cap)

          b = jax.lax.while_loop(cond, body_t, b)
          tgt = jnp.where(sel < n, sel, n)
          return scatter_R(R, b, tgt), b["visits"]

      R, visits = jax.lax.while_loop(
          lambda c: jnp.any(r_active(c[0])), pass_body, (R, visits)
      )
      return R, visits

    if adaptive_schedules is not None:
        # Post-beam survivor count picks the stage-width pyramid at
        # runtime (lax.switch; one branch executes). A static width0
        # sized for ~25% survivors collapses on dense frames: overflowed
        # rays replay serially in the backstop (deep-scene bench:
        # 3.6 s -> ~1.1 s with the wide branch, measured on v5e).
        s_cnt = jnp.sum(master["active"].astype(jnp.int32))
        idx = jnp.int32(0)
        for thresh in (n // 8, n // 4, n // 2):
            idx = idx + (s_cnt > thresh).astype(jnp.int32)
        R, visits = jax.lax.switch(
            idx,
            [functools.partial(run_schedule, s)
             for s in adaptive_schedules],
        )
    else:
        R, visits = run_schedule(schedule)

    # Unpack the single result mat. In beam mode it first permutes back from
    # block-major to the caller's pixel order — in the INT domain: a f32
    # relayout on TPU canonicalizes NaN bit patterns and flushes denormals
    # (bool 1 == 1e-45f), silently destroying the bitcast integer lanes
    # (observed on v5e); integer relayouts move bits verbatim, and the f32
    # position lanes are ordinary values that survive the bitcast round trip.
    Ri_bm = R if slim_result else _i32(R)
    Ri = Ri_bm
    if beam_perm is not None and not beam_raw:
        Ri = _block_to_pixel(Ri_bm, *beam_perm)
    meta2 = Ri if slim_result else Ri[:, 0]
    e = (meta2 >> 23) & 31
    zero3 = jnp.zeros((meta2.shape[0], 3), jnp.float32)
    result = TraceResult(
        hit=(meta2 & (1 << 21)) != 0,
        forced=(meta2 & (1 << 22)) != 0,
        index=(jnp.full(meta2.shape[0], -1, jnp.int32) if slim_result
               else Ri[:, 1]),
        hit_pos=(zero3 if slim_result
                 else jax.lax.bitcast_convert_type(Ri[:, 2:5], jnp.float32)),
        normal=jnp.stack(
            [
                (e % 3 - 1).astype(jnp.float32),
                (e // 3 % 3 - 1).astype(jnp.float32),
                (e // 9 - 1).astype(jnp.float32),
            ],
            axis=-1,
        ),
        steps=meta2 & 1023,
        depth=(meta2 >> 10) & 1023,
        word=(jnp.zeros(meta2.shape[0], jnp.uint32) if slim_result
              else jax.lax.bitcast_convert_type(Ri[:, 5], jnp.uint32)),
    )
    if bricks is not None:
        result = _refetch_words(words, result)
    if beam_aux:
        # Third output: the packed result mat BEFORE the block->pixel
        # un-permute — an existing intermediate, so returning it is free.
        # Lets a follow-up pass (the shadow trace) derive its block-major
        # inputs without re-permuting: lanes are [meta2, index, pos xyz
        # (bitcast f32), word, 0, 0] in _pixel_to_block ray order.
        return result, (visits if with_visits else None), Ri_bm
    return result, (visits if with_visits else None)


def _shadow_seed(sh_orig, ppos, leaf_idx, d_leaf, p_hit, p_forced, strict,
                 fallback=None):
    """Per-ray descent seeds for the shadow pass: start each shadow ray at
    its primary hit leaf's PARENT node instead of the root.

    The primary result records a point strictly inside the hit leaf
    (``ppos``), the leaf's pool slot and depth; the parent cell's center is
    reconstructed by dyadic quantization (exact in f32: centers are
    (2k+1)/2^pd with pd <= ~30, and the traversal's own incrementally-built
    centers are the same exact dyadics). A seed is taken only when BOTH
    ``ppos`` and the shadow origin lie strictly in the reconstructed cell
    under the active descent-boundary semantics — then the cell provably is
    the traversal's parent cell and descending from it yields bit-identical
    results to a root descent (same ancestor-start argument as
    ``beam_start``). All other rays (nudged across a parent boundary,
    forced-cap hits, misses) fall back to a root start. Reference semantics:
    the shadow traversal itself, src/shader.wgsl:275-280 — this only moves
    WHERE the descent starts, never what it finds."""
    pd = jnp.maximum(d_leaf - 1, 0)
    half = jnp.exp2(-pd.astype(jnp.float32))[:, None]
    cell = 2.0 * half
    c = (jnp.floor((ppos + 1.0) / cell) + 0.5) * cell - 1.0
    if strict:
        def inc(p):
            return jnp.all((p > c - half) & (p <= c + half), axis=-1)
    else:
        def inc(p):
            return jnp.all((p >= c - half) & (p < c + half), axis=-1)
    ok = (
        p_hit & ~p_forced & (d_leaf >= 1) & (leaf_idx >= 0)
        & inc(ppos) & inc(sh_orig) & _in_bounds(sh_orig)
    )
    if fallback is None:
        f_i, f_p, f_d = jnp.int32(0), jnp.float32(0.0), jnp.int32(0)
    else:
        # E.g. the warp-table start the unseeded init would have used.
        f_i, f_p, f_d = fallback
    return (
        jnp.where(ok, leaf_idx & ~jnp.int32(7), f_i),
        jnp.where(ok[:, None], c, f_p),
        jnp.where(ok, pd, f_d),
    )


def warp_table_levels(warp_table) -> int:
    """Levels of a ``build_warp_table`` (8^levels cells) or combined
    ``skip.build_warp_skip_table`` (2 * 8^levels words) table, recovered
    from its length — so the level never has to travel separately from the
    table (a mismatched ``warp_levels`` would silently misindex)."""
    n = int(warp_table.shape[0])
    lv = max((n.bit_length() - 1) // 3, 0)
    if (1 << (3 * lv)) == n or (1 << (3 * lv + 1)) == n:
        return lv
    raise ValueError(f"not a warp-table length (8^levels or 2*8^levels): {n}")


def warp_table_combined(warp_table) -> bool:
    """True when the table interleaves (warp, skip) words per cell
    (``skip.build_warp_skip_table``): length 2 * 8^levels."""
    return int(warp_table.shape[0]) == 2 * (
        1 << (3 * warp_table_levels(warp_table))
    )


def build_warp_table(words: jax.Array, levels: int = 6) -> jax.Array:
    """Dense position->descent-state table: for every cell of the 2^levels
    grid, the resume state (group index, depth) of a root descent through that
    cell, packed as ``(node_index << 5) | depth`` in uint32.

    A descent stops early where the tree has a leaf above ``levels``; the
    stored state then points at the leaf's parent group so a resuming ray
    re-finds the leaf in one iteration. Cell centres are strictly inside their
    cells, so their descent paths equal the cells' spatial paths.

    Rebuild after structural pool changes (a few ms — one vectorized
    ``levels``-deep descent over 2^(3*levels) cells).
    """
    side = 1 << levels
    n = side ** 3
    cx = jax.lax.broadcasted_iota(jnp.int32, (side, side, side), 0)
    cy = jax.lax.broadcasted_iota(jnp.int32, (side, side, side), 1)
    cz = jax.lax.broadcasted_iota(jnp.int32, (side, side, side), 2)
    centre = (
        jnp.stack([cx, cy, cz], axis=-1).reshape(n, 3).astype(jnp.float32)
        + 0.5
    ) * (2.0 / side) - 1.0

    if words.shape[0] % 8:
        words = jnp.pad(words, (0, (-words.shape[0]) % 8))
    words2d = words.reshape(-1, 8)

    def body(carry, _):
        node_index, node_pos, depth = carry
        p = (centre > node_pos).astype(jnp.float32)
        child = (p[:, 0] * 4 + p[:, 1] * 2 + p[:, 2]).astype(jnp.int32)
        rows = words2d[node_index // 8]
        word = _row_select(rows, child)
        payload = word >> jnp.uint32(4)
        interior = payload < jnp.uint32(VOXEL_OFFSET)
        step_ok = interior & (depth < levels)
        node_pos2 = node_pos + (p * 2.0 - 1.0) / jnp.exp2(
            (depth + 1).astype(jnp.float32)
        )[:, None]
        return (
            jnp.where(step_ok, payload.astype(jnp.int32), node_index),
            jnp.where(step_ok[:, None], node_pos2, node_pos),
            jnp.where(step_ok, depth + 1, depth),
        ), None

    carry0 = (
        jnp.zeros(n, dtype=jnp.int32),
        jnp.zeros((n, 3), dtype=jnp.float32),
        jnp.zeros(n, dtype=jnp.int32),
    )
    (w_index, _, w_depth), _ = jax.lax.scan(body, carry0, None, length=levels)
    return (
        (w_index.astype(jnp.uint32) << jnp.uint32(5))
        | w_depth.astype(jnp.uint32)
    )


def _warp_lookup(warp_table: jax.Array, levels: int, p: jax.Array,
                 strict: bool = True, pack: bool = False,
                 combined: bool = False):
    """((node_index, node_pos, depth), valid[, skip_word]) resume state for
    positions ``p`` (f32[N,3]). ``valid`` embeds the exact containment test
    matching the descent semantics ((lo, hi] for the strict ``>`` descent,
    [lo, hi) for ``>=``), so a boundary-exact position safely falls back to a
    root restart. The table itself is descent-agnostic: it is built from cell
    centres, which are strictly interior at every level, so both comparisons
    walk the same path.

    ``combined`` (``skip.build_warp_skip_table``): the table interleaves
    (warp, skip) words per cell; the pair shares ONE row fetch (indices 2c
    and 2c+1 always land in the same 8- or 72-wide row) and the cell's skip
    word is returned as a third element — free-space skip costs no extra
    gathers over plain warp mode."""
    side = 1 << levels
    cells = jnp.clip(
        jnp.floor((p + 1.0) * (side / 2.0)).astype(jnp.int32), 0, side - 1
    )
    flat = (cells[:, 0] * side + cells[:, 1]) * side + cells[:, 2]
    lane = flat * 2 if combined else flat
    sk_word = None
    if pack:
        # 72-cells-per-row view + one-hot select: same row-count trick as
        # pack9 (the win here is mostly the {1,0}->{0,1} layout copy the
        # (rows,8) gather's output forces — probes/warp_pack_probe.py:
        # 22.2 -> 17.3 ns per pool+warp fetch pair at stage width).
        pad_c = (-warp_table.shape[0]) % 72
        t72 = jnp.concatenate(
            [warp_table, jnp.zeros(pad_c, warp_table.dtype)]
        ).reshape(-1, 72)
        wr = t72[lane // 72]
        iota = jax.lax.broadcasted_iota(jnp.int32, wr.shape, 1)
        woh = iota == (lane % 72)[:, None]
        packed = jnp.sum(
            jnp.where(woh, wr, jnp.uint32(0)), axis=1, dtype=jnp.uint32
        )
        if combined:
            soh = iota == ((lane % 72) + 1)[:, None]
            sk_word = jnp.sum(
                jnp.where(soh, wr, jnp.uint32(0)), axis=1, dtype=jnp.uint32
            )
    else:
        table2d = warp_table.reshape(-1, 8)
        rows = table2d[lane // 8]
        packed = _row_select(rows, lane & 7)
        if combined:
            sk_word = _row_select(rows, (lane & 7) + 1)
    w_index = (packed >> jnp.uint32(5)).astype(jnp.int32)
    w_depth = (packed & jnp.uint32(31)).astype(jnp.int32)

    anc = cells >> jnp.maximum(levels - w_depth, 0)[:, None]
    scale = jnp.exp2(w_depth.astype(jnp.float32))[:, None]
    centre = (anc.astype(jnp.float32) * 2.0 + 1.0) / scale - 1.0
    half = 1.0 / scale
    if strict:
        in_cell = jnp.all((p > centre - half) & (p <= centre + half), axis=-1)
    else:
        in_cell = jnp.all((p >= centre - half) & (p < centre + half), axis=-1)
    valid = in_cell & (w_depth > 0)
    state = (
        jnp.where(valid, w_index, 0),
        jnp.where(valid[:, None], centre, 0.0),
        jnp.where(valid, w_depth, 0),
    )
    if combined:
        return state, valid, sk_word
    return state, valid


def beam_start(
    words: jax.Array,
    origin: jax.Array,
    dirs: jax.Array,
    block: int = 16,
    max_beam_depth: int = 12,
    strict_descent: bool = True,
):
    """Beam pre-pass: per ``block``x``block`` pixel tile, descend once to the
    deepest node whose cell spatially contains all four corner rays' entry
    positions, and hand every ray in the tile that start state.

    Correctness: a ray may start its descent at ANY ancestor node whose cell
    contains its entry position — ``find_voxel`` is a pure function of
    position. Each ray re-checks containment against the beam cell with the
    exact ``(lo, hi]`` boundary semantics the strict ``>`` descent induces and
    falls back to the root if the test fails, so hits are bit-identical.

    Returns (start, beam_visit_idx): ``start`` = (node_index, node_pos, depth)
    arrays shaped for the flattened rays; ``beam_visit_idx`` (int32[B, D],
    pool-size-padded) holds the interior nodes each beam descended through —
    scatter +1 into the visit counts to preserve the adaptive zero-set
    invariant (an interior node stays visited iff rays enter its subtree).
    """
    h, w = dirs.shape[:2]
    hb, wb = h // block, w // block
    n_pool = words.shape[0]

    d = dirs.astype(jnp.float32)
    d = jnp.where(d == 0.0, _EPS_DIR, d)
    pos0 = jnp.broadcast_to(origin.reshape(1, 1, 3), (h, w, 3))
    inside = _in_bounds(pos0.reshape(-1, 3)).reshape(h, w)
    dist = _ray_box_dist(pos0.reshape(-1, 3), d.reshape(-1, 3)).reshape(h, w)
    entry = jnp.where(
        inside[..., None], pos0, pos0 + d * dist[..., None]
    )  # (h, w, 3)
    entered = inside | (dist != 0.0)

    # Corner samples per block (top-left, top-right, bottom-left, bottom-right
    # of the covered pixel area).
    def corners(a):
        c00 = a[0::block, 0::block][:hb, :wb]
        c01 = a[block - 1::block, 0::block][:hb, :wb]
        c10 = a[0::block, block - 1::block][:hb, :wb]
        c11 = a[block - 1::block, block - 1::block][:hb, :wb]
        return jnp.stack([c00, c01, c10, c11], axis=0)  # (4, hb, wb, ...)

    cpos = corners(entry)        # (4, hb, wb, 3)
    cent = corners(entered)      # (4, hb, wb)
    all_entered = jnp.all(cent, axis=0)

    # Spatially common path depth: walk dyadic centres; stop when the four
    # corners disagree on a child decision.
    nb = hb * wb
    cpos_f = cpos.reshape(4, nb, 3)
    ref = cpos_f[0]

    def spath_body(carry, _):
        centre, depth, agree = carry
        if strict_descent:
            bits = cpos_f > centre[None]
        else:
            bits = cpos_f >= centre[None]
        same = jnp.all(bits == bits[0:1], axis=(0, 2)) & agree
        p = bits[0].astype(jnp.float32)
        centre2 = centre + (p * 2.0 - 1.0) / jnp.exp2(
            (depth + 1).astype(jnp.float32)
        )[:, None]
        centre = jnp.where(same[:, None], centre2, centre)
        depth = jnp.where(same, depth + 1, depth)
        return (centre, depth, same), None

    centre0 = jnp.zeros((nb, 3), dtype=jnp.float32)
    (c_unused, sdepth, _), _ = jax.lax.scan(
        spath_body,
        (centre0, jnp.zeros(nb, dtype=jnp.int32), jnp.ones(nb, dtype=bool)),
        None,
        length=max_beam_depth,
    )
    sdepth = jnp.where(all_entered.reshape(-1), sdepth, 0)

    # Tree descent along corner 0's path, capped at sdepth, stopping above
    # leaves; collect interior nodes for the visit scatter.
    def beam_body(carry, _):
        node_index, node_pos, depth, alive = carry
        if strict_descent:
            p = (ref > node_pos).astype(jnp.float32)
        else:
            p = (ref >= node_pos).astype(jnp.float32)
        child = (p[:, 0] * 4 + p[:, 1] * 2 + p[:, 2]).astype(jnp.int32)
        idx = node_index + child
        payload = words[idx] >> jnp.uint32(4)
        interior = payload < jnp.uint32(VOXEL_OFFSET)
        step_ok = alive & (depth < sdepth) & interior
        node_pos2 = node_pos + (p * 2.0 - 1.0) / jnp.exp2(
            (depth + 1).astype(jnp.float32)
        )[:, None]
        visit = jnp.where(step_ok, idx, n_pool)  # n_pool -> dropped
        return (
            jnp.where(step_ok, payload.astype(jnp.int32), node_index),
            jnp.where(step_ok[:, None], node_pos2, node_pos),
            jnp.where(step_ok, depth + 1, depth),
            step_ok,
        ), visit

    carry0 = (
        jnp.zeros(nb, dtype=jnp.int32),
        jnp.zeros((nb, 3), dtype=jnp.float32),
        jnp.zeros(nb, dtype=jnp.int32),
        jnp.ones(nb, dtype=bool),
    )
    (b_index, b_pos, b_depth, _), visit_idx = jax.lax.scan(
        beam_body, carry0, None, length=max_beam_depth
    )
    beam_visit_idx = visit_idx.T  # (nb, max_beam_depth)

    # Broadcast block state to rays and validate per-ray containment.
    def upsample(a):
        a = a.reshape((hb, 1, wb, 1) + a.shape[1:])
        a = jnp.broadcast_to(a, (hb, block, wb, block) + a.shape[4:])
        return a.reshape((h * w,) + a.shape[4:])

    r_index = upsample(b_index)
    r_pos = upsample(b_pos)
    r_depth = upsample(b_depth)

    half = 1.0 / jnp.exp2(r_depth.astype(jnp.float32))[:, None]
    entry_f = entry.reshape(-1, 3)
    if strict_descent:
        in_cell = jnp.all(
            (entry_f > r_pos - half) & (entry_f <= r_pos + half), axis=-1
        )
    else:
        in_cell = jnp.all(
            (entry_f >= r_pos - half) & (entry_f < r_pos + half), axis=-1
        )
    ok = in_cell & (r_depth > 0)
    start = (
        jnp.where(ok, r_index, 0),
        jnp.where(ok[:, None], r_pos, 0.0),
        jnp.where(ok, r_depth, 0),
    )
    return start, beam_visit_idx


def shade(
    words: jax.Array,
    result: TraceResult,
    shadow_hit: jax.Array | None,
    show_steps: bool = False,
    sun_dir=DEFAULT_SUN,
    show_hits_visits: jax.Array | None = None,
    gamma: float = 2.2,
):
    """Shading (reference: src/shader.wgsl:251-305): ambient 0.3 + lambertian,
    shadow kill, miss -> 0.2 grey, forced -> red, gamma out. ``gamma`` mirrors
    the reference's misc_bool exponent switch (2.2 normally, 1.0 when set —
    src/shader.wgsl:304).

    ``show_hits_visits``: per-node visit counts for the hit-counter debug view
    (reference: src/shader.wgsl:267-269) — hit pixels show counter/15 grey."""
    if show_steps:
        g = result.steps.astype(jnp.float32) / 64.0
        colour = jnp.stack([g, g, g], axis=-1)
        return jnp.clip(colour, 0.0, 1.0) ** gamma

    if show_hits_visits is not None:
        counter = jnp.minimum(
            show_hits_visits[jnp.maximum(result.index, 0)], 15
        ).astype(jnp.float32)
        g = jnp.where(result.hit, counter / 15.0, 0.0)
        colour = jnp.stack([g, g, g], axis=-1)
        return jnp.clip(colour, 0.0, 1.0) ** gamma

    sun = jnp.asarray(sun_dir, dtype=jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    diffuse = jnp.maximum((result.normal * -sun).sum(axis=-1), 0.0)
    if shadow_hit is not None:
        diffuse = jnp.where(shadow_hit, 0.0, diffuse)

    # The hit leaf's word rides the trace result (recorded at hit time in
    # every tracer path), so shading needs NO pool gather — the full-width
    # element-gather form profiled at ~15 ms/frame at 1080p (PERF.md).
    payload = result.word >> jnp.uint32(4)
    rgb24 = payload - jnp.uint32(VOXEL_OFFSET)
    base = (
        jnp.stack(
            [
                (rgb24 >> jnp.uint32(16)) & jnp.uint32(0xFF),
                (rgb24 >> jnp.uint32(8)) & jnp.uint32(0xFF),
                rgb24 & jnp.uint32(0xFF),
            ],
            axis=-1,
        ).astype(jnp.float32)
        / 255.0
    )
    lit = (0.3 + diffuse)[:, None] * base
    colour = jnp.where(result.hit[:, None], lit, 0.2)
    colour = jnp.where(
        result.forced[:, None], jnp.array([1.0, 0.0, 0.0], jnp.float32), colour
    )
    return jnp.clip(colour, 0.0, 1.0) ** gamma


def encode_u8(img: jax.Array) -> jax.Array:
    """Display encode to the presented 8-bit frame: ``^(1/2.2)`` then u8
    truncation — the device-side encode the viewer ships over the wire
    (app/viewer.py), mirroring the reference's 8-bit swapchain surface
    (src/render.rs:25)."""
    return (jnp.clip(img, 0.0, 1.0) ** (1.0 / 2.2) * 255.0).astype(jnp.uint8)


@functools.partial(
    jax.jit,
    static_argnames=(
        "shadows", "show_steps", "show_hits", "with_visits", "max_steps",
        "tile_size", "parent_restart", "beams", "mode", "misc_bool",
        "beam_iters", "brick_k", "paged", "raw_result", "u8_image",
        "warp_levels", "warp_in_body", "fit_stages", "pre_permuted",
        "shadow_seed", "pack_pool", "visit_flags",
    ),
)
def render_frame(
    words: jax.Array,
    origin: jax.Array,
    dirs: jax.Array,
    sun_dir: jax.Array,
    shadows: bool = True,
    show_steps: bool = False,
    show_hits: bool = False,
    with_visits: bool = False,
    max_steps: int = MAX_STEPS,
    tile_size: int | None = 128 * 1024,
    parent_restart: bool = True,
    beams: int | None = None,
    mode: str = "tiled",
    misc_bool: bool = False,
    beam_iters: int = 16,
    bricks: jax.Array | None = None,
    brick_k: int = 4,
    paged: tuple | None = None,
    paged_old_of_new: jax.Array | None = None,
    raw_result: bool = False,
    u8_image: bool = False,
    warp_table: jax.Array | None = None,
    warp_levels: int | None = None,
    warp_in_body: bool = True,
    fit_stages: bool = True,
    pre_permuted: bool = False,
    shadow_seed: bool | None = None,
    pack_pool: bool | None = None,
    visit_flags: bool = False,
):
    """Full frame on device: primary trace + shadow trace + shade.

    ``visit_flags`` (staged/beam modes): the PRIMARY pass records visits as
    0/1 touched flags (scatter-set, ~28% cheaper in-loop than the exact
    scatter-add — probes/visit_scatter_probe.py) and the exact FILLED-leaf
    counts are reconstructed from the hit indices afterwards (one ray-width
    scatter: a filled-leaf visit always ends its ray — reference counters
    src/shader.wgsl:157-161 — so hits enumerate filled-leaf visits exactly).
    The shadow pass keeps exact adds (its slim result carries no hit index).
    The returned visits then satisfy the adaptive invariants EXACTLY
    (filled-leaf counts equal the exact mode's, interior zero-set identical
    — what the feedback thresholds read, src/compute.wgsl:39-46); interior
    and empty-leaf magnitudes become flags. ``show_hits`` forces exact mode
    (the debug view displays counter magnitudes).

    ``misc_bool`` mirrors the reference's debug toggle
    (src/shader.wgsl:138-150, 304): ``>=`` descent comparisons and gamma 1.0.

    ``mode``: "tiled" (ray tiles with per-tile early exit), "staged"
    (staged-compaction wavefront) or "beam" (staged + block-synchronous beam
    marching: pixel tiles share one node fetch per step while coherent —
    fastest for large frames; bit-identical results).

    ``beams``: in "tiled"/"staged" modes, the block size of the beam-start
    pre-pass (None = off) — rays start their descent at the block's
    precomputed common ancestor. In "beam" mode, the lockstep tile size
    (default 8).

    ``dirs``: f32[H,W,3]; returns (img f32[H,W,3], TraceResult, visits|None).

    ``tile_size`` splits the wavefront into sequentially-processed ray tiles
    (a ``lax.scan``): each tile's while-loop exits as soon as *its* rays are
    done, so cheap tiles (sky) stop early instead of riding along with the
    slowest ray of the whole frame, and per-iteration gather width shrinks to
    the tile. ``None`` traces the whole frame as one wavefront.

    ``bricks``/``brick_k``: brick-map DDA (see ``render.bricks``); ``words``
    must be the decorated pool from ``build_bricks``. Bit-identical results,
    ~several cells marched per fetched row inside detailed regions.

    ``warp_table``: a ``build_warp_table`` table for both trace passes —
    in-body root restarts resume at the table's depth-``warp_levels`` state
    instead of the root (hit/shade/steps bit-identical; containment-
    validated). Under ``with_visits``, warp jumps skip the shallow
    interiors of every re-descent, so the interior ZERO-visit set — what
    the adaptive collapse thresholds read — can differ from a plain trace
    (measured: a warp session collapses nodes a plain one keeps); the
    Session therefore only passes warp on non-visit-counting frames
    (``Settings.warp_pool_words``). Pass it for
    BIG pools only: under fit-based stage advancement it nearly halves the
    deep bench frame (primaries 1115 -> 613 ms, shadow pass 274 -> 212 —
    shorter re-descents retire rays sooner, so fit narrows stages earlier
    and the two compound; probes/deep7/8), but it LOSES on every
    sub-threshold pool (monu10 125 -> 135; sweep7). Precompute per pool
    snapshot (a few ms); rebuild after patches.

    A COMBINED warp+skip table (``skip.build_warp_skip_table``, recognized
    by its 2*8^levels length) additionally enables free-space skipping:
    boundary steps cross the whole stored octant-directed empty cube in one
    iteration instead of one cell (the reference steps cell-by-cell,
    src/shader.wgsl:227-235). hit/index/pos/normal/depth stay exact (only
    provably-empty space is skipped; knife-edge rays within the documented
    <0.5%% budget); ``steps`` counts one per skip — a LOWER bound on the
    reference's cell count — so show_steps heatmaps show actual work and
    the 100-step forced-cap can only fire on fewer rays. Unlike plain warp,
    the combined table WINS on small pools too (the skip word rides the
    warp row fetch; probes/skip_frame_probe.py).

    ``u8_image``: return the display-encoded u8 frame instead of linear-ish
    f32 — ``(clip(img,0,1) ** (1/2.2) * 255).astype(uint8)``, bit-identical
    to the viewer's device-side encode. The reference presents to an 8-bit
    swapchain surface (src/render.rs:25 ``get_preferred_format``), so the u8
    frame IS the frame; under ``raw_result`` the block->pixel image permute
    then moves 3 u8 lanes instead of 3 f32 (4x fewer bytes).

    ``raw_result`` (beam mode only): skip the packed-result block->pixel
    un-permute (~10 ms of an 8-lane s32[n,8] relayout at 1080p, profiled) —
    shading runs in block-major ray order (``shade`` is elementwise, so the
    image is bit-identical) and only the 3-lane f32 image permutes back to
    pixel order. The returned ``TraceResult``'s per-ray fields are then in
    block-major (``_pixel_to_block``) order; order-independent consumers
    (hit counts, visit feedback — pool-indexed) read them directly, or apply
    ``_block_to_pixel`` per field. The reference frame produces only the
    image (src/shader.wgsl:251-305); the pixel-order result is bookkeeping.
    """
    h, w = dirs.shape[:2]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    strict = not misc_bool
    if warp_table is not None and mode not in ("staged", "beam"):
        raise ValueError("warp_table requires mode='staged' or 'beam'")
    if warp_table is not None and warp_levels is None:
        warp_levels = warp_table_levels(warp_table)
    if pre_permuted:
        # Rays were generated directly in block-major order
        # (generate_rays_device block_major=beams): the entry [n,3] f32
        # relayout disappears — the permutation fused into the direction
        # arithmetic. Only valid for the single-stage row-major tile
        # layout (a beam cascade lays tiles out in Morton order).
        if mode != "beam":
            raise ValueError("pre_permuted requires mode='beam'")
        if not isinstance(beam_iters, int) and len(beam_iters) > 1:
            raise ValueError("pre_permuted excludes morton beam cascades")
    if paged is not None:
        # Subtree paging (render/paging.py): ``words`` must be the
        # relayouted PagedPool.words and ``paged`` its (top_rows,
        # page_rows, n_pages) geometry. Visit counts live in relayouted
        # slots; streaming sessions use small pools, so paging simply
        # excludes the counter path rather than paying a pool-sized
        # un-permute every frame.
        if mode not in ("staged", "beam"):
            raise ValueError("paged requires mode='staged' or 'beam'")
        if with_visits or show_hits:
            raise ValueError("paged excludes with_visits/show_hits")
    if shadow_seed and with_visits:
        raise ValueError(
            "shadow_seed excludes with_visits: seeded shadow rays skip "
            "their initial-descent interior visits, shifting the interior "
            "zero-visit set the collapse thresholds read (same rule as "
            "warp under with_visits)"
        )
    # Measured OFF by default (PERF.md round-3 shadow-seed probe,
    # probes/shadow_seed_probe.py): parent-cell seeds reach only ~6% of
    # monu10's shadow rays (axis-aligned voxel-art walls coincide with
    # parent-cell boundaries, so the nudged origin usually crosses OUT of
    # the hit parent) and the seeded pass measured 211.7 vs 197.3 ms; with
    # the warp fallback on deep10 it is exactly neutral (548.2 vs 548.5).
    # Kept as a tested exact opt-in (per-ray seeded wavefronts).
    seed_shadows = (
        bool(shadow_seed)
        and mode in ("staged", "beam")
        and bricks is None
        and paged is None
    )
    gamma = 2.2 - 1.2 * misc_bool
    sun = jnp.asarray(sun_dir, dtype=jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    if show_hits:
        # Counter debug view bypasses lighting/shadows and needs the full
        # frame's visit counts (reference: src/shader.wgsl:215-224, 267-269).
        shadows = False
        with_visits = True
        visit_flags = False  # the view displays counter magnitudes
    if visit_flags and mode not in ("staged", "beam"):
        raise ValueError("visit_flags requires mode='staged' or 'beam'")

    start = None
    beam_visit_idx = None
    if mode != "beam" and beams and h % beams == 0 and w % beams == 0:
        start, beam_visit_idx = beam_start(
            words, origin, dirs, block=beams, strict_descent=strict
        )

    if mode in ("staged", "beam"):
        beam_kw = {}
        if mode == "beam":
            bb = beams or 8
            if h % bb or w % bb:
                raise ValueError(f"beam block {bb} must divide {h}x{w}")
            beam_kw = dict(beam_shape=(h, w, bb), beam_iters=beam_iters)
        origins = jnp.broadcast_to(origin.reshape(1, 3), (n, 3))
        raw = raw_result and bool(beam_kw)
        out = trace_staged(
            words, origins, flat,
            max_steps=max_steps, with_visits=with_visits,
            parent_restart=parent_restart, start=start,
            strict_descent=strict, bricks=bricks, brick_k=brick_k,
            paged=paged, beam_aux=bool(beam_kw), beam_raw=raw,
            warp_table=warp_table, warp_levels=warp_levels,
            warp_in_body=warp_in_body, fit_stages=fit_stages,
            beam_pre_permuted=pre_permuted, pack_pool=pack_pool,
            visit_flags=visit_flags, **beam_kw,
        )
        result, visits = out[0], out[1]
        if with_visits and visit_flags:
            # Exact filled-leaf overlay: hits enumerate filled-leaf visits
            # (see the docstring). Forced 100-step-cap "hits" never reached
            # a filled leaf and are excluded. Works on the block-major raw
            # result too — scatters are order-independent.
            hm = result.hit & ~result.forced & (result.index >= 0)
            counts = jnp.zeros_like(visits).at[
                jnp.where(hm, result.index, jnp.int32(1 << 30))
            ].add(jnp.int32(1), mode="drop")
            visits = jnp.where(counts > 0, counts, visits)
        shadow_hit = None
        if shadows and not show_steps:
            if beam_kw:
                # Shadow inputs come straight from the primary trace's
                # block-major packed mat (the free aux output), so the shadow
                # pass needs no input permutes, and — since only its hit mask
                # is consumed — skips the ~10 ms packed-result un-permute too
                # (beam_raw); just the bool mask is reordered.
                Rbm = out[2]
                meta2 = Rbm[:, 0]
                p_hit = (meta2 & (1 << 21)) != 0
                e = (meta2 >> 23) & 31
                nrm = jnp.stack(
                    [
                        (e % 3 - 1).astype(jnp.float32),
                        (e // 3 % 3 - 1).astype(jnp.float32),
                        (e // 9 - 1).astype(jnp.float32),
                    ],
                    axis=-1,
                )
                ppos = jax.lax.bitcast_convert_type(Rbm[:, 2:5], jnp.float32)
            else:
                p_hit = result.hit
                nrm = result.normal
                ppos = result.hit_pos
            sh_orig = ppos + nrm * _EPS_SHADOW
            sh_dirs = jnp.broadcast_to(-sun, (n, 3))
            sh_active = p_hit
            if not with_visits:
                # Backface cull: a pixel whose lambertian term is already 0
                # shades identically whether or not its shadow ray hits
                # (``shade`` floors diffuse at 0 before the shadow kill), so
                # skip the trace. Only when counters are off: the reference
                # bumps hit counters for every shadow ray
                # (src/shader.wgsl:275-280).
                sh_active = sh_active & ((nrm * -sun).sum(-1) > 0)
            sd_start = None
            if seed_shadows:
                # Seed each shadow ray at its primary hit's parent cell
                # (bit-identical; see _shadow_seed). Seeds exclude the
                # lockstep beam stage (beam_shape excludes start) — the
                # sparse-skip usually zeroed it at shadow occupancies
                # anyway — and take the seeded compact-first pyramids.
                if beam_kw:
                    d_leaf = (meta2 >> 10) & 1023
                    p_forced = (meta2 & (1 << 22)) != 0
                    leaf_idx = Rbm[:, 1]
                else:
                    d_leaf = result.depth
                    p_forced = result.forced
                    leaf_idx = result.index
                fb = None
                if warp_table is not None:
                    # Rays without a valid parent seed fall back to the warp
                    # start the unseeded init would have used (_init_state).
                    fb = _warp_lookup(
                        warp_table, warp_levels, sh_orig, strict=strict,
                        combined=warp_table_combined(warp_table),
                    )[0]
                sd_start = _shadow_seed(
                    sh_orig, ppos, leaf_idx, d_leaf, p_hit, p_forced, strict,
                    fallback=fb,
                )
            sh_kw = (
                {}
                if sd_start is not None
                else dict(
                    beam_raw=bool(beam_kw),
                    beam_pre_permuted=bool(beam_kw),
                    beam_sparse_skip=(n // 4) if beam_kw else None,
                    **beam_kw,
                )
            )
            sh_res, sh_visits = trace_staged(
                words, sh_orig, sh_dirs,
                active_init=sh_active,
                max_steps=max_steps, with_visits=with_visits,
                parent_restart=parent_restart,
                strict_descent=strict, bricks=bricks, brick_k=brick_k,
                paged=paged, slim_result=bricks is None,
                start=sd_start,
                fit_stages=fit_stages, pack_pool=pack_pool,
                warp_table=warp_table, warp_levels=warp_levels,
                warp_in_body=warp_in_body,
                **sh_kw,
            )
            shadow_hit = sh_res.hit
            if beam_kw and not raw:
                # Must mirror trace_staged's beam_perm morton derivation: a
                # multi-stage beam cascade lays tiles out in Morton order.
                morton = (
                    not isinstance(beam_iters, int) and len(beam_iters) > 1
                )
                shadow_hit = _block_to_pixel(
                    shadow_hit, h, w, beams or 8, morton
                )
            if with_visits:
                visits = visits + sh_visits
        if with_visits and beam_visit_idx is not None:
            if visit_flags:
                visits = visits.at[beam_visit_idx.reshape(-1)].set(
                    jnp.int32(1), mode="drop"
                )
            else:
                visits = visits.at[beam_visit_idx.reshape(-1)].add(
                    1, mode="drop"
                )
        if paged is not None and paged_old_of_new is not None:
            # Hit indices back to ORIGINAL pool slots (one width-n element
            # gather; the rest of the result is slot-independent).
            oidx = paged_old_of_new[
                jnp.clip(result.index, 0, paged_old_of_new.shape[0] - 1)
            ]
            result = result._replace(
                index=jnp.where(result.index >= 0, oidx, result.index)
            )
        if show_hits:
            img = shade(
                words, result, None, show_hits_visits=visits, gamma=gamma
            )
        else:
            img = shade(
                words, result, shadow_hit, show_steps=show_steps,
                sun_dir=sun_dir, gamma=gamma,
            )
        if u8_image:
            img = encode_u8(img)
        if raw:
            # Shading ran in block-major ray order; permute the 3-lane f32
            # image back (image values are clipped to [0,1] with no denormal
            # range, so the f32 relayout is bit-safe — cf. the int-domain
            # rule for bitcast result mats). The result stays block-major.
            morton = not isinstance(beam_iters, int) and len(beam_iters) > 1
            img = _block_to_pixel(img, h, w, beams or 8, morton)
        return (
            img.reshape(h, w, 3), result,
            (visits if with_visits else None),
        )

    def do_tile(tile_dirs, tile_valid, tile_start=None):
        m = tile_dirs.shape[0]
        origins = jnp.broadcast_to(origin.reshape(1, 3), (m, 3))
        result, visits = trace(
            words, origins, tile_dirs,
            active_init=tile_valid,
            max_steps=max_steps, with_visits=with_visits,
            parent_restart=parent_restart,
            start=tile_start,
            strict_descent=strict, bricks=bricks, brick_k=brick_k,
        )
        shadow_hit = None
        if shadows and not show_steps:
            sh_orig = result.hit_pos + result.normal * _EPS_SHADOW
            sh_dirs = jnp.broadcast_to(-sun, (m, 3))
            # Shadow rays bump counters too (primary=true in the reference,
            # src/shader.wgsl:276).
            sh_res, sh_visits = trace(
                words, sh_orig, sh_dirs,
                active_init=result.hit,
                max_steps=max_steps, with_visits=with_visits,
                parent_restart=parent_restart,
                strict_descent=strict, bricks=bricks, brick_k=brick_k,
            )
            shadow_hit = sh_res.hit
            if with_visits:
                visits = visits + sh_visits
        img = shade(
            words, result, shadow_hit, show_steps=show_steps, sun_dir=sun_dir,
            gamma=gamma,
        )
        return img, result, visits

    def add_beam_visits(visits):
        if with_visits and beam_visit_idx is not None:
            visits = visits.at[beam_visit_idx.reshape(-1)].add(1, mode="drop")
        return visits

    if tile_size is None or n <= tile_size:
        img, result, visits = do_tile(flat, jnp.ones(n, dtype=bool), start)
        if with_visits:
            visits = add_beam_visits(visits)
        if show_hits:
            img = shade(
                words, result, None, show_hits_visits=visits, gamma=gamma
            )
        if u8_image:
            img = encode_u8(img)
        return img.reshape(h, w, 3), result, visits

    pad = (-n) % tile_size
    flat_p = jnp.concatenate(
        [flat, jnp.zeros((pad, 3), dtype=flat.dtype)], axis=0
    )
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n + pad, 1), 0).squeeze(-1) < n
    )
    tiles = flat_p.reshape(-1, tile_size, 3)
    valid_t = valid.reshape(-1, tile_size)

    if start is not None:
        def padz(a):
            padding = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, padding)

        start_t = tuple(
            padz(a).reshape((-1, tile_size) + a.shape[1:]) for a in start
        )
    else:
        start_t = None

    def scan_body(visits_acc, inp):
        if start_t is not None:
            tile_dirs, tile_valid, s0, s1, s2 = inp
            tile_start = (s0, s1, s2)
        else:
            tile_dirs, tile_valid = inp
            tile_start = None
        img, result, visits = do_tile(tile_dirs, tile_valid, tile_start)
        if with_visits:
            visits_acc = visits_acc + visits
        return visits_acc, (img, result)

    visits0 = jnp.zeros(
        words.shape[0] if with_visits else 1, dtype=jnp.int32
    )
    xs = (tiles, valid_t) if start_t is None else (
        tiles, valid_t, start_t[0], start_t[1], start_t[2]
    )
    visits, (imgs, results) = jax.lax.scan(scan_body, visits0, xs)
    if with_visits:
        visits = add_beam_visits(visits)

    result = TraceResult(*[
        r.reshape((-1,) + r.shape[2:])[:n] for r in results
    ])
    if show_hits:
        img = shade(words, result, None, show_hits_visits=visits, gamma=gamma)
        img = img.reshape(h, w, 3)
    else:
        img = imgs.reshape(-1, 3)[:n].reshape(h, w, 3)
    if u8_image:
        img = encode_u8(img)
    return img, result, (visits if with_visits else None)
