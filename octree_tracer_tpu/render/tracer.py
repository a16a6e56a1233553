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
_EPS_DIR = jnp.float32(1e-6)
_EPS_NUDGE = jnp.float32(2e-6)
_EPS_SHADOW = jnp.float32(2.5e-6)
DEFAULT_SUN = (-1.7, -1.0, 0.8)  # reference: src/render.rs:312


class TraceResult(NamedTuple):
    hit: jax.Array        # bool[N]
    forced: jax.Array     # bool[N] — 100-step-cap forced hits
    index: jax.Array      # int32[N] node slot of the hit leaf (-1 otherwise)
    hit_pos: jax.Array    # f32[N,3]
    normal: jax.Array     # f32[N,3]
    steps: jax.Array      # int32[N]
    depth: jax.Array      # int32[N]


def _in_bounds(v: jax.Array) -> jax.Array:
    """All components in [-1, 1) (reference: src/shader.wgsl:177-180)."""
    return jnp.all((v >= -1.0) & (v < 1.0), axis=-1)


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
        "parent_restart",
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
):
    """Trace ``dirs.shape[0]`` rays through node pool ``words`` (uint32[pool]).

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
    restart depth), so ``with_visits`` forces ``parent_restart=False`` only
    when exact reference counter magnitudes are requested via
    ``exact_visit_counts`` in the frame API.
    """
    n = dirs.shape[0]
    words = words.astype(jnp.uint32)
    pos0 = origins.astype(jnp.float32)
    d = dirs.astype(jnp.float32)
    d = jnp.where(d == 0.0, _EPS_DIR, d)

    inside = _in_bounds(pos0)
    dist = _ray_box_dist(pos0, d)
    entered = inside | (dist != 0.0)
    pos = jnp.where(inside[:, None], pos0, pos0 + d * dist[:, None])
    r_sign = jnp.sign(d)

    active = entered
    if active_init is not None:
        active = active & active_init

    voxel_offset = jnp.uint32(VOXEL_OFFSET)
    if max_iters is None:
        max_iters = (max_steps + 2) * 26

    state = dict(
        it=jnp.int32(0),
        active=active,
        hit=jnp.zeros(n, dtype=bool),
        forced=jnp.zeros(n, dtype=bool),
        index=jnp.full(n, -1, dtype=jnp.int32),
        out_pos=jnp.zeros((n, 3), dtype=jnp.float32),
        out_normal=jnp.zeros((n, 3), dtype=jnp.float32),
        out_steps=jnp.zeros(n, dtype=jnp.int32),
        out_depth=jnp.zeros(n, dtype=jnp.int32),
        voxel_pos=pos,
        normal=jnp.trunc(pos * 1.000001),
        steps=jnp.zeros(n, dtype=jnp.int32),
        node_index=jnp.zeros(n, dtype=jnp.int32),
        node_pos=jnp.zeros((n, 3), dtype=jnp.float32),
        depth=jnp.zeros(n, dtype=jnp.int32),
        visits=jnp.zeros(words.shape[0] if with_visits else 1, dtype=jnp.int32),
    )

    def cond(s):
        return jnp.any(s["active"]) & (s["it"] < max_iters)

    def body(s):
        a = s["active"]
        depth1 = s["depth"] + 1
        if strict_descent:
            p = (s["voxel_pos"] > s["node_pos"]).astype(jnp.float32)
        else:
            p = (s["voxel_pos"] >= s["node_pos"]).astype(jnp.float32)
        child = (p[:, 0] * 4 + p[:, 1] * 2 + p[:, 2]).astype(jnp.int32)
        node_pos1 = s["node_pos"] + (p * 2.0 - 1.0) / jnp.exp2(
            depth1.astype(jnp.float32)
        )[:, None]
        idx = s["node_index"] + child

        word = words[idx]
        payload = word >> jnp.uint32(4)
        leaf = payload >= voxel_offset
        filled = payload > voxel_offset

        hit_now = a & leaf & filled
        interior = a & ~leaf
        stepping = a & leaf & ~filled

        visits = s["visits"]
        if with_visits:
            visits = visits.at[idx].add(a.astype(jnp.int32), mode="drop")

        # Boundary step quantities (computed for all lanes, used by `stepping`).
        voxel_size = 2.0 / jnp.exp2(depth1.astype(jnp.float32))
        t_max = (
            node_pos1 - pos + r_sign * (voxel_size[:, None] * 0.5)
        ) / d
        roll1 = t_max[:, (1, 2, 0)]
        roll2 = t_max[:, (2, 0, 1)]
        face = (t_max <= jnp.minimum(roll1, roll2)).astype(jnp.float32)
        new_normal = face * -r_sign
        t_current = t_max.min(axis=-1)
        new_vp = pos + d * t_current[:, None] - new_normal * _EPS_NUDGE

        oob = stepping & ~_in_bounds(new_vp)
        steps_new = s["steps"] + 1
        over = stepping & ~oob & (steps_new > max_steps)
        go = stepping & ~oob & ~over

        if parent_restart:
            # The leaf's parent cell is centred on the pre-update node_pos with
            # half-size 2/2^depth1; its boundary semantics under the strict
            # ``>`` descent are (lo, hi] per axis. If the stepped position is
            # provably inside, the next descent starts from the parent (the
            # current group) instead of the root. Failure falls back to a root
            # restart, so results are identical either way.
            par_pos = s["node_pos"]
            in_parent = jnp.all(
                (new_vp > par_pos - voxel_size[:, None])
                & (new_vp <= par_pos + voxel_size[:, None]),
                axis=-1,
            )
            go_parent = go & in_parent
        else:
            go_parent = jnp.zeros_like(go)
        go_root = go & ~go_parent

        done_now = hit_now | oob | over
        # Out-of-bounds misses report zero pos/normal (reference:
        # src/shader.wgsl:238 returns vec3(0) for both).
        record_pos = jnp.where(
            hit_now[:, None], s["voxel_pos"], jnp.where(over[:, None], new_vp, 0.0)
        )
        record_normal = jnp.where(
            hit_now[:, None], s["normal"], jnp.where(over[:, None], new_normal, 0.0)
        )
        record_steps = jnp.where(over, steps_new, s["steps"])
        record_depth = jnp.where(over, max_steps, depth1)

        return dict(
            it=s["it"] + 1,
            active=a & ~done_now,
            hit=s["hit"] | hit_now | over,
            forced=s["forced"] | over,
            index=jnp.where(hit_now, idx, s["index"]),
            out_pos=jnp.where(done_now[:, None], record_pos, s["out_pos"]),
            out_normal=jnp.where(
                done_now[:, None], record_normal, s["out_normal"]
            ),
            out_steps=jnp.where(done_now, record_steps, s["out_steps"]),
            out_depth=jnp.where(done_now, record_depth, s["out_depth"]),
            voxel_pos=jnp.where(go[:, None], new_vp, s["voxel_pos"]),
            normal=jnp.where(go[:, None], new_normal, s["normal"]),
            steps=jnp.where(go, steps_new, s["steps"]),
            node_index=jnp.where(
                interior,
                payload.astype(jnp.int32),
                jnp.where(go_root, 0, s["node_index"]),
            ),
            node_pos=jnp.where(
                go_root[:, None],
                0.0,
                jnp.where(
                    go_parent[:, None],
                    s["node_pos"],
                    jnp.where(
                        (interior | stepping)[:, None], node_pos1, s["node_pos"]
                    ),
                ),
            ),
            depth=jnp.where(
                go_root,
                0,
                jnp.where(go_parent, depth1 - 1, jnp.where(a, depth1, s["depth"])),
            ),
            visits=visits,
        )

    s = jax.lax.while_loop(cond, body, state)
    result = TraceResult(
        hit=s["hit"],
        forced=s["forced"],
        index=s["index"],
        hit_pos=s["out_pos"],
        normal=s["out_normal"],
        steps=s["out_steps"],
        depth=s["out_depth"],
    )
    return result, (s["visits"] if with_visits else None)


def shade(
    words: jax.Array,
    result: TraceResult,
    shadow_hit: jax.Array | None,
    show_steps: bool = False,
    sun_dir=DEFAULT_SUN,
):
    """Shading (reference: src/shader.wgsl:251-305): ambient 0.3 + lambertian,
    shadow kill, miss -> 0.2 grey, forced -> red, gamma 2.2."""
    if show_steps:
        g = result.steps.astype(jnp.float32) / 64.0
        colour = jnp.stack([g, g, g], axis=-1)
        return jnp.clip(colour, 0.0, 1.0) ** 2.2

    sun = jnp.asarray(sun_dir, dtype=jnp.float32)
    sun = sun / jnp.linalg.norm(sun)
    diffuse = jnp.maximum((result.normal * -sun).sum(axis=-1), 0.0)
    if shadow_hit is not None:
        diffuse = jnp.where(shadow_hit, 0.0, diffuse)

    payload = words[jnp.maximum(result.index, 0)] >> jnp.uint32(4)
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
    return jnp.clip(colour, 0.0, 1.0) ** 2.2


@functools.partial(
    jax.jit,
    static_argnames=(
        "shadows", "show_steps", "with_visits", "max_steps", "tile_size",
        "parent_restart",
    ),
)
def render_frame(
    words: jax.Array,
    origin: jax.Array,
    dirs: jax.Array,
    sun_dir: jax.Array,
    shadows: bool = True,
    show_steps: bool = False,
    with_visits: bool = False,
    max_steps: int = MAX_STEPS,
    tile_size: int | None = 128 * 1024,
    parent_restart: bool = True,
):
    """Full frame on device: primary trace + shadow trace + shade.

    ``dirs``: f32[H,W,3]; returns (img f32[H,W,3], TraceResult, visits|None).

    ``tile_size`` splits the wavefront into sequentially-processed ray tiles
    (a ``lax.scan``): each tile's while-loop exits as soon as *its* rays are
    done, so cheap tiles (sky) stop early instead of riding along with the
    slowest ray of the whole frame, and per-iteration gather width shrinks to
    the tile. ``None`` traces the whole frame as one wavefront.
    """
    h, w = dirs.shape[:2]
    flat = dirs.reshape(-1, 3)
    n = flat.shape[0]
    sun = jnp.asarray(sun_dir, dtype=jnp.float32)
    sun = sun / jnp.linalg.norm(sun)

    def do_tile(tile_dirs, tile_valid):
        m = tile_dirs.shape[0]
        origins = jnp.broadcast_to(origin.reshape(1, 3), (m, 3))
        result, visits = trace(
            words, origins, tile_dirs,
            active_init=tile_valid,
            max_steps=max_steps, with_visits=with_visits,
            parent_restart=parent_restart,
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
            )
            shadow_hit = sh_res.hit
            if with_visits:
                visits = visits + sh_visits
        img = shade(
            words, result, shadow_hit, show_steps=show_steps, sun_dir=sun_dir
        )
        return img, result, visits

    if tile_size is None or n <= tile_size:
        img, result, visits = do_tile(flat, jnp.ones(n, dtype=bool))
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

    def scan_body(visits_acc, inp):
        tile_dirs, tile_valid = inp
        img, result, visits = do_tile(tile_dirs, tile_valid)
        if with_visits:
            visits_acc = visits_acc + visits
        return visits_acc, (img, result)

    visits0 = jnp.zeros(
        words.shape[0] if with_visits else 1, dtype=jnp.int32
    )
    visits, (imgs, results) = jax.lax.scan(scan_body, visits0, (tiles, valid_t))

    img = imgs.reshape(-1, 3)[:n].reshape(h, w, 3)
    result = TraceResult(*[
        r.reshape((-1,) + r.shape[2:])[:n] for r in results
    ])
    return img, result, (visits if with_visits else None)
