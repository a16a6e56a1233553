"""Multi-chip scaling: pixel-tile data parallelism over a device mesh.

The reference is single-GPU (SURVEY.md §2 census); the natural TPU scale-out
is sharding the ray wavefront across chips with the node pool replicated —
rendering is embarrassingly parallel, and the only cross-chip traffic in the
frame loop is the visit-count reduction for the adaptive feedback
(``psum`` over ICI) plus the broadcast of pool patches.

Implemented with ``shard_map`` over a 1-D ``rays`` mesh axis so the per-shard
while-loop runs independently per chip (no lockstep with other shards'
stragglers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import tracer


def make_mesh(devices=None, axis: str = "rays") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def render_frame_sharded(
    mesh: Mesh,
    words: jax.Array,
    origin: jax.Array,
    dirs: jax.Array,
    sun_dir: jax.Array,
    shadows: bool = True,
    with_visits: bool = False,
    tile_size: int | None = None,
    max_steps: int = tracer.MAX_STEPS,
    mode: str = "tiled",
    beams: int | None = None,
    show_steps: bool = False,
    show_hits: bool = False,
    misc_bool: bool = False,
    u8_image: bool = False,
    visit_flags: bool = False,
    warp_table: jax.Array | None = None,
):
    """Render with rays sharded over ``mesh`` ('rays' axis) and the node pool
    replicated. Returns (img f32[H,W,3] — u8 display-encoded when
    ``u8_image``, matching the single-chip Session frame — TraceResult,
    visits|None); ``visits`` is psum-reduced across chips so the host sees
    global per-frame counts.

    ``dirs`` is f32[H,W,3]; H must divide evenly by the mesh size (pad
    upstream if needed). ``show_hits`` renders from shard-LOCAL counters (the
    debug view shades inside the per-shard frame, before the psum; the
    returned ``visits`` are still global).
    """
    h, w = dirs.shape[:2]
    n_dev = mesh.devices.size
    if h % n_dev != 0:
        raise ValueError(f"height {h} not divisible by mesh size {n_dev}")

    img, result, visits = _run_sharded(
        mesh, words, origin, dirs, sun_dir,
        shadows=shadows, with_visits=with_visits, tile_size=tile_size,
        max_steps=max_steps, mode=mode, beams=beams, show_steps=show_steps,
        show_hits=show_hits, misc_bool=misc_bool, u8_image=u8_image,
        visit_flags=visit_flags, warp_table=warp_table,
    )
    return img, result, (visits if (with_visits or show_hits) else None)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "shadows", "with_visits", "tile_size", "max_steps", "mode",
        "beams", "show_steps", "show_hits", "misc_bool", "u8_image",
        "visit_flags",
    ),
)
def _run_sharded(mesh, words, origin, dirs, sun_dir, *, shadows, with_visits,
                 tile_size, max_steps, mode, beams, show_steps, show_hits,
                 misc_bool, u8_image=False, visit_flags=False,
                 warp_table=None):
    # Module-level jit (mesh is hashable, so it keys the cache): a bare
    # shard_map dispatches op-by-op — an eager op costs a ~30 ms round trip
    # through the tunnel (measured 8.4 s/frame at 1080p) — and a fresh
    # jax.jit wrapper per call re-traces every frame (~2 s/frame).
    axis = mesh.axis_names[0]

    # The warp table (when present) is replicated like the pool: every
    # shard resumes restarts from the same exact states (hit-exact, so
    # per-shard traces stay bit-identical to the unsharded wavefront).
    warp_spec = (P(),) if warp_table is not None else ()

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P()) + warp_spec,
        out_specs=(
            P(axis),
            jax.tree.map(lambda _: P(axis), tracer.TraceResult(
                *([0] * len(tracer.TraceResult._fields)))),
            P(),
        ),
        check_vma=False,
    )
    def run(words, origin, dirs_shard, sun, *warp):
        img, result, visits = tracer.render_frame(
            words, origin, dirs_shard, sun,
            warp_table=warp[0] if warp else None,
            shadows=shadows,
            with_visits=with_visits,
            tile_size=tile_size,
            max_steps=max_steps,
            mode=mode,
            beams=beams,
            show_steps=show_steps,
            show_hits=show_hits,
            misc_bool=misc_bool,
            u8_image=u8_image,
            # Flags psum to shard counts (zero-set = the union); the exact
            # per-shard filled-leaf overlays psum to the exact global counts.
            visit_flags=visit_flags,
        )
        if with_visits or show_hits:
            visits = jax.lax.psum(visits, axis)
        else:
            visits = jnp.zeros(1, dtype=jnp.int32)
        return img, result, visits

    args = (words, origin, dirs, sun_dir)
    if warp_table is not None:
        args = args + (warp_table,)
    return run(*args)


def replicate(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place an array replicated across every device of the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_rows(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Shard an array's leading (row) axis across the mesh."""
    return jax.device_put(
        x, NamedSharding(mesh, P(mesh.axis_names[0]))
    )
