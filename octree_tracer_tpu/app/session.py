"""Interactive rendering session: the per-frame adaptive streaming loop.

This is the TPU-native equivalent of the reference's application orchestrator
(reference: src/app.rs:70-120): render with visit counting on device, select
LOD candidates on device, read back the *compact* candidate lists, run the host
adaptive engine against the world, and push the octree's journaled patches back
to HBM as a delta scatter — replacing the reference's blocking full-pool
re-upload (src/app.rs:113-118) and blocking candidate-buffer maps
(src/adaptive.rs:12-17).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..adaptive import engine, feedback
from ..core.octree import Octree
from ..core.voxel import VOXEL_OFFSET
from ..render import tracer
from ..render.camera import camera_matrices, generate_rays_device
from ..world.world import World

DEFAULT_POOL_CAPACITY = 10_000_000  # nodes (reference: src/render.rs:53)
MAX_PATCH_WORDS = 1_048_576  # larger diffs fall back to a full upload


class Character:
    """Fly camera (reference: src/main.rs:121-137, src/app.rs:73-92)."""

    def __init__(self):
        self.pos = np.array([0.1, 0.2, -1.5], dtype=np.float32)
        self.look = np.array([0.0, 0.0, 1.5], dtype=np.float32)
        self.speed = -5.0

    def move(self, forward=0.0, right=0.0, up=0.0):
        f = self.look / np.linalg.norm(self.look)
        r = np.cross(f, [0.0, 1.0, 0.0])
        r = r / np.linalg.norm(r)
        u = np.cross(r, f)
        step = np.float32(np.exp(self.speed))
        self.pos = self.pos + (f * forward + r * right + u * up) * step

    def turn(self, dx: float, dy: float, sensitivity=0.00005, fov=90.0):
        """Quaternion-free yaw/pitch matching the reference's axis-angle
        composition (src/app.rs:85-92)."""
        f = self.look / np.linalg.norm(self.look)
        r = np.cross(f, [0.0, 1.0, 0.0])
        r = r / np.linalg.norm(r)
        ax, ay = -dx * sensitivity * fov, -dy * sensitivity * fov

        def rot(v, axis, ang):
            axis = axis / np.linalg.norm(axis)
            c, s = np.cos(ang), np.sin(ang)
            return (
                v * c + np.cross(axis, v) * s + axis * np.dot(axis, v) * (1 - c)
            )

        look = rot(self.look, r, ay)
        look = rot(look, np.array([0.0, 1.0, 0.0]), ax)
        self.look = (look / np.linalg.norm(look)).astype(np.float32)


class Settings:
    """Runtime knobs (reference: src/main.rs:115-119, src/render.rs:289-321)."""

    def __init__(self):
        self.octree_depth = 12
        self.fov = 90.0
        self.sensitivity = 0.00005
        self.sun_dir = np.array([-1.7, -1.0, 0.8], dtype=np.float32)
        self.shadows = True
        self.show_steps = False
        self.show_hits = False
        self.pause_adaptive = False
        self.misc_value = 0.0   # decorative, like the reference (render.rs:317)
        self.misc_bool = False  # >= descent + gamma 1.0 (shader.wgsl:138,304)
        self.sub_cap = 65536       # per-frame candidate caps; the reference
        self.unsub_cap = 65536     # uses 1,024,000 (src/adaptive.rs:3-4)
        # Count visits + run the adaptive pass every Nth frame (1 = every
        # frame, the reference's cadence). Visit scatter-adds are ~40% of
        # an adaptive device frame (probes/profile_session.py) — a TPU cost
        # the reference's in-shader atomics don't have — so interactive
        # loops can amortize feedback over N frames; each COUNTED frame
        # keeps the exact reference semantics, LOD just converges N x
        # slower.
        self.feedback_every = 1
        # Counted frames record visits as 0/1 touched FLAGS (scatter-set,
        # ~28% cheaper in-loop than the exact scatter-add) with the exact
        # filled-leaf counts reconstructed from the hit indices — the
        # adaptive decisions are provably identical (filled-leaf counts
        # exact, interior zero-set exact; tracer.render_frame visit_flags).
        # show_hits frames force exact counts (the debug view shows
        # magnitudes).
        self.visit_flags = True
        # Defer feedback consumption by ONE frame: the counted frame only
        # DISPATCHES candidate selection (async); the readback, host engine
        # and patch upload run at the start of the NEXT step, overlapping
        # the candidate-readback RTT with that frame's device compute.
        # Selection runs against the CURRENT pool (post-apply of the pending
        # batch) with the frame's visits, so each batch applies against
        # exactly the pool it selected from: no stale-slot mutations (the
        # round-4 snapshot selection could subdivide slots inside freed
        # groups — ADVICE r4) and no wasted Doubleup batches. Depth cadence
        # at fb1 is 2 steps per tree generation (apply -> render -> select
        # is a 2-stage pipeline; the reference does all three per frame);
        # at feedback_every >= 2 the one-step apply lag hides inside the
        # off-frames — full cadence. Converged state identical everywhere,
        # so this defaults ON (round-4: fb1 370 -> 259 ms pipelined,
        # fb4 172 -> 118).
        self.deferred_feedback = True
        # Auto-build a warp table (dense position -> depth-6 resume state,
        # hit-exact) once the device pool crosses this size and pass it to
        # both trace passes of NON-ADAPTIVE frames (feedback_every
        # off-frames, pause_adaptive): on big pools warp restarts win ~2x
        # under fit advancement (deep10 1115 -> 613 ms, the 100 MB island
        # 7.3 -> 2.7 s — PERF.md), while sub-threshold pools LOSE with it
        # (monu10 125 -> 135 ms), hence the tracer's BIG_POOL_WORDS
        # threshold. Visit-counting frames EXCLUDE warp: the jump skips the
        # shallow interiors of every re-descent, breaking the interior
        # zero-visit set the collapse thresholds read (measured: a warp
        # session collapses nodes a plain one keeps). Maintained
        # incrementally after patches (_invalidate_warp). None disables.
        # Round 4 lowered the threshold from BIG_POOL_WORDS (2^22) to the
        # 1M-word bucket: the converged deep-world fly-through (403K
        # nodes, 4 MB pool, inside camera) measured warp 712 vs plain
        # 867 ms/step median (probes/session_midpool_warp_probe.py) —
        # inside-scene cameras are restart-heavy, and pack9 now
        # auto-couples to the level-7 table. Sub-1M buckets (converged
        # monu10: 64K) stay warp-free.
        self.warp_pool_words = 1 << 20
        # Build the auto-warp table in its COMBINED warp+skip form
        # (render/skip.py): off-frames cross provably-empty space in one
        # boundary step per stored octant cube — the skip word rides the
        # warp row fetch, so it costs no extra gathers. Collapses mark the
        # skip half stale (occupancy grew); it is zeroed immediately (the
        # table stays valid as warp-only) and rebuilt on the next eligible
        # off-frame.
        self.skip_field = True


class Session:
    """Streaming renderer: world + host octree + device pool + camera."""

    def __init__(self, world: World, width=1280, height=720,
                 pool_capacity=DEFAULT_POOL_CAPACITY, settings=None,
                 use_native: bool | None = None):
        from .. import native as native_lib

        self.world = world
        self.settings = settings or Settings()
        self.use_native = (
            native_lib.available() if use_native is None else use_native
        )
        self.character = Character()
        self.width = width
        self.height = height
        self.pool_capacity = pool_capacity

        # Seed the streamed octree from the root chunk's 8 mip colours
        # (reference: src/app.rs:47-48).
        mask = world.chunks[0].get_node_mask(0)
        self.octree = Octree(mask)
        self._warp_table = None
        self._warp_dirty = True
        self._skip_stale = False
        self._warp_invalid = 0
        self._warp_incremental = 0  # observability: incremental edits taken
        self._full_upload()
        self._last_visits = None
        self._pending_feedback = None
        self._last_freed = np.zeros(0, dtype=np.int64)
        self.frame_count = 0
        # Rotating candidate-selection offset: advances past each frame's
        # consumed window so cap overflow can't starve high slots (the
        # reference's atomic compaction has no deterministic order either,
        # src/compute.wgsl:41-44).
        self._sel_offset = 0

    # -- device pool maintenance ---------------------------------------------

    def _device_bucket(self) -> int:
        """Device-pool size covering the live nodes: a COARSE ladder
        (64K/256K/1M/4M/capacity words), not the next power of two — every
        distinct pool shape recompiles the whole frame program, which costs
        ~40-60 s through the remote-compile tunnel (measured), so a session
        must cross at most a couple of rungs over its lifetime."""
        n = max(1, len(self.octree))
        for b in (1 << 16, 1 << 18, 1 << 20, 1 << 22):
            if n <= b <= self.pool_capacity:
                return b
        return self.pool_capacity

    def _full_upload(self):
        # The device pool is sized to the live power-of-two BUCKET, not
        # pool_capacity: a capacity-sized (40 MB) pool costs a measured +50%
        # frame time on v5e (monu10@1080p 173 -> 266 ms — the traversal's
        # row gathers degrade with table size), makes every with_visits
        # frame allocate + scatter a 40 MB counter array, widens the
        # candidate scan, and turns full uploads into multi-second tunnel
        # transfers. Growth re-jits per ladder rung (see _device_bucket).
        n = len(self.octree)
        prefix = np.zeros(self._device_bucket(), dtype=np.uint32)
        prefix[:n] = self.octree.nodes
        self.device_words = jnp.asarray(prefix)
        self._warp_dirty = True
        self.octree.drain_patches()

    def _push_patches(self):
        idx, vals = self.octree.drain_patches()
        if idx.size == 0:
            return 0
        if (
            idx.size > MAX_PATCH_WORDS
            or len(self.octree) > self.device_words.shape[0]
        ):
            # Too many patches, or the pool outgrew its device bucket.
            self._full_upload()
            return idx.size
        pidx, pvals = feedback.pad_patches(idx, vals)
        self.device_words = feedback.apply_patches(
            self.device_words, jnp.asarray(pidx), jnp.asarray(pvals)
        )
        self._invalidate_warp(idx)
        return idx.size

    # -- warp-table maintenance ----------------------------------------------

    def _invalidate_warp(self, idx: np.ndarray) -> None:
        """Incrementally invalidate warp-table cells touched by a patch batch
        instead of rebuilding the whole level-7 table (a 210-228 ms device
        descend on big pools — ~50% of a big-pool frame; the first probe
        run under-read it 3x via block_until_ready, re-measured with a
        scalar-reduce sync (probes/warp_rebuild_probe.py).

        Exactness: a stored resume state can only go stale when its node's
        slot is freed, which happens exclusively beneath a COLLAPSED node —
        and the collapse patches the collapsed node's own slot, whose cell
        spatially contains every freed descendant. Zeroing the table cells
        inside each patched slot's cell therefore covers all stale states
        (zeroed cells read depth 0 => invalid => exact root-restart
        fallback, tracer._warp_lookup). Subdivides and value rewrites never
        invalidate a state (resuming at a node whose word changed descends
        through the NEW word, exactly like a fresh root descent), but are
        invalidated here too — conservative, perf-only."""
        if self._warp_table is None or self._warp_dirty:
            self._warp_dirty = True
            return
        levels = tracer.warp_table_levels(self._warp_table)
        side = 1 << levels
        pos = self.octree.positions[idx]
        # Node depth from the dyadic centre: c = odd * 2^-d exactly in f32,
        # so trailing zeros of c * 2^24 give 24 - d (depths <= 20).
        xi = np.abs(pos[:, 0] * (1 << 24)).astype(np.int64)
        xi = np.maximum(xi, 1)
        tz = np.zeros_like(xi)
        v = xi.copy()
        for shift in (16, 8, 4, 2, 1):
            m = (v & ((1 << shift) - 1)) == 0
            tz[m] += shift
            v[m] >>= shift
        depth = 24 - tz
        # Per-axis expansion: a node at depth d covers 2^(levels-d) table
        # cells per axis (1 when d >= levels). Bounded work: depth-0-class
        # nodes or very large batches fall back to a full rebuild. The
        # bounds are generous on purpose — a 2^19-cell scatter costs ~4 ms
        # against the 210-228 ms rebuild it replaces — and the accumulated-
        # invalid cap below still forces a rebuild before most of the
        # table degrades to root-restart fallbacks.
        k = np.where(depth >= levels, 1, 1 << np.maximum(levels - depth, 0))
        if k.max(initial=1) > 64 or int(np.sum(k ** 3)) > (1 << 19):
            self._warp_dirty = True
            return
        lo = np.clip(
            np.floor(
                (pos - (2.0 ** -depth)[:, None] + 1.0) * (side / 2.0)
            ).astype(np.int64),
            0, side - 1,
        )
        cells = []
        for kk in np.unique(k):
            sel = lo[k == kk]
            off = np.arange(kk, dtype=np.int64)
            ox, oy, oz = np.meshgrid(off, off, off, indexing="ij")
            ex = np.clip(sel[:, None, 0] + ox.reshape(-1)[None, :], 0, side - 1)
            ey = np.clip(sel[:, None, 1] + oy.reshape(-1)[None, :], 0, side - 1)
            ez = np.clip(sel[:, None, 2] + oz.reshape(-1)[None, :], 0, side - 1)
            cells.append(((ex * side + ey) * side + ez).reshape(-1))
        flat = np.unique(np.concatenate(cells))
        n_invalid = int(flat.size)
        # Pad to a power-of-two bucket so the scatter keeps a handful of
        # compiled shapes (every distinct shape is a remote recompile);
        # duplicate indices are safe — set(0) is idempotent.
        cap = max(256, 1 << int(np.ceil(np.log2(flat.size))))
        flat = np.concatenate(
            [flat, np.full(cap - flat.size, flat[0], dtype=flat.dtype)]
        )
        if tracer.warp_table_combined(self._warp_table):
            # Interleaved (warp, skip) layout: the WARP word of cell c sits
            # at 2c. The skip half needs no cell-local invalidation here —
            # subdivides only DECREASE occupancy (stored cubes stay
            # conservative) and collapses zero the whole skip half in
            # _apply_feedback.
            flat = flat * 2
        self._warp_table = self._warp_table.at[jnp.asarray(flat)].set(
            jnp.uint32(0)
        )
        self._warp_incremental += 1
        self._warp_invalid += n_invalid
        if self._warp_invalid > (side ** 3) // 16:
            # Too much of the table falls back to root restarts: rebuild.
            self._warp_dirty = True

    # -- frame loop -----------------------------------------------------------

    def reset_scene(self, chunk) -> None:
        """Swap in a new root chunk and reset the streamed octree to depth 1
        (reference: src/app.rs:141-178 "Open File")."""
        self.world.chunks[0] = chunk
        self.world.generate_mip_tree(0)
        mask = self.world.chunks[0].get_node_mask(0)
        self.octree = Octree(mask)
        self._pending_feedback = None  # stale candidates index the old tree
        self._last_visits = None
        self._full_upload()

    def reset_world(self, world: World) -> None:
        """Swap the WHOLE world (Open World / Regenerate): reset the
        streamed octree to the new root's mask and drop in-flight feedback
        (stale candidates index the old tree)."""
        self.world = world
        mask = world.chunks[0].get_node_mask(0)
        self.octree = Octree(mask)
        self._pending_feedback = None
        self._last_visits = None
        self._full_upload()

    def render(self):
        """Render one frame; returns (image u8[H,W,3], TraceResult).

        The image is the display-encoded device frame (``u8_image=True`` —
        what the viewer ships verbatim and ``save_png`` writes directly).
        In beam mode the TraceResult's per-ray arrays ride in block-major
        (``_pixel_to_block``) order (``raw_result=True``): order-independent
        consumers (hit counts, pool-indexed visit feedback) read them
        directly; pixel-indexed consumers must apply
        ``tracer._block_to_pixel`` per field first."""
        s = self.settings
        _, cam_inv = camera_matrices(
            self.character.pos, self.character.look, s.fov,
            self.width, self.height,
        )
        # Rays are generated ON DEVICE from the 64-byte inverse matrix —
        # uploading a precomputed 720p/1080p direction grid costs hundreds
        # of ms over the tunneled link (see generate_rays_device).
        adaptive = not s.pause_adaptive and (
            s.feedback_every <= 1
            or self.frame_count % s.feedback_every == 0
        )
        # Interactive frames ride the fast beam/staged tracer: staged visit
        # counts keep filled-leaf counts exact and the interior zero-set
        # exact even under stage overflow (see trace_staged's docstring),
        # which is precisely what the LOD thresholds read — so adaptive
        # frames no longer pay the ~3x slower tiled path (round-1 VERDICT).
        mode = (
            "beam" if self.height % 8 == 0 and self.width % 8 == 0
            else "staged"
        )
        # Beam frames generate rays directly in block-major order (the tile
        # permutation fuses into the direction arithmetic on device).
        origin, dirs = generate_rays_device(
            cam_inv, self.width, self.height,
            block_major=8 if mode == "beam" else 0,
        )
        if mode == "beam":
            dirs = dirs.reshape(self.height, self.width, 3)
        warp = self._auto_warp(adaptive)
        # Counted frames riding the table need the interior-visit closure
        # before candidate selection (see _auto_warp).
        self._frame_warped = adaptive and warp is not None
        # Snapshot the pool array the frame reads: a deferred feedback pass
        # must select candidates against the SAME snapshot (functional
        # arrays make this a reference, not a copy).
        self._frame_words = self.device_words
        img, result, visits = tracer.render_frame(
            self._frame_words,
            jnp.asarray(origin),
            jnp.asarray(dirs),
            jnp.asarray(s.sun_dir),
            shadows=s.shadows,
            show_steps=s.show_steps,
            show_hits=s.show_hits,
            with_visits=adaptive,
            misc_bool=s.misc_bool,
            mode=mode,
            # The interactive loop consumes the image (viewer fetch) and the
            # pool-indexed visit counts (feedback) — both order-independent
            # of the per-ray result, so skip its ~10 ms 8-lane un-permute
            # (the TraceResult returned here rides block-major in beam mode)
            # and ship the display-encoded u8 frame directly (what the
            # viewer quantized after the fact anyway).
            raw_result=True,
            u8_image=True,
            pre_permuted=mode == "beam",
            warp_table=warp,
            visit_flags=adaptive and s.visit_flags and not s.show_hits,
        )
        self._last_visits = visits
        return img, result

    def _auto_warp(self, adaptive: bool):
        """The warp table for a frame, or None (sub-threshold pools — see
        Settings.warp_pool_words). Builds lazily on the first eligible
        frame after a full upload.

        COUNTED frames may ride the table too (round 5): warp/skip
        restarts under-mark shallow interiors, but the exact interior
        zero-visit set — all the collapse threshold reads — is
        reconstructed by the upward closure ``feedback.propagate_visits``
        before candidate selection (update() applies it), and filled-leaf
        counts are exact under every restart mode (hits enumerate them).
        show_hits frames still exclude the table: the debug view displays
        raw interior magnitudes, which restarts change."""
        s = self.settings
        if (
            (adaptive and s.show_hits)
            or s.warp_pool_words is None
            or self.device_words.shape[0] < s.warp_pool_words
        ):
            return None
        if self._warp_dirty or self._warp_table is None:
            # Level 7: deeper resume states shorten every in-body
            # re-descent; on the deep10 bench frame 7 beats 6 beats 5
            # (407.9 / 423.9 / 456.4 ms, probes/warp_depth_probe.py)
            # and the packed lookup keeps the 2M-cell table inside the
            # fast row-gather class. Level is recovered from the table
            # length downstream (tracer.warp_table_levels). With
            # Settings.skip_field the table is the COMBINED warp+skip form
            # (render/skip.py): off-frames also cross provably-empty space
            # in one boundary step per octant-directed cube.
            # Capacity-class pools keep PLAIN warp: on the 100 MB island the
            # combined table measured 0.90x (cap-resolved rays march farther
            # and the 33.6 MB combined lookup exits the fast gather byte
            # class — probes/island_skip run + PERF.md round-5); the 31.6 MB
            # deep shell is neutral, mid pools win 2.06x.
            if s.skip_field and self.device_words.shape[0] <= (1 << 23):
                from ..render.skip import build_warp_skip_table

                self._warp_table = build_warp_skip_table(self.device_words, 7)
            else:
                self._warp_table = tracer.build_warp_table(
                    self.device_words, 7
                )
            self._warp_dirty = False
            self._skip_stale = False
            self._warp_invalid = 0
        elif self._skip_stale:
            # Collapses increase occupancy (an interior becomes a FILLED mip
            # leaf), so stored skip cubes overlapping the collapsed region
            # may no longer be empty. _apply_feedback zeroed the skip half
            # (cheap, keeps the table valid as warp-only); rebuild it here,
            # off the counted-frame path.
            from ..render.skip import build_skip_field

            levels = tracer.warp_table_levels(self._warp_table)
            skipf = build_skip_field(self.device_words, levels)
            self._warp_table = self._warp_table.at[1::2].set(skipf)
            self._skip_stale = False
        return self._warp_table

    def update(self):
        """Post-render adaptive pass (reference: src/app.rs:97-119).

        With ``Settings.deferred_feedback`` the counted frame only DISPATCHES
        candidate selection; the readback + host engine + patch upload of the
        previous counted frame run here first, so the candidate-readback RTT
        overlaps this frame's device compute (double-buffered feedback)."""
        s = self.settings
        stats = None
        freed_now = np.zeros(0, dtype=np.int64)
        if self._pending_feedback is not None:
            packed_dev, sel_offset, sel_m, caps, stale = self._pending_feedback
            self._pending_feedback = None
            stats = self._apply_feedback(
                np.asarray(packed_dev), sel_offset, sel_m, caps, stale
            )
            # Slots freed by the batch just applied: any selection that was
            # dispatched BEFORE it (this frame's — its snapshot is the frame's
            # pre-apply pool) must drop candidates landing in them.
            freed_now = self._last_freed
        if s.pause_adaptive or self._last_visits is None:
            # Skipped frames (paused, or a feedback_every off-frame) still
            # advance the frame counter so the feedback cadence progresses.
            self.frame_count += 1
            return stats or {"subdivided": 0, "collapsed": 0, "patched": 0}

        # Select against the CURRENT pool (post-apply of any pending batch),
        # not the frame's render snapshot: the frame's visits index the same
        # slots either way (same bucket), and selecting post-apply means the
        # deferred batch is applied against exactly the pool it selected from
        # — no staleness window at all, and no fb1 static-scene churn (a
        # snapshot selection re-picks the candidates the pending batch just
        # split, wasting every other batch on Doubleup skips). Mixed
        # visit/pool pairs are safe: just-split parents keep their hot-leaf
        # counts (not re-picked: now interior), fresh children/collapsed
        # leaves are only ever *eagerly* picked, never corrupting (the engine
        # operates on live nodes). If the apply crossed a device-bucket rung
        # the shapes diverge — fall back to the snapshot and filter stale
        # candidates at apply time (see _apply_feedback ``stale``).
        sel_words = self.device_words
        if sel_words.shape != self._frame_words.shape:
            sel_words = self._frame_words
        else:
            freed_now = np.zeros(0, dtype=np.int64)
        if getattr(self, "_frame_warped", False):
            # Reconstruct the exact interior zero-visit set for a counted
            # frame that rode the warp/skip table (feedback.propagate_visits
            # docstring has the exactness argument). Closure runs against
            # the FRAME's tree (the structure the visits were traced on).
            self._last_visits = feedback.propagate_visits(
                self._frame_words, self._last_visits,
                passes=min(24, int(s.octree_depth) + 2),
            )
        packed_dev = feedback.select_candidates_packed(
            sel_words,
            self._last_visits,
            jnp.int32(min(len(self.octree), int(sel_words.shape[0]))),
            sub_cap=s.sub_cap,
            unsub_cap=s.unsub_cap,
            offset=jnp.int32(self._sel_offset),
        )
        self._last_visits = None
        sel_m = int(sel_words.shape[0])
        caps = (s.sub_cap, s.unsub_cap)
        if s.deferred_feedback:
            self._pending_feedback = (
                packed_dev, self._sel_offset, sel_m, caps, freed_now
            )
            self.frame_count += 1
            return stats or {"subdivided": 0, "collapsed": 0, "patched": 0}
        # one device->host transfer for both lists + counts
        now = self._apply_feedback(
            np.asarray(packed_dev), self._sel_offset, sel_m, caps, freed_now
        )
        if stats:  # a pending batch applied this step too (deferred was
            # just toggled off): merge so its mutations are not dropped
            now = {k: stats[k] + now[k] for k in now}
        self.frame_count += 1
        return now

    def _apply_feedback(self, packed: np.ndarray, sel_offset: int, m: int,
                        caps: tuple, stale: np.ndarray | None = None):
        """Consume a packed candidate readback: host adaptive engine + patch
        push. ``sel_offset`` is the rotation offset the selection used, ``m``
        the pool size it ran over (its index modulus), and ``caps`` the
        (sub, unsub) caps it was packed with — the caller's CURRENT settings
        may have changed since a deferred selection was dispatched.
        ``stale``: slots released by batches applied between this selection's
        snapshot and now (deferred feedback); candidates indexing them refer
        to nodes that no longer exist — mutating anyway would corrupt the
        pool (a subdivision of a dead slot leaks its child group forever; a
        collapse of a dead interior can spuriously evict a live chunk)."""
        sub_cap, unsub_cap = caps
        sub_n, unsub_n = int(packed[0]), int(packed[1])
        sub_idx = packed[2: 2 + min(sub_n, sub_cap)]
        unsub_idx = packed[2 + sub_cap: 2 + sub_cap + min(unsub_n, unsub_cap)]

        # On cap overflow, advance the selection offset just past the last
        # candidate this frame consumed, so the next frame's window starts at
        # the first starved one; with no overflow the window stays put (the
        # selected set is offset-invariant then). Stale candidates count as
        # consumed (they were selected and looked at), so this runs pre-drop.
        def _consumed(idx, count, cap):
            if count <= cap or idx.size == 0:
                return 0
            return (int(idx[-1]) - sel_offset) % m + 1
        adv = max(_consumed(sub_idx, sub_n, sub_cap),
                  _consumed(unsub_idx, unsub_n, unsub_cap))
        if adv:
            self._sel_offset = (sel_offset + adv) % m

        if stale is not None and stale.size:
            sub_idx = sub_idx[~np.isin(sub_idx, stale)]
            unsub_idx = unsub_idx[~np.isin(unsub_idx, stale)]

        if self.use_native:
            from . import native_engine

            subdivided, _ = native_engine.process_subdivision(
                sub_idx, self.octree, self.world
            )
            collapsed, _ = native_engine.process_unsubdivision(
                unsub_idx, self.octree, self.world
            )
        else:
            subdivided = engine.process_subdivision(
                sub_idx, self.octree, self.world
            )
            collapsed = engine.process_unsubdivision(
                unsub_idx, self.octree, self.world
            )
        patched = self._push_patches()
        if (
            collapsed
            and self._warp_table is not None
            and not self._warp_dirty
            and not self._skip_stale
            and tracer.warp_table_combined(self._warp_table)
        ):
            # A collapse turns an interior into a FILLED mip leaf: cells that
            # were empty inside its region became occupied, so stored skip
            # cubes overlapping it (anywhere within SKIP_CAP cells) may no
            # longer be empty. Zero the skip half NOW — one cheap strided
            # write that keeps the table valid as warp-only — and rebuild it
            # lazily on the next eligible off-frame (_auto_warp).
            self._warp_table = self._warp_table.at[1::2].set(jnp.uint32(0))
            self._skip_stale = True
        # Drain the freed-group journal every apply (it would grow without
        # bound otherwise); the deferred path reads it to invalidate the
        # selection dispatched before this batch landed.
        self._last_freed = self.octree.drain_freed()
        return {
            "subdivided": subdivided,
            "collapsed": collapsed,
            "patched": patched,
        }

    def step(self):
        """render + update, like one outer event-loop turn
        (reference: src/main.rs:44-55)."""
        img, result = self.render()
        stats = self.update()
        return img, result, stats

    # -- stats ----------------------------------------------------------------

    def node_stats(self):
        """(node count, hole %) for the GUI line (reference: src/app.rs:291-295)."""
        return len(self.octree), 100.0 * self.octree.hole_fraction()
