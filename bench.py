#!/usr/bin/env python3
"""Benchmark driver: monu10.vox at 1920x1080, primary rays + voxel-colour
shading on one TPU chip (BASELINE.md config 2; north star 150 Mrays/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

NORTH_STAR_MRAYS = 150.0
SCENE = "/root/reference/files/monu10.vox"
W, H = 1920, 1080
FRAMES = 3


def main():
    import signal

    import jax

    # Global wall budget (VERDICT r3 weak #1: the round-3 driver run hit its
    # wall clock before bench printed ANYTHING — rc=124, parsed=null, the
    # whole round's number lost). Three defenses now:
    #   1. the primary metric is printed (and flushed) the moment it exists;
    #   2. the full updated JSON is re-printed after EVERY guarded row — the
    #      driver parses the tail, last complete line wins;
    #   3. a global deadline: rows that no longer fit the budget are skipped
    #      and recorded as skipped, with per-row wall times for diagnosis.
    T_START = time.time()
    WALL_BUDGET_S = float(__import__("os").environ.get(
        "OT_BENCH_WALL_BUDGET_S", "1500"))

    jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
    import jax.numpy as jnp

    from octree_tracer_tpu.io import load_file
    from octree_tracer_tpu.render import tracer
    from octree_tracer_tpu.render.camera import (
        camera_matrices, generate_rays, generate_rays_device,
    )

    from octree_tracer_tpu.render.skip import build_warp_skip_table

    words = jnp.asarray(load_file(SCENE).to_words())
    import numpy as np

    # Round 5: every scene row rides a combined warp+skip table
    # (render/skip.py) — boundary steps cross whole stored empty cubes
    # instead of one cell. Same-process A/Bs vs the round-4 configs:
    # monu10 burst 95.8->87.3 ms/frame (1.10x), +shadows 1.11x, monu9
    # 1.43x, phantom 1.29x, defualt 1.70x, deep10 neutral
    # (probes/skip_frame_probe.py + skip_frame2_probe.py, 2026-08-20).
    mskip = build_warp_skip_table(words, 7)

    pos = np.array([0.4, 0.6, -2.2], dtype=np.float32)
    look = np.array([-0.2, -0.35, 1.0], dtype=np.float32)
    _, cam_inv = camera_matrices(pos, look, 70.0, W, H)
    origin, dirs = generate_rays(cam_inv, W, H)
    oj, dj = jnp.asarray(origin), jnp.asarray(dirs)
    sun = jnp.asarray(tracer.DEFAULT_SUN)

    def frame():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=False, mode="beam", raw_result=True,
            u8_image=True, warp_table=mskip,
        )
        return res.hit.sum()

    def frame_shadows():
        img, res, _ = tracer.render_frame(
            words, oj, dj, sun, shadows=True, mode="beam", raw_result=True,
            u8_image=True, warp_table=mskip,
        )
        return res.hit.sum()

    # Sustained throughput: K frames of a moving camera rendered in ONE
    # dispatch (lax.map over stacked inverse matrices, rays generated on
    # device). A per-frame host sync bills one tunnel round-trip (~30 ms,
    # PERF.md — an artifact absent on directly-attached TPUs) of idle
    # device time to every frame; a real interactive loop pipelines frames
    # through the swapchain instead (reference: Fifo present mode,
    # src/render.rs:28). Distinct cameras per frame keep XLA from CSE-ing
    # the map body's iterations into one.
    BURST = 4
    cam_stack = []
    for k in range(BURST):
        pk = pos + np.array([0.03 * k, 0.0, 0.01 * k], np.float32)
        lk = look + np.array([0.02 * k, 0.005 * k, 0.0], np.float32)
        _, cik = camera_matrices(pk, lk, 70.0, W, H)
        cam_stack.append(cik)
    cam_stack = jnp.asarray(np.stack(cam_stack))

    def make_burst(shadows):
        def one(ci):
            # Rays generated on device directly in block-major order: the
            # tile permutation fuses into the direction arithmetic, so the
            # frame's [n,3] f32 entry relayout disappears (bit-identical
            # values; tests/test_tracer.py).
            o1, d1 = generate_rays_device(ci, W, H, block_major=8)
            img, res, _ = tracer.render_frame(
                words, o1, d1.reshape(H, W, 3), sun, shadows=shadows,
                mode="beam", raw_result=True, u8_image=True,
                pre_permuted=True, warp_table=mskip,
            )
            # Consume the image so the presented frame is computed, not
            # dead-code-eliminated out of the measurement.
            return res.hit.sum(), jnp.sum(img, dtype=jnp.uint32)
        return jax.jit(lambda cs: jax.lax.map(one, cs))

    def timed_burst(bf):
        hits, sums = bf(cam_stack)  # compile + warm
        np.asarray((hits, sums))
        t0 = time.time()
        hits, sums = bf(cam_stack)
        hits = np.asarray(hits)
        np.asarray(sums)
        return (time.time() - t0) / BURST, hits

    out = {
        "metric": "primary_rays_monu10_1080p",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
        "device": str(jax.devices()[0]),
    }

    def emit():
        # Full-state JSON on one line; the driver takes the last complete
        # line, so every emit supersedes the previous one.
        print(json.dumps(out), flush=True)

    def _timeout(signum, frm):
        raise TimeoutError

    signal.signal(signal.SIGALRM, _timeout)

    # Primary metric, itself alarm-guarded (a hung cold compile must still
    # leave a parseable line behind) and emitted the moment it exists. The
    # alarm respects the global budget so a slow primary can't eat every
    # secondary row's slot.
    signal.alarm(max(60, int(min(
        900, WALL_BUDGET_S - (time.time() - T_START)))))
    try:
        # np.asarray forces real completion; block_until_ready is unreliable
        # on the tunneled platform (PERF.md).
        bf = make_burst(False)
        dt, _ = timed_burst(bf)
        mrays = W * H / dt / 1e6
        out["value"] = round(mrays, 2)
        out["vs_baseline"] = round(mrays / NORTH_STAR_MRAYS, 4)
        out["frame_ms"] = round(dt * 1e3, 1)
        emit()
        # Strict per-frame-dispatch number, for transparency vs the burst.
        np.asarray(frame())  # compile + sync
        t0 = time.time()
        for _ in range(FRAMES):
            np.asarray(frame())
        out["frame_ms_synced"] = round((time.time() - t0) / FRAMES * 1e3, 1)
    except Exception as e:
        out["primary_error"] = f"{type(e).__name__}: {e}"[:200]
    finally:
        signal.alarm(0)
        out["primary_wall_s"] = round(time.time() - T_START, 1)
        emit()

    # Secondary metrics; each guarded because a cold compile can take minutes
    # through the remote-compile tunnel, and each checked against the global
    # deadline so a slow early row can't silently eat the later rows' slots.
    def guarded(seconds, fn, key):
        remaining = WALL_BUDGET_S - (time.time() - T_START)
        if remaining < 90:
            out[f"{key}_skipped"] = f"wall budget ({remaining:.0f}s left)"
            emit()
            return
        t0 = time.time()
        signal.alarm(int(min(seconds, remaining)))
        try:
            fn()
        except Exception as e:  # incl. TimeoutError from the alarm;
            # KeyboardInterrupt/SystemExit must still abort the whole run
            out[f"{key}_error"] = f"{type(e).__name__}: {e}"[:200]
        finally:
            signal.alarm(0)
            out[f"{key}_wall_s"] = round(time.time() - t0, 1)
            emit()

    def shadows_metric():
        dts, hits = timed_burst(make_burst(True))
        out["with_shadows_mrays"] = round(
            (W * H + float(hits.mean())) / dts / 1e6, 2
        )
        out["with_shadows_frame_ms"] = round(dts * 1e3, 1)
        np.asarray(frame_shadows())  # compile + sync
        t0 = time.time()
        for _ in range(FRAMES):
            np.asarray(frame_shadows())
        out["with_shadows_frame_ms_synced"] = round(
            (time.time() - t0) / FRAMES * 1e3, 1
        )

    def deep_metric():
        # BASELINE.md config 3: statuette-class deep octree + shadow rays.
        # The upstream statuette.rsvo is stripped from the mirror, so the
        # scene is a deterministic synthetic stand-in of the same class: a
        # depth-10 spherical shell (~3M leaves at 1024^3) built through the
        # native tree builder.
        from octree_tracer_tpu import native
        from octree_tracer_tpu.core.cpu_octree import CpuOctree
        from octree_tracer_tpu.core.voxel import CHUNK_OFFSET

        depth = 10
        side = 1 << depth
        g = np.arange(side, dtype=np.float32)
        cx = (g + 0.5) / side * 2.0 - 1.0
        xs, ys = np.meshgrid(cx, cx, indexing="ij")
        rng2 = 0.9025 - xs * xs - ys * ys  # r=0.95 shell
        zs = np.sqrt(np.maximum(rng2, 0.0))
        keep = rng2 > 0
        cells = []
        for sign in (1.0, -1.0):
            zc = np.clip(
                ((sign * zs + 1.0) * (side / 2.0)).astype(np.int64),
                0, side - 1,
            )
            cells.append(np.stack(
                [np.broadcast_to(np.arange(side), (side, side))[keep],
                 np.broadcast_to(np.arange(side)[:, None],
                                 (side, side))[keep],
                 zc[keep]], axis=1))
        cells = np.unique(np.concatenate(cells, axis=0), axis=0)
        pos = (cells.astype(np.float32) + 0.5) / side * 2.0 - 1.0
        rgb = (
            (cells[:, 0].astype(np.uint32) % 200 + 30) << 16
            | (cells[:, 1].astype(np.uint32) % 200 + 30) << 8
            | (cells[:, 2].astype(np.uint32) % 200 + 30)
        )
        ptrs, vals = native.build_leaves(
            pos, np.full(cells.shape[0], CHUNK_OFFSET, np.uint32),
            rgb.astype(np.uint32), depth,
        )
        deep_tree = CpuOctree.from_arrays(ptrs, vals)
        dwords = jnp.asarray(deep_tree.to_words())
        # Scene-load precompute (like the pool upload): under fit-based
        # stage advancement the warp table nearly HALVES the deep
        # frame — 1115 -> 613 ms same-process (probes/deep7_probe.py;
        # pre-fit it measured a small loss, the combination inverts it:
        # shorter re-descents retire rays sooner, so fit narrows earlier).
        # Level 7 > 6 > 5 on this frame (probes/warp_depth_probe.py:
        # 407.9 / 423.9 / 456.4 ms). Combined warp+skip: neutral on this
        # shell scene (258.0 vs 258.9 ms, probes/skip_frame2_probe.py) —
        # kept for uniformity with the other rows.
        dwarp = build_warp_skip_table(dwords, 7)
        _, ci = camera_matrices(
            np.array([0.2, 0.3, -2.4], np.float32),
            np.array([-0.1, -0.15, 1.0], np.float32), 70.0, W, H)
        o2, d2 = generate_rays(ci, W, H)
        o2j, d2j = jnp.asarray(o2), jnp.asarray(d2)

        def deep_frame():
            img, res, _ = tracer.render_frame(
                dwords, o2j, d2j, sun, shadows=True, mode="beam",
                raw_result=True, u8_image=True, warp_table=dwarp,
            )
            return res.hit.sum()

        hits = int(np.asarray(deep_frame()))
        t0 = time.time()
        for _ in range(FRAMES):
            np.asarray(deep_frame())
        dtd = (time.time() - t0) / FRAMES
        out["deep10_shadows_mrays"] = round((W * H + hits) / dtd / 1e6, 2)
        out["deep10_shadows_frame_ms"] = round(dtd * 1e3, 1)
        out["deep10_nodes"] = int(len(deep_tree))

        # Sustained burst, same methodology as the primaries row (one
        # lax.map dispatch over BURST moving cameras, on-device raygen) —
        # the synced number above bills a ~30 ms tunnel RTT per frame.
        dpos = np.array([0.2, 0.3, -2.4], np.float32)
        dlook = np.array([-0.1, -0.15, 1.0], np.float32)
        dstack = []
        for k in range(BURST):
            _, cik = camera_matrices(
                dpos + np.array([0.02 * k, 0.0, 0.01 * k], np.float32),
                dlook + np.array([0.015 * k, 0.004 * k, 0.0], np.float32),
                70.0, W, H)
            dstack.append(cik)
        dstack = jnp.asarray(np.stack(dstack))

        def one(ci):
            o1, d1 = generate_rays_device(ci, W, H, block_major=8)
            img, res, _ = tracer.render_frame(
                dwords, o1, d1.reshape(H, W, 3), sun, shadows=True,
                mode="beam", raw_result=True, u8_image=True,
                pre_permuted=True, warp_table=dwarp,
            )
            return res.hit.sum(), jnp.sum(img, dtype=jnp.uint32)

        dbf = jax.jit(lambda cs: jax.lax.map(one, cs))
        bhits, bsums = dbf(dstack)  # compile + warm
        np.asarray((bhits, bsums))
        t0 = time.time()
        bhits, bsums = dbf(dstack)
        bhits = np.asarray(bhits)
        np.asarray(bsums)
        dtb = (time.time() - t0) / BURST
        # Cross-check camera 0 against the synced frame. Not exact: the
        # synced row generates rays on HOST, the burst on DEVICE, and TPU
        # FMA contraction shifts knife-edge rays (<0.5% by the tests'
        # budget; measured 0.22% on this scene) — same-input traces are
        # bit-identical (tests/test_tracer.py pre_permuted+warp case).
        assert abs(int(bhits[0]) - hits) < 0.005 * W * H, (int(bhits[0]), hits)
        out["deep10_shadows_mrays_burst"] = round(
            (W * H + float(bhits.mean())) / dtb / 1e6, 2
        )
        out["deep10_shadows_frame_ms_burst"] = round(dtb * 1e3, 1)

    def genworld_metric():
        # BASELINE.md config 4: procedural generation on device. One
        # 2^8-side chunk (the reference's production chunk is 2^9;
        # depth 8 keeps the bench round bounded).
        from octree_tracer_tpu.gen.procedural import Procedural

        corner = np.array([-1.0, -1.0, -1.0], np.float32)
        proc = Procedural(chunk_depth=8)
        proc.generate_chunk(corner, 1)  # compile warmup (cold: ~70 s via
        t0 = time.time()                # the remote-compile tunnel)
        chunk = proc.generate_chunk(corner, 1)
        dtg = time.time() - t0
        out["genworld_chunk8_s"] = round(dtg, 2)
        out["genworld_chunk8_nodes"] = 0 if chunk is None else int(len(chunk))
        # The reference's PRODUCTION chunk (2^9 side, src/procedural.rs:110).
        proc9 = Procedural(chunk_depth=9)
        proc9.generate_chunk(corner, 1)
        t0 = time.time()
        chunk9 = proc9.generate_chunk(corner, 1)
        dtg9 = time.time() - t0
        out["genworld_chunk9_s"] = round(dtg9, 2)
        out["genworld_chunk9_nodes"] = (
            0 if chunk9 is None else int(len(chunk9))
        )

    # Per-scene representative cameras (VERDICT r3 #8): pinned from a
    # bbox-framed orbit search maximizing oracle hit fraction at 192x108
    # with mean steps >= 3 (no inside-wall degenerates) — regressions in a
    # row are then attributable to that scene's traversal load, not to a
    # foreign viewpoint. Hit rates at the search resolution: monu9 0.67,
    # phantom_mansion 0.92 (steps 13.4), defualt 0.55 (steps 18.0).
    SCENE_CAMS = {
        "monu9": ((-0.668, -0.031, 0.383), (0.790, -0.410, -0.456)),
        "phantom_mansion": ((0.925, 0.181, 0.244), (-0.937, -0.243, -0.251)),
        "defualt": ((0.391, 0.634, 0.105), (-0.469, -0.874, -0.126)),
    }

    def scene_metric(name, path, n_frames=2):
        # VERDICT r2 missing #3: regression rows for the other shipped
        # scenes (phantom_mansion 1.13M nodes; defualt's long in-scene rays).
        swords = jnp.asarray(load_file(path).to_words())
        spos, slook = (np.asarray(v, np.float32) for v in SCENE_CAMS[name])
        _, sci = camera_matrices(spos, slook, 70.0, W, H)
        so, sd = generate_rays(sci, W, H)
        soj, sdj = jnp.asarray(so), jnp.asarray(sd)
        # Scene-load COMBINED warp+skip table (level 7): warp restarts win
        # 10-21% on these restart-heavy in-scene cameras, and free-space
        # skip another 1.29-1.70x on top (defualt 463->273 ms, monu9
        # 358->250, phantom 394->305 — probes/skip_frame_probe.py).
        swarp = build_warp_skip_table(swords, 7)

        def sframe():
            img, res, _ = tracer.render_frame(
                swords, soj, sdj, sun, shadows=False, mode="beam",
                raw_result=True, u8_image=True, warp_table=swarp,
            )
            return res.hit.sum()

        hits = int(np.asarray(sframe()))
        t0 = time.time()
        for _ in range(n_frames):
            np.asarray(sframe())
        dts = (time.time() - t0) / n_frames
        out[f"{name}_mrays"] = round(W * H / dts / 1e6, 2)
        out[f"{name}_frame_ms"] = round(dts * 1e3, 1)
        out[f"{name}_hit_pct"] = round(100.0 * hits / (W * H), 1)

    def session_metric():
        # Interactive adaptive Session (BASELINE.md config 5 / VERDICT r2
        # "real-time interactivity"): 720p + shadows, monu10 streaming in.
        # Wall time per step INCLUDING the viewer's u8 frame fetch and the
        # adaptive feedback/patch round-trips — through the tunnel these
        # RTTs dominate (~30 ms/sync, absent on attached hardware), so the
        # median is the honest interactive number, the min the device-side
        # bound.
        from octree_tracer_tpu.app.session import Session
        from octree_tracer_tpu.world.world import World

        sworld = World(load_blocks=False)
        sworld.chunks[0] = load_file("/root/reference/files/monu10.vox", 10)
        sworld.generate_mip_tree(0)
        # Round 5: Session DEFAULTS now include deferred_feedback (the
        # candidate readback + host engine overlap the next frame's
        # compute), so session_frame_ms is the shipped default path — it
        # should land near round-4's opt-in flags+deferred number (~370 ms
        # serialized at fb1), not the 476 ms synchronous row.
        sess = Session(sworld, width=1280, height=720)
        for _ in range(4):  # warm: compiles + pool-bucket growth
            img, _, _ = sess.step()
            np.asarray(img)
        ts = []
        for _ in range(8):
            t0 = time.time()
            img, _, _ = sess.step()
            np.asarray(img)  # the viewer's u8 frame fetch
            ts.append(time.time() - t0)
        out["session_frame_ms"] = round(float(np.median(ts)) * 1e3, 1)
        out["session_frame_ms_min"] = round(min(ts) * 1e3, 1)
        out["session_nodes"] = int(len(sess.octree))
        # Amortized-feedback cadence (Settings.feedback_every): visit
        # scatter-adds are ~40% of an adaptive device frame — a TPU cost the
        # reference's in-shader atomics don't have — so interactive loops
        # run the exact adaptive pass every Nth frame (counted frames keep
        # reference semantics; LOD converges N x slower). Median over the
        # mixed cadence = the steady-state interactive frame.
        sess.settings.feedback_every = 4
        for _ in range(4):  # warm the off-frame (no-visits) program
            img, _, _ = sess.step()
            np.asarray(img)
        ts4 = []
        for _ in range(8):
            t0 = time.time()
            img, _, _ = sess.step()
            np.asarray(img)
            ts4.append(time.time() - t0)
        out["session_frame_ms_fb4"] = round(float(np.median(ts4)) * 1e3, 1)
        # DEVICE-synced session rows (VERDICT r4 weak #1): sync on a 4-byte
        # scalar (result.hit.sum()) instead of the 2.8 MB u8 frame fetch, so
        # the artifact carries a tunnel-bandwidth-independent number (the
        # wall rows above keep the fetch; the u8 transfer is ~1 ms on
        # attached hardware but 100+ ms through a loaded tunnel).
        tsd = []
        for _ in range(8):
            t0 = time.time()
            _, res, _ = sess.step()
            float(np.asarray(res.hit.sum()))
            tsd.append(time.time() - t0)
        out["session_frame_ms_device"] = round(float(np.median(tsd)) * 1e3, 1)
        sess.settings.pause_adaptive = True
        _, res, _ = sess.step()
        float(np.asarray(res.hit.sum()))
        tso = []
        for _ in range(6):
            t0 = time.time()
            _, res, _ = sess.step()
            float(np.asarray(res.hit.sum()))
            tso.append(time.time() - t0)
        out["session_frame_ms_device_off"] = round(
            float(np.median(tso)) * 1e3, 1
        )
        sess.settings.pause_adaptive = False
        # Double-buffered loop (what the viewer actually runs,
        # viewer.ViewerServer._render): dispatch step k+1, then fetch frame
        # k — the u8 transfer overlaps the next frame's compute. Steady
        # state 232 -> ~135 ms through the tunnel
        # (probes/session_pipeline_probe.py, 2026-08-20).
        # One untimed pipelined step first: the first iteration has no
        # pending frame to fetch, and that artificially fast sample would
        # bias the steady-state median low (ADVICE r3).
        img, _, _ = sess.step()
        prev = img
        ts4p = []
        for _ in range(10):
            t0 = time.time()
            img, _, _ = sess.step()
            if prev is not None:
                np.asarray(prev)
            prev = img
            ts4p.append(time.time() - t0)
        np.asarray(prev)
        out["session_frame_ms_fb4_pipe"] = round(
            float(np.median(ts4p)) * 1e3, 1
        )
        # Reference-cadence (fb1) interactive loop with deferred feedback:
        # every frame counts visits and runs the adaptive pass, but the
        # candidate readback + host engine + patch upload are consumed one
        # frame later, overlapping the readback RTT with the next frame's
        # compute (Settings.deferred_feedback; visit flags are the session
        # default — adaptive decisions provably identical, tracer
        # visit_flags docstring). 370 ms serialized / 259 pipelined vs 476
        # for the round-3 scheme (probes/deferred_feedback_probe.py).
        sess.settings.feedback_every = 1
        sess.settings.deferred_feedback = True
        img, _, _ = sess.step()
        np.asarray(img)
        img, _, _ = sess.step()
        prev = img
        ts1d = []
        for _ in range(8):
            t0 = time.time()
            img, _, _ = sess.step()
            np.asarray(prev)
            prev = img
            ts1d.append(time.time() - t0)
        np.asarray(prev)
        out["session_frame_ms_fb1_def_pipe"] = round(
            float(np.median(ts1d)) * 1e3, 1
        )

    guarded(600, shadows_metric, "with_shadows")
    # monu9: BASELINE.md config 2 names both monu scenes; its smaller pool
    # exercises the sub-2^16 bucket the other rows never touch.
    guarded(300, lambda: scene_metric(
        "monu9", "/root/reference/files/monu9.vox"), "monu9")
    # 900 s: the deep row pays scene build + warp table + TWO big compiles
    # (synced frame + BURST lax.map) — 600 s fit standalone but timed out
    # once under host contention (2026-08-19), and a cold-cache burst
    # compile through the remote-compile tunnel could spend most of it.
    guarded(900, deep_metric, "deep10_shadows")
    # 540 s: covers the extra off-frame (no-visits) program compile the
    # feedback_every=4 cadence adds on a cold cache.
    guarded(540, session_metric, "session")
    # 600 s: a COLD chunk9 SDF compile through the remote-compile tunnel
    # measured ~540 s once (probes/island_probe.py, 2026-08-19) — the 300 s
    # guard would have dropped the whole genworld row on a cold cache.
    guarded(600, genworld_metric, "genworld_chunk8")
    guarded(300, lambda: scene_metric(
        "phantom_mansion",
        "/root/reference/files/phantom_mansion.vox"), "phantom_mansion")
    guarded(300, lambda: scene_metric(
        "defualt", "/root/reference/files/defualt.vox"), "defualt")

    out["total_wall_s"] = round(time.time() - T_START, 1)
    emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
