"""CPU simulation: free-space-skip ceilings for the wavefront tracer (round 5).

VERDICT r4's lead item proposes per-empty-leaf chebyshev skip distances in the
node word's reserved nibble bits. That exact form is STRUCTURALLY DEGENERATE:
in a well-formed SVO every interior node contains >= 1 filled voxel (empty
leaves never subdivide — compute.wgsl:39-46; put_in_voxel only splits along
insertion paths; mip colours clamp >= 1), so every empty leaf has a non-empty
sibling at chebyshev grid distance 1 of its own cell — the per-leaf own-size
skip radius is always 0. Equivalently: the octree already merges empty space
maximally at dyadic alignment, and leaf size tracks distance-to-geometry
within a factor ~2 by construction.

The viable variants decouple the skip granularity from the tree, using a
DENSE grid at fixed level L (the warp-table granularity):

  iso-L   chebyshev distance field over the L-grid: empty cell c may step to
          the exit of c's cell expanded by E[c] cells/side (E = chebyshev
          distance to nearest occupied cell - 1). One extra u32 value per
          cell; can ride the existing warp-table row layout.
  dir-L   octant-directional: for each of the 8 ray-sign octants, the largest
          empty CUBE anchored at c extending in that octant's direction
          (classic largest-empty-cube DP, flipped per octant). A ray's octant
          is fixed, so the lookup is one gather from an [8, n_cells] table.
          Rationale: iso distances die near surfaces (skim rays), directional
          ones only see the forward quadrant.
  ceil-L  oracle ceiling: step directly to the first occupied L-cell along
          the ray (any L-grid scheme is bounded by this).

This probe measures, per bench scene at its BENCH camera (bench.py
SCENE_CAMS), the unified-wavefront lane-iteration counts (the quantity TPU
frame time is proportional to — PERF.md floor analysis: 52% is the traversal
body itself, and compaction/transition costs scale with the same counts)
under plain vs each skip variant, for root / parent / warp7 restart policies.
Hits are asserted identical to the plain march (skips are conservative).

Decision rule (VERDICT r5 #1): a variant is worth building if it cuts total
lane-iterations >= 1.4x on the step-heavy scenes (defualt / phantom / monu9)
— the TPU body will pay ~1 extra gather/iter when the value cannot ride an
already-fetched warp row, so ~1.3x frame needs >= 1.4-1.5x iterations.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python probes/skip_sim_probe.py
     [--scenes monu10,defualt] [--res 480x270] [--levels 7,8]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from octree_tracer_tpu.core.voxel import VOXEL_OFFSET  # noqa: E402
from octree_tracer_tpu.io import load_file  # noqa: E402
from octree_tracer_tpu.render.camera import (  # noqa: E402
    camera_matrices,
    generate_rays,
)

F = np.float32
EPS_DIR = F(1e-6)
EPS_NUDGE = F(2e-6)

SCENES = {
    # bench.py cameras (main monu10 camera + SCENE_CAMS rows)
    "monu10": ("/root/reference/files/monu10.vox",
               (0.4, 0.6, -2.2), (-0.2, -0.35, 1.0)),
    "monu9": ("/root/reference/files/monu9.vox",
              (-0.668, -0.031, 0.383), (0.790, -0.410, -0.456)),
    "phantom_mansion": ("/root/reference/files/phantom_mansion.vox",
                        (0.925, 0.181, 0.244), (-0.937, -0.243, -0.251)),
    "defualt": ("/root/reference/files/defualt.vox",
                (0.391, 0.634, 0.105), (-0.469, -0.874, -0.126)),
}


# ---------------------------------------------------------------- occupancy

def occupancy_grid(words: np.ndarray, L: int) -> np.ndarray:
    """bool[2^L,2^L,2^L]: cell intersects filled geometry. Interior nodes at
    depth L mark their cell (interior => contains filled, the SVO invariant);
    filled leaves at depth <= L mark their whole block."""
    side = 1 << L
    occ = np.zeros((side, side, side), dtype=bool)
    # frontier: arrays of (group_base, cx, cy, cz, depth) where cx.. are the
    # GROUP's parent cell coords at depth-1 grid... simpler: track per-node.
    # Start: root's 8 children, slots 0..8.
    idx = np.arange(8, dtype=np.int64)
    cx = (idx >> 2) & 1
    cy = (idx >> 1) & 1
    cz = idx & 1
    depth = 1
    while idx.size:
        payload = (words[idx] >> np.uint32(4)).astype(np.int64)
        leaf = payload >= int(VOXEL_OFFSET)
        filled = payload > int(VOXEL_OFFSET)
        interior = ~leaf
        shift = L - depth
        # filled leaves (and, at depth L, interiors) mark blocks
        mark = filled | (interior & (depth >= L))
        if np.any(mark):
            mx, my, mz = cx[mark], cy[mark], cz[mark]
            if shift > 0:
                w = 1 << shift
                for i in range(mx.size):
                    occ[mx[i] << shift: (mx[i] << shift) + w,
                        my[i] << shift: (my[i] << shift) + w,
                        mz[i] << shift: (mz[i] << shift) + w] = True
            else:
                occ[mx, my, mz] = True
        if depth >= L:
            break
        exp = interior & (depth < L)
        base = payload[exp]
        child = np.arange(8, dtype=np.int64)
        nidx = (base[:, None] + child[None, :]).reshape(-1)
        ncx = (cx[exp][:, None] * 2 + ((child >> 2) & 1)[None, :]).reshape(-1)
        ncy = (cy[exp][:, None] * 2 + ((child >> 1) & 1)[None, :]).reshape(-1)
        ncz = (cz[exp][:, None] * 2 + (child & 1)[None, :]).reshape(-1)
        idx, cx, cy, cz = nidx, ncx, ncy, ncz
        depth += 1
    return occ


# ---------------------------------------------------------- distance fields

def iso_field(occ: np.ndarray, cap: int = 31) -> np.ndarray:
    """E[c] = (chebyshev distance from cell c to nearest occupied cell) - 1,
    clipped to [0, cap]; 0 at occupied cells. Fixpoint 3^3-max-dilation."""
    side = occ.shape[0]
    D = np.where(occ, 0, cap + 1).astype(np.int32)
    # pad with EMPTY outside (no geometry beyond the root cube)
    for _ in range(cap + 1):
        P = np.pad(D, 1, constant_values=cap + 1)
        m = D.copy()
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    if dx == dy == dz == 1:
                        continue
                    np.minimum(
                        m,
                        P[dx:dx + side, dy:dy + side, dz:dz + side] + 1,
                        out=m,
                    )
        if np.array_equal(m, D):
            break
        D = m
    return np.maximum(D - 1, 0).astype(np.int32)


def dir_fields(occ: np.ndarray, cap: int = 31) -> np.ndarray:
    """B[oct, x, y, z]: side length (in cells) of the largest empty cube
    anchored at cell c, extending in octant oct's sign directions
    (oct = sx*4 + sy*2 + sz, bit=1 means +). 0 at occupied cells.
    Fixpoint of B = occ ? 0 : 1 + min over the 7 forward shifts."""
    side = occ.shape[0]
    out = np.zeros((8,) + occ.shape, dtype=np.int32)
    for oct_ in range(8):
        flips = tuple(
            slice(None, None, -1) if not (oct_ >> (2 - a)) & 1 else
            slice(None)
            for a in range(3)
        )
        o = occ[flips]  # now the octant direction is +x,+y,+z
        B = np.where(o, 0, cap).astype(np.int32)
        for _ in range(cap):
            P = np.pad(B, ((0, 1), (0, 1), (0, 1)), constant_values=cap)
            m = np.minimum.reduce([
                P[1:, :side, :side], P[:side, 1:, :side], P[:side, :side, 1:],
                P[1:, 1:, :side], P[1:, :side, 1:], P[:side, 1:, 1:],
                P[1:, 1:, 1:],
            ])
            nB = np.where(o, 0, np.minimum(cap, 1 + m)).astype(np.int32)
            if np.array_equal(nB, B):
                break
            B = nB
        out[oct_] = B[flips]
    return out


# ------------------------------------------------------------- warp states

def warp_states(words: np.ndarray, L: int):
    """Per L-cell resume state (group_base, centre, depth) mirroring
    build_warp_table: descend from root toward each cell centre, stop at a
    leaf or depth L; state = last group visited + its parent cell."""
    side = 1 << L
    n = side ** 3
    g = np.indices((side, side, side)).reshape(3, -1).T.astype(F)
    centre = (g + F(0.5)) * F(2.0 / side) - F(1.0)
    node_index = np.zeros(n, dtype=np.int64)
    node_pos = np.zeros((n, 3), dtype=F)
    depth = np.zeros(n, dtype=np.int32)
    for _ in range(L):
        p = (centre > node_pos).astype(F)
        child = (p[:, 0] * 4 + p[:, 1] * 2 + p[:, 2]).astype(np.int64)
        word = words[node_index + child]
        payload = (word >> np.uint32(4)).astype(np.int64)
        interior = payload < int(VOXEL_OFFSET)
        ok = interior & (depth < L)
        np2_ = node_pos + (p * F(2.0) - F(1.0)) / np.exp2(
            (depth + 1).astype(F)
        )[:, None]
        node_index = np.where(ok, payload, node_index)
        node_pos = np.where(ok[:, None], np2_, node_pos)
        depth = np.where(ok, depth + 1, depth)
    return node_index, node_pos, depth


# ---------------------------------------------------------------- sim trace

def sim_trace(words, origin, dirs, *, max_steps=100, restart="root",
              warp=None, skip=None, L=7, iter_cap=6000):
    """Masked unified-loop march counting per-ray lane iterations.

    restart: 'root' | 'parent' | 'warp' (warp = warp_states(words, L)).
    skip: None | ('iso', E) | ('dir', B) | ('ceil', occ) — all on the
    2^L grid. Returns dict with hit/index/iters/steps.
    """
    words = np.ascontiguousarray(words, dtype=np.uint32)
    dirs = np.asarray(dirs, dtype=F).reshape(-1, 3)
    n = dirs.shape[0]
    origin = np.asarray(origin, dtype=F)
    pos = np.broadcast_to(origin.reshape(-1, 3), (n, 3)).astype(F).copy()
    d = dirs.copy()
    d[d == F(0.0)] = EPS_DIR
    inside = np.all((pos >= F(-1.0)) & (pos < F(1.0)), axis=-1)
    t1 = (F(-1.0) - pos) / d
    t2 = (F(1.0) - pos) / d
    tmin = np.minimum(t1, t2).max(axis=-1)
    tmax = np.maximum(t1, t2).min(axis=-1)
    dist = np.where((tmax < F(0.0)) | (tmin > tmax), F(0.0), tmin)
    entered = inside | (dist != F(0.0))
    pos = np.where(inside[:, None], pos, pos + d * dist[:, None]).astype(F)
    r_sign = np.sign(d).astype(F)
    side = 1 << L
    cell_w = F(2.0 / side)

    active = entered.copy()
    hit = np.zeros(n, dtype=bool)
    forced = np.zeros(n, dtype=bool)
    index = np.full(n, -1, dtype=np.int64)
    iters = np.zeros(n, dtype=np.int64)
    steps = np.zeros(n, dtype=np.int32)

    voxel_pos = pos.copy()
    node_index = np.zeros(n, dtype=np.int64)
    node_pos = np.zeros((n, 3), dtype=F)
    depth = np.zeros(n, dtype=np.int32)
    # parent-restart registers (state of the current group's parent cell)
    par_group = np.zeros(n, dtype=np.int64)
    par_pos = np.zeros((n, 3), dtype=F)
    par_depth = np.zeros(n, dtype=np.int32)

    if restart == "warp":
        w_index, w_pos, w_depth = warp

    for _ in range(iter_cap):
        if not active.any():
            break
        a = active
        ai = np.nonzero(a)[0]
        iters[a] += 1

        dep = depth[a] + 1
        p = (voxel_pos[a] > node_pos[a]).astype(F)
        child = (p[:, 0] * 4 + p[:, 1] * 2 + p[:, 2]).astype(np.int64)
        half = (F(1.0) / np.exp2(dep.astype(F)))[:, None]
        npos = node_pos[a] + (p * F(2.0) - F(1.0)) * half
        idx = node_index[a] + child
        payload = (words[idx] >> np.uint32(4)).astype(np.int64)
        leaf = payload >= int(VOXEL_OFFSET)
        filled = payload > int(VOXEL_OFFSET)

        depth[a] = dep
        node_pos[a] = npos

        hit_rows = ai[leaf & filled]
        hit[hit_rows] = True
        index[hit_rows] = idx[leaf & filled]
        active[hit_rows] = False

        interior = ~leaf
        intr = ai[interior]
        # Descending INTO an interior: that interior becomes the parent of
        # every node visited beneath it — registers hold (child group base,
        # interior's cell centre, interior's depth).
        par_group[intr] = payload[interior]
        par_pos[intr] = node_pos[intr]  # == the interior's own centre (npos)
        par_depth[intr] = dep[interior]
        node_index[intr] = payload[interior]

        stepping = ai[leaf & ~filled]
        if stepping.size:
            sdep = depth[stepping].astype(F)
            vsize = F(2.0) / np.exp2(sdep)
            half_s = (vsize * F(0.5))[:, None]
            lo = node_pos[stepping] - half_s
            hi = node_pos[stepping] + half_s
            sg = r_sign[stepping]
            t_ax = np.where(sg > 0, hi, lo)
            t_max = (t_ax - pos[stepping]) / d[stepping]
            # Optional skip box: choose BOX (leaf cell vs skip box) by the
            # farther exit — never the union (the bounding box of two empty
            # boxes is not empty).
            if skip is not None:
                kind, field = skip
                vp = voxel_pos[stepping]
                c = np.clip(((vp + F(1.0)) * F(side / 2.0)).astype(np.int64),
                            0, side - 1)
                if kind == "iso":
                    E_, occg = field
                    E = E_[c[:, 0], c[:, 1], c[:, 2]].astype(F)
                    valid = ~occg[c[:, 0], c[:, 1], c[:, 2]]
                    slo = c.astype(F) * cell_w - F(1.0) - E[:, None] * cell_w
                    shi = slo + (F(1.0) + F(2.0) * E)[:, None] * cell_w
                elif kind == "dir":
                    oct_ = ((sg[:, 0] > 0) * 4 + (sg[:, 1] > 0) * 2
                            + (sg[:, 2] > 0)).astype(np.int64)
                    B = field[oct_, c[:, 0], c[:, 1], c[:, 2]].astype(F)
                    valid = B > 0
                    B = np.maximum(B, F(1.0))
                    clo = c.astype(F) * cell_w - F(1.0)
                    slo = np.where(sg > 0, clo,
                                   clo + cell_w - B[:, None] * cell_w)
                    shi = slo + B[:, None] * cell_w
                elif kind == "ceil":
                    slo, shi, valid = _ceil_box(vp, sg, d[stepping], field,
                                                side, cell_w)
                else:
                    raise ValueError(kind)
                st_ax = np.where(sg > 0, shi, slo)
                st_max = (st_ax - pos[stepping]) / d[stepping]
                use = valid & (st_max.min(axis=-1) > t_max.min(axis=-1))
                t_max = np.where(use[:, None], st_max, t_max)
            roll1 = t_max[:, [1, 2, 0]]
            roll2 = t_max[:, [2, 0, 1]]
            face = (t_max <= np.minimum(roll1, roll2)).astype(F)
            new_normal = face * -r_sign[stepping]
            t_cur = t_max.min(axis=-1)
            new_vp = (pos[stepping] + d[stepping] * t_cur[:, None]
                      - new_normal * EPS_NUDGE).astype(F)
            oob = ~np.all((new_vp >= F(-1.0)) & (new_vp < F(1.0)), axis=-1)
            active[stepping[oob]] = False
            cont = stepping[~oob]
            snew = steps[cont] + 1
            over = snew > max_steps
            over_rows = cont[over]
            hit[over_rows] = True
            forced[over_rows] = True
            active[over_rows] = False
            go = cont[~over]
            if go.size:
                sel = np.zeros(n, dtype=bool)
                sel[go] = True
                selm = sel[stepping]
                voxel_pos[go] = new_vp[selm]
                steps[go] = snew[~over]
                # restart policy
                if restart == "root":
                    node_index[go] = 0
                    node_pos[go] = F(0.0)
                    depth[go] = 0
                elif restart == "parent":
                    ph = (F(1.0) / np.exp2(par_depth[go].astype(F)))[:, None]
                    inpar = np.all(
                        (voxel_pos[go] > par_pos[go] - ph)
                        & (voxel_pos[go] <= par_pos[go] + ph),
                        axis=-1,
                    ) & (par_depth[go] > 0)
                    node_index[go] = np.where(inpar, par_group[go], 0)
                    node_pos[go] = np.where(inpar[:, None], par_pos[go], F(0.0))
                    depth[go] = np.where(inpar, par_depth[go], 0)
                elif restart == "warp":
                    c2 = np.clip(
                        ((voxel_pos[go] + F(1.0)) * F(side / 2.0))
                        .astype(np.int64),
                        0, side - 1,
                    )
                    flat = (c2[:, 0] * side + c2[:, 1]) * side + c2[:, 2]
                    wi, wp, wd = w_index[flat], w_pos[flat], w_depth[flat]
                    ph = (F(1.0) / np.exp2(wd.astype(F)))[:, None]
                    ok = np.all(
                        (voxel_pos[go] > wp - ph)
                        & (voxel_pos[go] <= wp + ph),
                        axis=-1,
                    ) & (wd > 0)
                    node_index[go] = np.where(ok, wi, 0)
                    node_pos[go] = np.where(ok[:, None], wp, F(0.0))
                    depth[go] = np.where(ok, wd, 0)
    return {"hit": hit, "forced": forced, "index": index, "iters": iters,
            "steps": steps}


def _ceil_box(vp, sg, d, occ, side, cell_w):
    """Per-ray DDA over the L-grid to the first occupied cell; returns a
    degenerate 'box' whose exit plane is that cell's entry plane. Slow
    (python loop over grid steps, vectorized over rays) — ceiling only."""
    n = vp.shape[0]
    c = np.clip(((vp + F(1.0)) / cell_w).astype(np.int64), 0, side - 1)
    t = np.zeros(n, dtype=F)
    lo = c.astype(F) * cell_w - F(1.0)
    hi = lo + cell_w
    alive = ~occ[c[:, 0], c[:, 1], c[:, 2]]
    valid0 = alive.copy()  # own cell occupied => no safe skip box at all
    exit_lo = lo.copy()
    exit_hi = hi.copy()
    step_i = sg.astype(np.int64)
    for _ in range(3 * side):
        if not alive.any():
            break
        t_ax = np.where(sg > 0, hi, lo)
        tm = (t_ax - vp) / d
        ax = np.argmin(tm, axis=1)
        rows = np.arange(n)
        c2 = c.copy()
        c2[rows, ax] += step_i[rows, ax]
        off = (c2 < 0).any(axis=1) | (c2 >= side).any(axis=1)
        nowocc = np.zeros(n, dtype=bool)
        inb = ~off
        nowocc[inb] = occ[c2[inb, 0], c2[inb, 1], c2[inb, 2]]
        stop = alive & (off | nowocc)
        exit_lo[stop] = lo[stop]
        exit_hi[stop] = hi[stop]
        adv = alive & ~stop
        c[adv] = c2[adv]
        lo[adv] = c[adv].astype(F) * cell_w - F(1.0)
        hi[adv] = lo[adv] + cell_w
        alive = adv
    return exit_lo, exit_hi, valid0


# --------------------------------------------------------------------- main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="monu10,monu9,phantom_mansion,defualt")
    ap.add_argument("--res", default="480x270")
    ap.add_argument("--levels", default="7")
    ap.add_argument("--cap", type=int, default=31)
    ap.add_argument("--codebook", action="store_true",
                    help="quantize dir field to the 4-bit codebook "
                         "0..12,16,24,32 (floor = conservative)")
    args = ap.parse_args()
    W, H = (int(v) for v in args.res.split("x"))
    levels = [int(v) for v in args.levels.split(",")]

    for name in args.scenes.split(","):
        path, pos, look = SCENES[name]
        words = load_file(path).to_words()
        pos = np.asarray(pos, F)
        look = np.asarray(look, F)
        _, ci = camera_matrices(pos, look, 70.0, W, H)
        origin, dirs = generate_rays(ci, W, H)
        print(f"\n=== {name}: {len(words)} words, {W}x{H} ===", flush=True)

        for L in levels:
            t0 = time.time()
            occ = occupancy_grid(words, L)
            E = iso_field(occ, args.cap)
            B = dir_fields(occ, args.cap)
            if args.codebook:
                cb = np.array(list(range(13)) + [16, 24, 32], np.int32)
                # floor each value to the largest codebook entry <= it
                B = cb[np.searchsorted(cb, B, side="right") - 1]
            wst = warp_states(words, min(L, 7))
            t_build = time.time() - t0
            print(f"L={L}: occ {occ.mean():.3f} filled, fields+warp built "
                  f"in {t_build:.1f}s; E p50/p90={np.percentile(E[~occ], 50):.0f}"
                  f"/{np.percentile(E[~occ], 90):.0f}  "
                  f"B(+,+,+) p50/p90={np.percentile(B[7][~occ], 50):.0f}"
                  f"/{np.percentile(B[7][~occ], 90):.0f}", flush=True)

            base = {}
            for restart in ("parent", "warp"):
                for skname, sk in (
                    ("none", None),
                    ("iso", ("iso", (E, occ))),
                    ("dir", ("dir", B)),
                    ("ceil", ("ceil", occ)),
                ):
                    t0 = time.time()
                    r = sim_trace(
                        words, pos, dirs, restart=restart,
                        warp=wst if restart == "warp" else None,
                        skip=sk, L=L,
                    )
                    dt = time.time() - t0
                    tot = int(r["iters"].sum())
                    key = restart
                    if skname == "none":
                        base[key] = (tot, r)
                    b_tot, b_r = base[key]
                    # compare hits only on rays neither run forced-capped
                    # (skips change step counts, hence cap behaviour)
                    cmp = ~(r["forced"] | b_r["forced"])
                    same_hit = np.array_equal(r["hit"][cmp], b_r["hit"][cmp])
                    same_idx = same_hit and np.array_equal(
                        np.where(r["hit"] & cmp, r["index"], -1),
                        np.where(b_r["hit"] & cmp, b_r["index"], -1),
                    )
                    print(
                        f"  {restart:6s} {skname:5s}: iters {tot/1e6:8.2f}M "
                        f"(x{b_tot/max(tot,1):5.2f})  steps/ray "
                        f"{r['steps'].mean():6.2f}  p99 it "
                        f"{np.percentile(r['iters'], 99):6.0f}  forced "
                        f"{int(r['forced'].sum()):5d}  "
                        f"hits={'OK' if same_idx else 'DIFF'} "
                        f"[{dt:.0f}s]",
                        flush=True,
                    )


if __name__ == "__main__":
    main()
