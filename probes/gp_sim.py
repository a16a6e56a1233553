#!/usr/bin/env python3
"""Policy simulator: lane-iteration counts under parent-only vs
parent+grandparent restarts (the carried-register alternative to the warp
table). Pure numpy, oracle semantics; counts only — no result checking."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from octree_tracer_tpu.core.voxel import VOXEL_OFFSET
from octree_tracer_tpu.io import load_file
from octree_tracer_tpu.render.camera import camera_matrices, generate_rays

F = np.float32
EPS = F(2e-6)
RES = 512
MAX_STEPS = 100


def simulate(words, origin, dirs, use_gp):
    words = np.ascontiguousarray(words, dtype=np.uint32)
    d = np.asarray(dirs, F).reshape(-1, 3).copy()
    n = d.shape[0]
    d[d == 0] = F(1e-6)
    pos = np.broadcast_to(np.asarray(origin, F).reshape(1, 3), (n, 3)).copy()
    # slab entry
    tn = (-np.sign(d) - pos) / d
    tmin = np.max(tn, axis=1)
    inside = np.all(np.abs(pos) < 1, axis=1)
    ok = inside | (tmin > 0)
    pos = np.where(inside[:, None], pos, pos + d * tmin[:, None])
    ok &= np.all(np.abs(pos) <= 1.0001, axis=1)

    active = ok.copy()
    steps = np.zeros(n, np.int32)
    # current group state
    gi = np.zeros(n, np.int64)
    gc = np.zeros((n, 3), F)
    gd = np.zeros(n, np.int32)
    # grandparent state
    pgi = np.zeros(n, np.int64)
    pgc = np.zeros((n, 3), F)
    pgd = np.zeros(n, np.int32)
    pgv = np.zeros(n, bool)

    iters = 0
    classes = dict(descend=0, stay=0, gp=0, root=0)
    for _ in range((MAX_STEPS + 2) * 26):
        if not active.any():
            break
        a = active
        iters += int(a.sum())
        p = (pos[a] > gc[a]).astype(F)
        child = (p[:, 0] * 4 + p[:, 1] * 2 + p[:, 2]).astype(np.int64)
        half1 = (F(1.0) / np.exp2(gd[a] + 1).astype(F))[:, None]
        ccen = gc[a] + (p * 2 - 1) * half1
        idx = gi[a] + child
        payload = words[idx] >> np.uint32(4)
        leaf = payload >= np.uint32(VOXEL_OFFSET)
        filled = payload > np.uint32(VOXEL_OFFSET)
        ai = np.nonzero(a)[0]

        # filled leaf: retire
        active[ai[leaf & filled]] = False
        # interior: descend — gp <- current
        dm = ~leaf
        rows = ai[dm]
        classes["descend"] += rows.size
        pgi[rows] = gi[rows]
        pgc[rows] = gc[rows]
        pgd[rows] = gd[rows]
        pgv[rows] = True
        gi[rows] = payload[dm]
        gc[rows] = ccen[dm]
        gd[rows] = gd[rows] + 1

        # empty leaf: step
        em = leaf & ~filled
        rows = ai[em]
        if rows.size:
            half = half1[em]
            t = (ccen[em] - pos[rows] + np.sign(d[rows]) * half) / d[rows]
            tmin = t.min(axis=1)
            axis = t.argmin(axis=1)
            newp = pos[rows] + d[rows] * tmin[:, None]
            nrm = np.zeros_like(newp)
            nrm[np.arange(rows.size), axis] = -np.sign(
                d[rows][np.arange(rows.size), axis])
            newp = newp - nrm * EPS
            pos[rows] = newp
            steps[rows] += 1
            oob = np.any((newp < -1) | (newp >= 1), axis=1)
            capped = steps[rows] > MAX_STEPS
            dead = oob | capped
            active[rows[dead]] = False
            live = rows[~dead]
            lp = newp[~dead]
            # in current group's cell?
            h = (F(2.0) / np.exp2(gd[live] + 1).astype(F))[:, None]
            inpar = np.all((lp > gc[live] - h) & (lp <= gc[live] + h), axis=1)
            classes["stay"] += int(inpar.sum())
            rest = live[~inpar]
            rp = lp[~inpar]
            if use_gp:
                h2 = (F(2.0) / np.exp2(pgd[rest] + 1).astype(F))[:, None]
                ingp = pgv[rest] & np.all(
                    (rp > pgc[rest] - h2) & (rp <= pgc[rest] + h2), axis=1)
                gprows = rest[ingp]
                classes["gp"] += gprows.size
                gi[gprows] = pgi[gprows]
                gc[gprows] = pgc[gprows]
                gd[gprows] = pgd[gprows]
                pgv[gprows] = False
                rest = rest[~ingp]
            classes["root"] += rest.size
            gi[rest] = 0
            gc[rest] = 0
            gd[rest] = 0
            pgv[rest] = False
    return iters, classes


for name, path in (("monu10", "/root/reference/files/monu10.vox"),
                   ("defualt", "/root/reference/files/defualt.vox")):
    t = load_file(path, 10)
    words = t.to_words()
    pos0 = np.array([0.4, 0.6, -2.2], F)
    look = np.array([-0.2, -0.35, 1.0], F)
    _, ci = camera_matrices(pos0, look, 70.0, RES, RES)
    o, d = generate_rays(ci, RES, RES)
    for use_gp in (False, True):
        iters, cls = simulate(words, o, d, use_gp)
        print(f"{name} gp={use_gp}: lane-iters {iters}  {cls}", flush=True)
