"""Probe (2026-08-20, VERDICT r4 #4): per-iteration visit-accounting cost.

The adaptive (counted) frame runs a pool-sized scatter-add of each lane's
descended-into node id EVERY traversal iteration (~7 ns/lane/iter — PERF.md
primitives), nearly doubling the loop body vs the off-frame. The LOD engine
only needs (a) exact counts on FILLED leaves (threshold >= 4) and (b) the
exact zero-set on interiors (collapse at 0) — filled leaves are landed only
at ray-hit events, so (a) can come from ONE end-of-frame scatter of the hit
indices, leaving the in-loop op to provide only a visited FLAG. This probe
measures candidate in-loop ops at representative stage width, interleaved in
one process (PERF.md measurement rule).

Variants (all scatters use mode="drop"):
  none     : loop body without any visit op (floor)
  add_i32  : visits.at[idx].add(act_i32)            -- current scheme
  set_i32  : visits.at[idx].set(1)                  -- flag, int32
  max_i32  : visits.at[idx].max(act_i32)            -- flag via max
  add_u8   : u8 counter array, add
  set_u8   : u8 flag array, set
  add16th  : add-i32 every 16th iteration only (cadence lower bound)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")

POOL = 1 << 20  # 1M-slot pool (session class)
W = 518400      # n/4 stage width at 1080p
ITERS = 20
REPS = 3


def make_fn(kind):
    def step(i, carry):
        visits, idx, acc = carry
        # a cheap "traversal-ish" body so the scatter sits inside a real
        # fused loop: advance idx pseudo-randomly, reduce something.
        nidx = (idx * jnp.int32(1103515245) + jnp.int32(12345 + i)) % POOL
        act = (nidx & 7) != 7
        if kind == "add_i32":
            visits = visits.at[nidx].add(act.astype(jnp.int32), mode="drop")
        elif kind == "set_i32":
            visits = visits.at[jnp.where(act, nidx, POOL)].set(
                jnp.int32(1), mode="drop")
        elif kind == "max_i32":
            visits = visits.at[nidx].max(act.astype(jnp.int32), mode="drop")
        elif kind == "add_u8":
            visits = visits.at[nidx].add(act.astype(jnp.uint8), mode="drop")
        elif kind == "set_u8":
            visits = visits.at[jnp.where(act, nidx, POOL)].set(
                jnp.uint8(1), mode="drop")
        elif kind == "add16th":
            visits = jax.lax.cond(
                i % 16 == 0,
                lambda v: v.at[nidx].add(act.astype(jnp.int32), mode="drop"),
                lambda v: v,
                visits,
            )
        acc = acc + jnp.sum(nidx, dtype=jnp.int32)
        return visits, nidx, acc

    dtype = jnp.uint8 if kind.endswith("u8") else jnp.int32

    @jax.jit
    def run(idx0):
        visits = jnp.zeros(POOL, dtype=dtype)
        visits, idx, acc = jax.lax.fori_loop(
            0, ITERS, step, (visits, idx0, jnp.int32(0)))
        return visits.sum(dtype=jnp.int32) + acc

    return run


def main():
    rng = np.random.default_rng(0)
    idx0 = jnp.asarray(rng.integers(0, POOL, W).astype(np.int32))
    kinds = ["none", "add_i32", "set_i32", "max_i32", "add_u8", "set_u8",
             "add16th"]
    fns = {k: make_fn(k) for k in kinds}
    for k in kinds:  # compile + warm
        np.asarray(fns[k](idx0))
    results = {k: [] for k in kinds}
    for _ in range(REPS):  # interleaved A/B
        for k in kinds:
            t0 = time.time()
            np.asarray(fns[k](idx0))
            results[k].append(time.time() - t0)
    base = min(results["none"])
    print(f"pool={POOL} width={W} iters={ITERS}")
    for k in kinds:
        dt = min(results[k])
        extra = (dt - base) / (W * ITERS) * 1e9
        print(f"{k:>8}: {dt * 1e3:7.2f} ms  (+{extra:5.2f} ns/lane/iter)")


if __name__ == "__main__":
    main()
