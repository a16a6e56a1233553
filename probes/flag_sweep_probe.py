#!/usr/bin/env python3
"""XLA:TPU compiler-flag sweep on the in-loop row-gather wall (VERDICT r2
next-step #2b, broadened): candidate flags enumerated from libtpu's own
flag-name strings (864 xla_tpu_* flags; the gather/vmem/cmem/loop-related
subset below), each applied via jit compiler_options to the P2 in-loop
gather microbenchmark (probes/gather_probe.py methodology) at a
VMEM-resident (1 MB) and a big (32 MB) table. Invalid flags / compile
crashes are caught and reported; each config is alarm-bounded."""

import signal
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
import jax.numpy as jnp

W = 1 << 18
ITERS = 16


def make_bench(opts):
    def g(table, idx):
        G = table.shape[0]

        def body(i, carry):
            idx, acc = carry
            rows = table[idx]
            s = rows.sum(1, dtype=jnp.uint32)
            acc = acc + s
            idx = (idx * jnp.uint32(2654435761) + s) % jnp.uint32(G)
            return idx, acc

        idx, acc = jax.lax.fori_loop(
            0, ITERS, body, (idx, jnp.zeros(W, jnp.uint32))
        )
        return acc.sum(dtype=jnp.uint32)

    return jax.jit(g, compiler_options=opts or None)


CONFIGS = [
    ("baseline", {}),
    ("gather_concat_thresh=0",
     {"xla_tpu_gather_expander_concat_element_gather_threshold": "0"}),
    ("gather_concat_thresh=1024",
     {"xla_tpu_gather_expander_concat_element_gather_threshold": "1024"}),
    ("gather_concat_thresh=1<<30",
     {"xla_tpu_gather_expander_concat_element_gather_threshold":
      "1073741824"}),
    ("gather_expand_better_layout=false",
     {"xla_tpu_gather_expander_expand_for_better_layout": "false"}),
    ("gather_expand_better_layout=true",
     {"xla_tpu_gather_expander_expand_for_better_layout": "true"}),
    ("gather_scatter_flatten_min=0",
     {"xla_tpu_gather_scatter_flatten_min_index_count": "0"}),
    ("gather_scatter_flatten_min=1<<30",
     {"xla_tpu_gather_scatter_flatten_min_index_count": "1073741824"}),
    ("prefer_slice_dynamic_bounds",
     {"xla_tpu_prefer_slice_with_dynamic_bounds": "true"}),
    ("vmem_to_vmem_dmas",
     {"xla_tpu_enable_vmem_to_vmem_dmas": "true"}),
    ("force_vmem_dma_and_spans",
     {"xla_tpu_force_vmem_dma_and_spans": "true"}),
    ("scoped_vmem=65536",
     {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("sparsecore_gather_offload",
     {"xla_tpu_offload_gather_to_sparsecore": "true",
      "xla_tpu_enable_offloading_gather_to_sparsecore": "true",
      "xla_tpu_offload_gather_to_sc_min_num_indices": "1"}),
    ("sparsecore_all_gathers",
     {"xla_tpu_offload_all_supported_gathers_to_sparsecore": "true"}),
    ("cmem_msa",
     {"xla_tpu_cmem_memory_space_assignment": "true"}),
    ("pipelined_loop_unroll",
     {"xla_tpu_enable_pipelined_loop_unrolling": "true"}),
    ("multi_level_nested_loop_fusion",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"}),
    ("aggressive_loop_fusion_layout",
     {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
]


def _timeout(signum, frm):
    raise TimeoutError("config timed out")


def main():
    signal.signal(signal.SIGALRM, _timeout)
    rng = np.random.default_rng(0)
    tables = {}
    for tag, logG in (("1MB", 15), ("32MB", 20)):
        G = 1 << logG
        tables[tag] = (
            jnp.arange(G * 8, dtype=jnp.uint32).reshape(G, 8),
            jnp.asarray(rng.integers(0, G, W, dtype=np.int32)),
        )
    base = {}
    for name, opts in CONFIGS:
        line = [f"{name:38s}"]
        for tag in ("1MB", "32MB"):
            table, idx = tables[tag]
            signal.alarm(300)
            try:
                f = make_bench(opts)
                np.asarray(f(table, idx))  # compile + warm
                t0 = time.time()
                for _ in range(4):
                    np.asarray(f(table, idx))
                ns = (time.time() - t0) / 4 / (W * ITERS) * 1e9
                ref = base.setdefault(tag, ns)
                line.append(f"{tag} {ns:6.2f} ns/row ({ns/ref:5.2f}x)")
            except Exception as e:
                line.append(f"{tag} FAIL: {type(e).__name__} "
                            f"{str(e)[:90]}")
            finally:
                signal.alarm(0)
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
