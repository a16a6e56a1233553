"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY.md §4.4).

Note: this environment's axon TPU plugin force-sets ``jax_platforms`` during
``import jax`` (sitecustomize), so env vars alone don't stick — the config
must be updated after import.
"""

import gc

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the trace while-loop takes ~30-60s to compile
# per variant on this 1-core host; cache across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_ASSETS = "/root/reference"

# Every loaded CPU executable holds several memory mappings, and the kernel
# default vm.max_map_count=65530 kills the run with SIGSEGV once ~60K maps
# accumulate (measured; the crash surfaces inside compilation-cache reads).
# Raise the limit when the environment allows (container root) — the
# per-module drop below bounds the peak either way, and test_tracer adds a
# per-test drop when the limit stays low.
try:
    with open("/proc/sys/vm/max_map_count", "w") as _f:
        _f.write("1048576\n")
except OSError:
    pass


def low_map_limit() -> bool:
    """True when the kernel map-count limit is small enough that a single
    heavy module's executables can exhaust it."""
    try:
        with open("/proc/sys/vm/max_map_count") as f:
            return int(f.read()) < (1 << 18)
    except OSError:
        return False


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_executables():
    """Release compiled executables between test modules.

    Every loaded CPU executable holds several memory mappings; across the
    full suite (~164 tests x many trace_staged variants) the process walks
    into the kernel's vm.max_map_count (65530) and dies with SIGSEGV/SIGABRT
    around the 60K-map mark (measured 2026-08-18: maps=59967 just before the
    crash at 43%+). Per-module cache drops keep the peak at the largest
    single module (test_tracer alone passes); re-warms across modules come
    from the persistent on-disk compilation cache, so only load time is
    repaid."""
    yield
    jax.clear_caches()
    gc.collect()
