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
