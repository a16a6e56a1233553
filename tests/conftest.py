"""Test configuration: force the JAX CPU backend with 8 virtual devices so
sharding tests run without TPU hardware (SURVEY.md §4.4).

Note: this environment's axon TPU plugin force-sets ``jax_platforms`` during
``import jax`` (sitecustomize), so env vars alone don't stick — the config
must be updated after import.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the trace while-loop takes ~30-60s to compile
# per variant on this 1-core host; cache across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/ot_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_ASSETS = "/root/reference"
