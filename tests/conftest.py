"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device lowering without TPU hardware (SURVEY.md §4:
the TPU-native replacement for the reference's 'no MPI' local mode).

Note: the environment pre-registers a TPU PJRT plugin via sitecustomize and
sets JAX_PLATFORMS=axon, so we override the platform through jax.config
(backends initialize lazily — this must run before any jax.devices() call).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: CPU test compiles are slow; cache across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/iuvl_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
