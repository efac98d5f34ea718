"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Note: this environment force-registers a TPU platform plugin via
sitecustomize and JAX_PLATFORMS=axon, so the env-var-before-import trick is
too late — ``jax.config.update`` is the reliable override. Must run before
any backend is initialized (pytest imports conftest first, so this holds).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs (and repeated jits of the
# same model across tests) reuse compiled executables instead of recompiling.
jax.config.update("jax_compilation_cache_dir", "/tmp/pf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
