"""Test configuration: force an 8-device virtual CPU mesh.

This gives true SPMD semantics without TPU hardware (SURVEY.md §4), so
multi-chip sharding tests run anywhere.

Note: in this environment the axon TPU plugin presets ``jax_platforms`` at
import time, overriding the ``JAX_PLATFORMS`` env var — so we must ALSO call
``jax.config.update`` after importing jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: repeated test runs skip recompilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
