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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual devices share however few physical cores the host has; on a
# loaded 1-core box the default 20s/40s collective rendezvous timeouts
# abort the whole process mid-all-reduce (seen in the r4 dryrun). Give the
# threads room instead.
if "collective_call_terminate_timeout" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = flags

# persistent compilation cache: repeated test runs skip recompilation.
# NOTE: the suite gets its OWN directory — jax's cache reader hard-aborts
# the process (Fatal Python error inside get_executable_and_time) on an
# entry another process is concurrently writing, so never point the suite
# at a cache a live training/benchmark process is also using.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_pytest")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables_per_module():
    """Drop jit caches between test modules.

    A single full-suite process accumulates hundreds of XLA:CPU executables
    (the GAN train steps alone are ~20 MB of JIT code each); at ~91% of the
    suite that accumulation segfaulted inside XLA's compile/cache-load path
    twice in a row (r5), while the same tests pass standalone. Releasing
    executables after each module keeps the process within the regime the
    standalone runs prove safe; the persistent compilation cache makes any
    cross-module recompile a cheap deserialize instead of a real compile.
    """
    yield
    jax.clear_caches()
    gc.collect()
