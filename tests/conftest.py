"""Test harness config: force JAX onto a virtual 8-device CPU mesh so
sharding tests stand in for a TPU pod slice (SURVEY.md §4: sharded-vs-
single-chip equality on a CPU mesh)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env exposes an experimental TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compilation cache: field/curve kernels are compile-heavy.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
