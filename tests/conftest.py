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

# Persistent XLA compilation cache: the field/curve kernels are
# compile-heavy and this box has ONE cpu core — warm-cache reruns are
# the difference between minutes and seconds.  jax.config.update is
# used (not env vars) because env vars are only read at jax import and
# the experimental axon plugin can import jax before pytest does.
import jax

# The env's axon plugin imports jax at interpreter start (sitecustomize),
# so JAX_PLATFORMS=axon is already baked into the config default by the
# time this file runs — the os.environ write above is too late on such
# boxes.  config.update wins either way; without it a test run tries to
# initialize the TPU tunnel and hangs/fails when the pool is busy.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
