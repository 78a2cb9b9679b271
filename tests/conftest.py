"""Test harness config: force JAX onto a virtual 8-device CPU mesh so
sharding tests stand in for a TPU pod slice (SURVEY.md §4: sharded-vs-
single-chip equality on a CPU mesh)."""

import os
import sys

# The axon TPU plugin (sitecustomize, activated by PALLAS_AXON_POOL_IPS)
# routes EVERY XLA compile — CPU included — through a serial remote
# compile relay that queues ~1-2 s per module.  This suite is CPU-only
# by design and performs hundreds of small compiles (e.g. test_golden
# alone: 483 modules, 187 s of actual LLVM vs ~16 min of queueing), so
# re-exec the interpreter once with the plugin disarmed: compiles then
# run locally and the default tier finishes in minutes, not hours.
if os.environ.get("PALLAS_AXON_POOL_IPS") and \
        not os.environ.get("SPARTAN_TPU_TEST_REEXEC"):
    # pytest loads initial conftests under global fd capture (capture.py
    # pytest_load_initial_conftests); the saved original fds are
    # CLOEXEC, so exec'ing now would leave the new pytest writing into
    # orphaned capture temp files.  Stop the capture first (restores
    # the real stdout/stderr onto fds 1/2), then exec.
    try:
        import gc

        from _pytest.capture import CaptureManager

        for _obj in gc.get_objects():
            if isinstance(_obj, CaptureManager):
                _obj.stop_global_capturing()
                break
    except Exception:
        pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS")
    env["SPARTAN_TPU_TEST_REEXEC"] = "1"  # loop guard
    env["JAX_PLATFORMS"] = "cpu"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

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

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
