#!/bin/bash
# Wait for the running golden-fixture generation to finish, then run the
# FULL test suite on CPU (no axon plugin, local LLVM compiles) and record
# the result.  VERDICT r1 weak #5: a recorded full-suite green run.
cd /root/repo
while ps -p "$1" > /dev/null 2>&1; do sleep 20; done
echo "golden gen (pid $1) done at $(date)" > artifacts/testrun_r2e_cpu.log
ls -la tests/golden/ >> artifacts/testrun_r2e_cpu.log 2>&1
env -u PALLAS_AXON_POOL_IPS JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
  timeout 16200 python -m pytest tests/ -q -rf --durations=25 \
  >> artifacts/testrun_r2e_cpu.log 2>&1
echo "SUITE rc=$? $(date)" >> artifacts/testrun_r2e_cpu.log
