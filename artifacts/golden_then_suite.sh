#!/bin/bash
# round-2: regenerate golden fixtures, then default-tier suite, then slow tier.
cd /root/repo
ENV="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache"
echo "=== golden gen start $(date)" > artifacts/chain_r2.log
$ENV timeout 7200 python tests/test_golden.py > artifacts/golden_gen9.log 2>&1
echo "=== golden gen rc=$? $(date)" >> artifacts/chain_r2.log
ls -la tests/golden >> artifacts/chain_r2.log
echo "=== default suite start $(date)" >> artifacts/chain_r2.log
$ENV timeout 14400 python -m pytest tests/ -q -rf --durations=25 > artifacts/testrun_r2f_cpu.log 2>&1
echo "=== default suite rc=$? $(date)" >> artifacts/chain_r2.log
tail -3 artifacts/testrun_r2f_cpu.log | grep -v cpu_aot >> artifacts/chain_r2.log
echo "=== slow tier start $(date)" >> artifacts/chain_r2.log
$ENV timeout 21600 python -m pytest tests/ -q -rf -m slow --durations=25 > artifacts/testrun_r2_slow_cpu.log 2>&1
echo "=== slow tier rc=$? $(date)" >> artifacts/chain_r2.log
echo "CHAIN DONE $(date)" >> artifacts/chain_r2.log
