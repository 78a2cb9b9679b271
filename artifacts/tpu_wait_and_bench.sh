#!/bin/bash
# Retry the TPU relay-latency bench until the axon pool grants a chip.
# Writes artifacts/relay_latency_tpu.log on success.
cd /root/repo
for i in $(seq 1 40); do
  echo "[attempt $i] $(date)" >> artifacts/tpu_wait.log
  timeout 1200 python artifacts/bench_relay_latency.py > artifacts/relay_latency_tpu.log 2>&1
  rc=$?
  echo "[attempt $i] rc=$rc" >> artifacts/tpu_wait.log
  if [ $rc -eq 0 ]; then
    echo "TPU BENCH OK $(date)" >> artifacts/tpu_wait.log
    exit 0
  fi
  sleep 120
done
echo "GAVE UP $(date)" >> artifacts/tpu_wait.log
exit 1
