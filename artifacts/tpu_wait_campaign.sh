#!/bin/bash
# Wait for the axon TPU pool to grant a chip, then run the full round-2
# measurement campaign (artifacts/tpu_campaign.sh).  Probe is a tiny
# jit; each attempt logs to artifacts/tpu_wait.log.
cd /root/repo
for i in $(seq 1 120); do
  echo "[campaign-wait $i] $(date)" >> artifacts/tpu_wait.log
  timeout 600 python -c "
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache')
import jax, jax.numpy as jnp
x = jax.jit(lambda v: v + 1)(jnp.ones((8,), jnp.uint32))
jax.block_until_ready(x)
print('probe ok, backend:', jax.default_backend())
" > artifacts/tpu_probe3.log 2>&1
  rc=$?
  echo "[campaign-wait $i] rc=$rc" >> artifacts/tpu_wait.log
  if [ $rc -eq 0 ] && grep -q "backend: axon" artifacts/tpu_probe3.log; then
    echo "TPU UP $(date) — starting campaign" >> artifacts/tpu_wait.log
    bash artifacts/tpu_campaign.sh
    echo "CAMPAIGN EXIT rc=$? $(date)" >> artifacts/tpu_wait.log
    exit 0
  fi
  sleep 180
done
echo "CAMPAIGN-WAIT GAVE UP $(date)" >> artifacts/tpu_wait.log
exit 1
