#!/bin/bash
# Round-2 TPU measurement campaign — run when the axon pool is up.
# Each step appends to its own artifact log; steps are ordered so the
# most valuable data lands first if the grant is lost mid-way.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

run() {
  name=$1; shift
  echo "=== $name: $(date)" | tee -a artifacts/campaign.log
  timeout "$@" >> "artifacts/${name}.log" 2>&1
  echo "=== $name rc=$? $(date)" | tee -a artifacts/campaign.log
}

# 1. relay dispatch/transfer latency (informs all host-loop designs)
run relay_latency_tpu 1200 python artifacts/bench_relay_latency.py

# 1b. per-round cost of the stable host-path sumcheck at 2^21
run bench_round_overhead_tpu 2400 python artifacts/bench_round_overhead.py 21

# 2. MSM kernel A/B: win vs win_t vs pallas at the launch shape
run bench_msm_ab_tpu 3600 python artifacts/bench_msm_ab.py

# 3. end-to-end NIZK at 2^20 with the round-2 prover (br stable rounds,
#    fused bullet rounds, win MSM)
run profile_nizk20_r2 7200 env SPARTAN_TPU_PROFILE=1 SPARTAN_TPU_DEVICE_PROVER=0 \
    python profiler/nizk.py --min 20 --max 20 --reps 2

# 4. SNARK at 2^16 (first-ever scale run of the Spark path)
run profile_snark16_r2 7200 env SPARTAN_TPU_PROFILE=1 SPARTAN_TPU_DEVICE_PROVER=0 \
    python profiler/snark.py --min 16 --max 16 --reps 1

# 5. the driver's headline bench itself (validates BENCH_r02 config)
run bench_headline 10800 python bench.py --reps 1

# 6. device-resident prover recalibration: every prior TPU compile-cost
#    number (730s/phase etc.) was measured through the saturated remote
#    compile service; a live relay may compile the giant phase
#    executables in minutes, making the zero-round-trip device prover
#    the right bench default.  reps 3 => first-call vs steady-state.
run profile_nizk14_devprover 5400 env SPARTAN_TPU_PROFILE=1 SPARTAN_TPU_DEVICE_PROVER=1 \
    python profiler/nizk.py --min 14 --max 14 --reps 3

# 7. if 6 looked good, the 2^20 device-prover end-to-end
run profile_nizk20_devprover 10800 env SPARTAN_TPU_PROFILE=1 SPARTAN_TPU_DEVICE_PROVER=1 \
    python profiler/nizk.py --min 20 --max 20 --reps 2

echo "CAMPAIGN DONE $(date)" | tee -a artifacts/campaign.log
