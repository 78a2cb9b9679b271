"""Round-5 SNARK campaign: 2^16 in ONE process, A/B of the Spark layer
configurations (device-resident whole-layer prover vs BR host rounds),
sharing encode + witness-commit + polyeval compiles.

  encode: cold (RC auto: warm intent -> RC=256 on R>=1024 shapes)
  rep 0: device non-ZK layers + device ZK phases, cold
  rep 1-2: same, warm                   <- the <=60 s target (VERDICT #1)
  rep 3: BR host layers + BR host phases, first call
  rep 4-5: same, warm                   <- the r4 baseline config
"""
import os, sys, time

os.environ["SPARTAN_TPU_PROFILE"] = "1"
os.environ["SPARTAN_TPU_EXPECT_REPS"] = "6"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")
sys.stdout.reconfigure(line_buffering=True)

import jax

from spartan_tpu import serialize as ser
from spartan_tpu.api import SNARK, SNARKGens, Instance
from spartan_tpu.core.merlin import Transcript
from spartan_tpu.utils.timer import Timer

print(f"backend: {jax.devices()[0].platform}")

s = 16
n = 1 << s
t = Timer("produce_synthetic_r1cs")
inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(n, n, 10, seed=0)
t.stop()
t = Timer("SNARKGens")
gens = SNARKGens(n, n, 10, n)
t.stop()

t0 = time.perf_counter()
comm, decomm = SNARK.encode(inst, gens)
print(f"SNARK::encode wall {time.perf_counter() - t0:.3f}s")

proof = None
for rep in range(6):
    if rep == 3:
        os.environ["SPARTAN_TPU_DEVICE_NONZK"] = "0"
        os.environ["SPARTAN_TPU_DEVICE_PROVER"] = "0"
        print("--- switching to BR host rounds ---")
    mode = "device" if rep < 3 else "br-host"
    t0 = time.perf_counter()
    proof = SNARK.prove(inst, comm, decomm, vars_a, inputs_a, gens,
                        Transcript(b"snark_example"))
    print(f"[rep {rep} {mode}] SNARK::prove wall "
          f"{time.perf_counter() - t0:.3f}s")

blob = ser.snark_to_bytes(proof)
print(f"proof size: {len(blob)} bytes "
      f"({ser.compressed_size(blob)} compressed)")
rep_sz = ser.snark_size_report(proof)
assert sum(rep_sz.values()) == len(blob)
for k, v in rep_sz.items():
    print(f"  len::{k}: {v} B")

t0 = time.perf_counter()
proof.verify(comm, inputs_a, Transcript(b"snark_example"), gens)
print(f"SNARK::verify wall {time.perf_counter() - t0:.3f}s")
print("proof verification successful")
