"""Round-5 flagship NIZK campaign: 2^20 in ONE process, A/B of the two
warm prover configurations (device-resident ZK phases vs BR host
rounds), sharing the polycommit/polyeval compiles.

  rep 0: device phases, cold (pays every compile)
  rep 1-2: device phases, warm
  rep 3: BR host rounds, first call (pays only the 2 small BR compiles)
  rep 4-5: BR host rounds, warm

SPARTAN_TPU_PALLAS_RC=auto + EXPECT_REPS>1 -> RC=256 polycommit kernel.
"""
import os, sys, time

os.environ["SPARTAN_TPU_PROFILE"] = "1"
os.environ["SPARTAN_TPU_EXPECT_REPS"] = "6"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")
sys.stdout.reconfigure(line_buffering=True)

import jax

from spartan_tpu import serialize as ser
from spartan_tpu.api import NIZK, NIZKGens, Instance
from spartan_tpu.core.merlin import Transcript
from spartan_tpu.utils.timer import Timer

print(f"backend: {jax.devices()[0].platform}")

s = 20
n = 1 << s
t = Timer("produce_synthetic_r1cs")
inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(n, n, 10, seed=0)
t.stop()
t = Timer("NIZKGens")
gens = NIZKGens(n, n, 10)
t.stop()

proof = None
for rep in range(6):
    if rep == 3:
        os.environ["SPARTAN_TPU_DEVICE_PROVER"] = "0"
        print("--- switching to BR host rounds ---")
    mode = "device" if rep < 3 else "br-host"
    t0 = time.perf_counter()
    proof = NIZK.prove(inst, vars_a, inputs_a, gens,
                       Transcript(b"nizk_example"))
    print(f"[rep {rep} {mode}] NIZK::prove wall "
          f"{time.perf_counter() - t0:.3f}s")

blob = ser.nizk_to_bytes(proof)
print(f"proof size: {len(blob)} bytes "
      f"({ser.compressed_size(blob)} compressed)")
rep_sz = ser.nizk_size_report(proof)
assert sum(rep_sz.values()) == len(blob)
for k, v in rep_sz.items():
    print(f"  len::{k}: {v} B")

t0 = time.perf_counter()
proof.verify(inst, inputs_a, Transcript(b"nizk_example"), gens)
print(f"NIZK::verify wall {time.perf_counter() - t0:.3f}s")
print("proof verification successful")
