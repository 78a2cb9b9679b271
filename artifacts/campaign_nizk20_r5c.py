"""Round-5c NIZK 2^20 campaign: BR host rounds (the A/B winner) with
the new warm-intent /4 shrink ladder, RC=256 polycommit, reps=3; then
an in-process decomposition of msm_rows_pallas with REAL fetch syncs
(block_until_ready through the axon relay proved unreliable for
microbenches; a device->host transfer of a slice of the result cannot
lie)."""
import os, sys, time

os.environ["SPARTAN_TPU_PROFILE"] = "1"
os.environ["SPARTAN_TPU_ROUND_TRACE"] = "1"
os.environ["SPARTAN_TPU_EXPECT_REPS"] = "3"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")
sys.stdout.reconfigure(line_buffering=True)

import jax
import numpy as np

from spartan_tpu import serialize as ser
from spartan_tpu.api import NIZK, NIZKGens, Instance
from spartan_tpu.core.merlin import Transcript
from spartan_tpu.utils.timer import Timer

print(f"backend: {jax.devices()[0].platform}")

n = 1 << 20
t = Timer("produce_synthetic_r1cs")
inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(n, n, 10, seed=0)
t.stop()
t = Timer("NIZKGens")
gens = NIZKGens(n, n, 10)
t.stop()

proof = None
for rep in range(3):
    t0 = time.perf_counter()
    proof = NIZK.prove(inst, vars_a, inputs_a, gens,
                       Transcript(b"nizk_example"))
    print(f"[rep {rep} br-ladder] NIZK::prove wall "
          f"{time.perf_counter() - t0:.3f}s")

blob = ser.nizk_to_bytes(proof)
print(f"proof size: {len(blob)} bytes "
      f"({ser.compressed_size(blob)} compressed)")
for k, v in ser.nizk_size_report(proof).items():
    print(f"  len::{k}: {v} B")

t0 = time.perf_counter()
proof.verify(inst, inputs_a, Transcript(b"nizk_example"), gens)
print(f"NIZK::verify wall {time.perf_counter() - t0:.3f}s")
print("proof verification successful")

# Final r5 numbers: consolidated one-program rounds (_step_br_io),
# fused MSM tail, RC=256 polycommit, /4 ladder, per-round traces.
