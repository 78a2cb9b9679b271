"""Round-5 FLAGSHIP: SNARK at 2^20 — the reference's headline
measurement (README.md:336-388), never before run in this build.

Config: BR host layers + one-program rounds (round-5 defaults), RC
auto under warm intent (RC=256 on R>=1024 commit shapes — required to
fit HBM at the 2^23/2^24 Spark combs; RC=32 below), reps=2
(cold + warm).  Reference, one laptop core: encode 14.264 s, prove
39.130 s, verify 103 ms, proof 141,768 B compressed-reported.
"""
import os, sys, time

os.environ["SPARTAN_TPU_PROFILE"] = "1"
os.environ["SPARTAN_TPU_EXPECT_REPS"] = "2"
# (mul impl: unrolled for phases, loop scoped inside Spark prove)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")
sys.stdout.reconfigure(line_buffering=True)

import jax

from spartan_tpu import serialize as ser
from spartan_tpu.api import SNARK, SNARKGens, Instance
from spartan_tpu.core.merlin import Transcript
from spartan_tpu.utils.timer import Timer

print(f"backend: {jax.devices()[0].platform}")

s = 20
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
t0 = time.perf_counter()
proof = SNARK.prove(inst, comm, decomm, vars_a, inputs_a, gens,
                    Transcript(b"snark_example"))
print(f"[rep 0] SNARK::prove wall {time.perf_counter() - t0:.3f}s")

blob = ser.snark_to_bytes(proof)
print(f"proof size: {len(blob)} bytes "
      f"({ser.compressed_size(blob)} compressed; "
      f"reference 141,768 B)")
rep_sz = ser.snark_size_report(proof)
assert sum(rep_sz.values()) == len(blob)
for k, v in rep_sz.items():
    print(f"  len::{k}: {v} B")

t0 = time.perf_counter()
proof.verify(comm, inputs_a, Transcript(b"snark_example"), gens)
print(f"SNARK::verify wall {time.perf_counter() - t0:.3f}s")
print("proof verification successful")

t0 = time.perf_counter()
proof = SNARK.prove(inst, comm, decomm, vars_a, inputs_a, gens,
                    Transcript(b"snark_example"))
print(f"[rep 1 warm] SNARK::prove wall {time.perf_counter() - t0:.3f}s")
