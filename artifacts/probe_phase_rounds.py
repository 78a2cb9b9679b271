"""Phase-only probe at 2^20: BR ZK sumcheck rounds with per-round
trace, ladder on vs off, in one process (no Mosaic, no compress —
~8 small XLA compiles)."""
import os, sys, time

os.environ["SPARTAN_TPU_ROUND_TRACE"] = "1"
os.environ["SPARTAN_TPU_EXPECT_REPS"] = "4"   # warm intent -> ladder on
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")
sys.stdout.reconfigure(line_buffering=True)

import jax
import numpy as np

from spartan_tpu.commitments import MultiCommitGens
from spartan_tpu.core.merlin import RandomTape, Transcript
from spartan_tpu.poly import dense
from spartan_tpu.protocols.sumcheck import ZKSumcheckInstanceProof

print("backend:", jax.default_backend(), flush=True)

n = 1 << 20
num_rounds = 20
rng = np.random.default_rng(3)

def tab():
    return dense.from_ints([int(x) for x in rng.integers(0, 1 << 61, n)])

perm = None
gens_n = MultiCommitGens(4, b"probe gens n")
gens_1 = MultiCommitGens(1, b"probe gens 1")

for trial in range(4):
    if trial == 2:
        os.environ["SPARTAN_TPU_EXPECT_REPS"] = "1"  # ladder OFF
        print("--- ladder OFF (single shrink) ---", flush=True)
    tables = [tab() for _ in range(4)]
    t0 = time.perf_counter()
    ZKSumcheckInstanceProof._prove_rounds(
        0, 0, num_rounds, tables, None, 3, gens_1, gens_n,
        Transcript(b"probe"), RandomTape(b"tape", seed=trial),
        which="cubic", layout="br")
    print(f"[trial {trial}] phase wall {time.perf_counter() - t0:.2f}s",
          flush=True)
