"""Per-round cost breakdown of the shape-stable host-path sumcheck at
2^20 (phase-one shape: 4 tables of 2^21 rows after the Z||(io,1) merge).

Times each component of one round separately:
  - _step_live (fused fold+evals) device execution
  - decode_to_ints fetch of the 3-eval stack
  - host commit_vector (degree-3 poly) + DotProductProof.prove
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.ff import fq, limb
from spartan_tpu.protocols import sumcheck as sc

print("backend:", jax.default_backend(), flush=True)

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 21
N = 1 << LOG_N
rng = np.random.default_rng(3)

def rand_tbl():
    ints = [int.from_bytes(rng.bytes(31), "little") for _ in range(256)]
    base = jnp.asarray(limb.ints_to_limbs(ints))
    reps = N // 256
    return fq.to_mont(jnp.tile(base, (reps, 1)))

tables = tuple(rand_tbl() for _ in range(4))
jax.block_until_ready(tables[0])
half = N // 2
rm = fq.to_mont(jnp.asarray(fq.encode_ints([12345678901234567890])))

# compile
t0 = time.time()
es = sc._evals_br_jit(tables, "cubic")
jax.block_until_ready(es)
t1 = time.time()
tabs, es = sc._step_br(tables, rm, "cubic")
jax.block_until_ready(es)
t2 = time.time()
print(f"compile: evals {t1-t0:.1f}s step {t2-t1:.1f}s", flush=True)

# steady state: reps of the fused step
for rep in range(3):
    t0 = time.time()
    tabs, es = sc._step_br(tabs, rm, "cubic")
    jax.block_until_ready(es)
    t1 = time.time()
    ints = fq.decode_to_ints(es)
    t2 = time.time()
    print(f"[rep {rep}] step_br {t1-t0:.3f}s decode {t2-t1:.3f}s", flush=True)

# host-side per-round crypto (commit_vector deg-3 + dotproduct proof)
from spartan_tpu.commitments import MultiCommitGens
from spartan_tpu.core.merlin import Transcript, RandomTape
from spartan_tpu.protocols.sigma import DotProductProof
from spartan_tpu.protocols.sumcheck import commit_vector_host, _r_mont

gens_1 = MultiCommitGens(1, b"t1")
gens_4 = MultiCommitGens(4, b"t4")
tr = Transcript(b"bench")
tape = RandomTape(b"tape")
coeffs = [int.from_bytes(rng.bytes(31), "little") % fq.Q for _ in range(4)]
a = [int.from_bytes(rng.bytes(31), "little") % fq.Q for _ in range(4)]
tgt = sum(x * y for x, y in zip(coeffs, a)) % fq.Q
t0 = time.time()
for _ in range(3):
    cv = commit_vector_host(coeffs, 7, gens_4)
    DotProductProof.prove(gens_1, gens_4, tr, tape, coeffs, 7, a, tgt, 9)
t1 = time.time()
print(f"host crypto per round: {(t1-t0)/3:.3f}s", flush=True)
