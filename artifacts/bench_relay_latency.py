"""Measure axon relay round-trip latency: tiny dispatch, tiny transfer,
and the real per-round cost components of the stable-rounds prover."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

def t(label, fn, reps=10):
    fn()  # warm/compile
    best = 1e9
    tot = 0.0
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = min(best, dt)
        tot += dt
    print(f"{label}: best {best*1e3:.2f} ms  avg {tot/reps*1e3:.2f} ms",
          flush=True)

x = jnp.ones((8, 16), dtype=jnp.uint32)

@jax.jit
def tiny(x):
    return x + 1

t("tiny dispatch + block", lambda: jax.block_until_ready(tiny(x)))

t("device->host 512B", lambda: np.asarray(x))

big = jnp.ones((1 << 20, 16), dtype=jnp.uint32)

@jax.jit
def touch(v):
    return v + 1

t("full-table elementwise (2^20,16) r+w", lambda: jax.block_until_ready(touch(big)), reps=5)

# real prover-round pieces
from spartan_tpu.ff import fq
from spartan_tpu.protocols import sumcheck as sc

tables4 = tuple(jnp.ones((1 << 20, 16), dtype=jnp.uint32) * jnp.uint32(3)
                for _ in range(4))
r_m = fq.to_mont(jnp.asarray(fq.encode_ints([12345])))

def step():
    tb, es = sc._step_br(tables4, r_m, "cubic")
    jax.block_until_ready(es)

t("_step_br cubic (2^20 x4 tables)", step, reps=5)

es = sc._evals_br_jit(tables4, "cubic")
t("decode_to_ints (3,16)", lambda: fq.decode_to_ints(es), reps=10)

# small MSM (round-poly commit, 4+1 gens) through the commitments path
from spartan_tpu.commitments import MultiCommitGens
from spartan_tpu.core import ristretto as hri

g4 = MultiCommitGens(4, b"bench_g4")
from spartan_tpu import commitments as cm

t("commit 4-vec host", lambda: cm.commit_vector_host([1, 2, 3, 4], 5, g4), reps=5)
