"""Round-5b NIZK 2^20 campaign: BR host rounds (the A/B winner) with
the new warm-intent /4 shrink ladder, RC=256 polycommit, reps=3; then
an in-process decomposition of msm_rows_pallas with REAL fetch syncs
(block_until_ready through the axon relay proved unreliable for
microbenches; a device->host transfer of a slice of the result cannot
lie)."""
import os, sys, time

os.environ["SPARTAN_TPU_PROFILE"] = "1"
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

# ---- msm_rows decomposition with real fetch syncs --------------------
from spartan_tpu.curve import pallas_msm as pm
from spartan_tpu.curve import edwards as ed
from spartan_tpu.ff import fq
import jax.numpy as jnp

G = gens.gens_r1cs_sat.gens_pc.gens.gens_n.device_G  # (1024,) gens
rng = np.random.default_rng(0)
raw = np.frombuffer(rng.bytes(32 * n), dtype=np.uint8).reshape(n, 32).copy()
raw[:, 31] = 0
scal = jnp.asarray(raw.view("<u2").astype(np.uint32)).reshape(1024, 1024, 16)

def fsync(x):
    """Force completion via a tiny d2h of a slice (honest sync)."""
    np.asarray(x[(0,) * (x.ndim - 1)])

def timeit(label, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"decomp::{label}: best {best*1e3:.1f} ms", flush=True)

tab = pm._build_tab(G)
scal_t = jnp.swapaxes(scal, -1, -2)

timeit("full msm_rows_pallas (fetch-sync)",
       lambda: fsync(pm.msm_rows_pallas(scal, G).x))
timeit("kernel only (fetch-sync)",
       lambda: fsync(pm._msm_windows_pallas(scal_t, tab, LB=8, RC=256)[0]))
wins = pm._msm_windows_pallas(scal_t, tab, LB=8, RC=256)
timeit("canonicalize x4 (fetch-sync)",
       lambda: fsync(pm._canonicalize(wins[0])))
canon = tuple(pm._canonicalize(c) for c in wins)
timeit("reduce_laneblocks (fetch-sync)",
       lambda: fsync(pm._reduce_laneblocks(canon)[0]))
red = pm._reduce_laneblocks(canon)
timeit("horner_windows (fetch-sync)",
       lambda: fsync(pm._horner_windows(red).x))
# block_until_ready honesty check on the same op
timeit("horner_windows (block_until_ready)",
       lambda: jax.block_until_ready(pm._horner_windows(red).x))
