"""Probe v2: dryrun building blocks with the loop-mul CPU default.

Times (cold cache expected):
  1. sharded cubic evals kernel (shard_map)
  2. sharded fold kernel (fold only — smaller than fold_evals)
  3. GSPMD-sharded naive row-MSM (jit with sharded inputs, no shard_map)
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

T0 = time.perf_counter()
def t(msg):
    print(f"[p2 +{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spartan_tpu.ff import fq, limb
from spartan_tpu.parallel import mesh as pmesh
from spartan_tpu.poly import dense
t("imports done")

mesh = pmesh.make_mesh(8)
rng = np.random.default_rng(1)
n = 256
tab_ints = [[int(x) for x in rng.integers(0, 1 << 62, size=n)] for _ in range(4)]
tabs = [dense.from_ints(xs) for xs in tab_ints]
r_m = dense.from_ints([987654321])
t("tables built")

mgr = pmesh.ShardedSumcheckTables(mesh, tabs, "cubic")
es = fq.decode_to_ints(mgr.evals())
t(f"sharded evals done: {[hex(x)[:8] for x in es]}")
mgr.fold(r_m)
t("sharded fold done")
folded = [fq.decode_to_ints(pmesh.unshard_table(T, 8)) for T in mgr.tables]
t("folded tables decoded")

# host oracle for evals + fold
from spartan_tpu.core.field import Q
A, B, C, D = tab_ints
half = n // 2
e0 = sum(A[i] * (B[i] * C[i] % Q - D[i]) for i in range(half)) % Q
r = 987654321
fold_host = [[(lo + r * (hi - lo)) % Q for lo, hi in zip(T[:half], T[half:])]
             for T in tab_ints]
assert folded == fold_host, "fold mismatch"
assert es[0] == e0, "evals mismatch"
t("host oracle checks pass")

# GSPMD-sharded naive row MSM
from spartan_tpu.curve import edwards as ed
from spartan_tpu.curve import msm as msm_mod
from spartan_tpu.core import ristretto as hri
import hashlib
L, R = 8, 4
pts = [hri.from_uniform_bytes(hashlib.sha512(b"pp%d" % i).digest()) for i in range(R)]
ks = [int(x) for x in rng.integers(1, 1 << 61, size=L * R)]
gens = ed.from_host(pts)
scal = jnp.asarray(limb.ints_to_limbs(ks)).reshape(L, R, 16)
shard = NamedSharding(mesh, P("shard"))
scal_sh = jax.device_put(scal, shard)
t("msm inputs placed; compiling GSPMD naive row-MSM")
out = jax.jit(msm_mod._msm_rows_naive_jit)(scal_sh, gens)
jax.block_until_ready(out.x)
t("GSPMD naive row-MSM done")

# oracle
from spartan_tpu.core.edwards import Point
got = ed.to_host(out)
for l in range(L):
    want = Point.identity()
    for i in range(R):
        want = want.add(pts[i].mul(ks[l * R + i]))
    assert hri.encode(got[l]) == hri.encode(want), f"row {l} mismatch"
t("msm oracle checks pass")
print("P2_OK")
