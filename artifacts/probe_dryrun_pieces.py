"""Timing probe for dryrun_multichip building blocks on the CPU backend.

Measures, cold (run with a cleared /tmp/jax_cache to mimic the driver):
  1. import + 8-device mesh construction
  2. sharded cubic sumcheck evals kernel (shard_map, compile + run)
  3. sharded fold+evals kernel
  4. one flat-ladder scalar_mul compile at the 2^10 floor (device 0)
  5. the same ladder launched on device 1 (persistent-cache hit?)
  6. masked row-sum module
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
    print(f"[probe +{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)

t("importing jax")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
t(f"jax up, {len(jax.devices())} devices")

from spartan_tpu.ff import fq, limb
from spartan_tpu.parallel import mesh as pmesh
from spartan_tpu.poly import dense
t("spartan imports done")

mesh = pmesh.make_mesh(8)
rng = np.random.default_rng(1)
n = 256
tabs = [dense.from_ints([int(x) for x in rng.integers(0, 1 << 62, size=n)]) for _ in range(4)]
r_m = dense.from_ints([987654321])
t("tables built")

mgr = pmesh.ShardedSumcheckTables(mesh, tabs, "cubic")
es = fq.decode_to_ints(mgr.evals())
t("sharded evals done (compile+run)")
es2 = fq.decode_to_ints(mgr.fold_evals(r_m))
t("sharded fold+evals done (compile+run)")

from spartan_tpu.curve import edwards as ed
from spartan_tpu.curve import msm as msm_mod
from spartan_tpu.core import ristretto as hri
import hashlib
pts = [hri.from_uniform_bytes(hashlib.sha512(b"p%d" % i).digest()) for i in range(8)]
ks = [int(x) for x in rng.integers(1, 1 << 61, size=8)]
dpts = ed.from_host(pts)
s = jnp.asarray(limb.ints_to_limbs(ks))
t("msm inputs ready; compiling flat ladder on device 0")

devs = jax.devices()
s0 = jax.device_put(s, devs[0])
p0 = ed.PointArray(*(jax.device_put(c, devs[0]) for c in dpts))
out = msm_mod.scalar_mul_padded(p0, s0)
jax.block_until_ready(out.x)
t("ladder device 0 done")

s1 = jax.device_put(s, devs[1])
p1 = ed.PointArray(*(jax.device_put(c, devs[1]) for c in dpts))
out1 = msm_mod.scalar_mul_padded(p1, s1)
jax.block_until_ready(out1.x)
t("ladder device 1 done (cache hit?)")

# masked row sum (one add instance)
prods = ed.PointArray(*(jnp.broadcast_to(c[None], (1,) + c.shape) for c in out))
rs = msm_mod._sum_rows_masked_jit(prods)
jax.block_until_ready(rs.x)
t("masked row-sum done")
print("PROBE_OK")
