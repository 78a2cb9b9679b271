"""Probe TPU compile costs under today's axon relay (remote compile?).

Times: backend init, a trivial jit, the win msm_rows kernel at a small
shape, the same at a second shape (incremental compile cost), and
whether /tmp/jax_cache gains TPU entries (persistent cache support).
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

T0 = time.perf_counter()
def t(msg):
    print(f"[tpuprobe +{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)

t("importing jax")
import numpy as np
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception as e:
    t(f"cache config failed: {e}")
import jax.numpy as jnp
t(f"backend={jax.default_backend()} devices={jax.devices()}")

x = jnp.arange(1024, dtype=jnp.uint32)
y = jax.jit(lambda v: (v * 3 + 1).sum())(x)
jax.block_until_ready(y)
t(f"trivial jit done ({int(y)})")

from spartan_tpu.core import ristretto as hri
from spartan_tpu.curve import edwards as ed
from spartan_tpu.curve import msm as msm_mod
from spartan_tpu.ff import limb
import hashlib
rng = np.random.default_rng(0)

pts = [hri.from_uniform_bytes(hashlib.sha512(b"q%d" % i).digest()) for i in range(64)]
gens = ed.from_host(pts)
t("gens on device")

scal = jnp.asarray(limb.ints_to_limbs(
    [int.from_bytes(rng.bytes(31), "little") for _ in range(64)])).reshape(4, 16, 16)
out = msm_mod._msm_rows_win_jit(scal, ed.PointArray(*(c[:16] for c in gens)))
jax.block_until_ready(out.x)
t("win msm_rows (4,16) compile+run done")

t0 = time.perf_counter()
out = msm_mod._msm_rows_win_jit(scal, ed.PointArray(*(c[:16] for c in gens)))
jax.block_until_ready(out.x)
t(f"win msm_rows (4,16) warm: {time.perf_counter()-t0:.3f}s")

scal2 = jnp.asarray(limb.ints_to_limbs(
    [int.from_bytes(rng.bytes(31), "little") for _ in range(128)])).reshape(4, 32, 16)
out2 = msm_mod._msm_rows_win_jit(scal2, ed.PointArray(*(c[:32] for c in gens)))
jax.block_until_ready(out2.x)
t("win msm_rows (4,32) second-shape compile+run done")

import subprocess
n = subprocess.run(["sh", "-c", "ls /tmp/jax_cache 2>/dev/null | wc -l"],
                   capture_output=True, text=True).stdout.strip()
t(f"jax_cache entries now: {n}")
print("TPUPROBE_OK")
