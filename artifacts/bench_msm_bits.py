"""Measure bits-MSM vs scan-Pippenger msm_rows at the 2^20 commit shape
(L=1024 rows x R=1024 points) on the real chip."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.curve import edwards as ed, msm as msm_mod
from spartan_tpu.ff import limb

print("backend:", jax.default_backend(), flush=True)

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
L = 1 << (LOG_N // 2)
R = (1 << LOG_N) // L
rng = np.random.default_rng(7)

# random-ish points: k_i * B for small random k via host (cheap: reuse one pt)
from spartan_tpu.core import ristretto as hri, edwards as hed
B = hed.BASEPOINT
pts = [B.mul(int(rng.integers(1, 1 << 62))) for _ in range(64)]
pts = pts * (R // 64)
gens = ed.from_host(pts)
ks = [int.from_bytes(rng.bytes(32), "little") % ((1 << 252)) for _ in range(L * R)]
scal = jnp.asarray(limb.ints_to_limbs(ks)).reshape(L, R, 16)

import sys as _sys
impls = (_sys.argv[2],) if len(_sys.argv) > 2 else ("win",)
for impl in impls:
    os.environ["SPARTAN_TPU_MSM_IMPL"] = impl
    t0 = time.time()
    out = msm_mod.msm_rows(scal, gens)
    _ = np.asarray(out.x)  # force full materialization to host
    t1 = time.time()
    print(f"{impl}: cold {t1-t0:.1f}s", flush=True)
    n = L * R
    for rep in range(3):
        t1 = time.time()
        out = msm_mod.msm_rows(scal, gens)
        _ = np.asarray(out.x[:1])
        jax.block_until_ready(out.x)
        t2 = time.time()
        print(f"{impl} [rep {rep}]: warm {t2-t1:.3f}s "
              f"({n/(t2-t1)/1e6:.2f} M pts/s)", flush=True)
