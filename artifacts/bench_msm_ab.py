"""A/B the MSM kernel families on the real chip at the launch shape
(L=128 rows x R=1024 pts = 2^17 points/launch) and extrapolate to 2^20:

  win    — 4-bit windowed Horner, limbs-minor (N,16) layout (current)
  pallas — the Mosaic kernel (VMEM-resident select+tree-sum)

Also microbenches: fp.mul in both layouts, ed.add, tree-sum, select16.
Run order is cheapest-compile first so partial runs still inform.
"""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.curve import edwards as ed, msm as msm_mod
from spartan_tpu.ff import fp25519 as fp, limb

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(5)


def t(label, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: cold {time.time()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{label}: warm {best*1e3:.2f} ms", flush=True)
    return out


def rand_limbs(shape):
    return jnp.asarray(
        rng.integers(0, 1 << 16, size=(*shape, 16), dtype=np.uint32))


def rand_pts(shape):
    n = int(np.prod(shape))
    from spartan_tpu.core import edwards as hed
    base = [hed.BASEPOINT.mul(int(rng.integers(1, 1 << 30)))
            for _ in range(min(n, 16))]
    pts = (base * ((n + 15) // 16))[:n]
    p = ed.from_host(pts)
    return ed.PointArray(*(c.reshape(*shape, 16) for c in p))


# --- layout microbenches (cheap compiles) ---
a = rand_limbs((1 << 20,))
b = rand_limbs((1 << 20,))
fmul = jax.jit(fp.mul)
t("fp.mul (2^20,16) limbs-minor", fmul, a, b)

from spartan_tpu.curve import pallas_msm as pm
f_lazy = pm._FpLazy(jnp.asarray(pm._CONSTS))
at = jnp.swapaxes(a.reshape(1 << 13, 128, 16), -1, -2)  # (8192,16,128)
bt = jnp.swapaxes(b.reshape(1 << 13, 128, 16), -1, -2)
fmul_t = jax.jit(f_lazy.mul)
t("lazy mul (8192,16,128) limb-first", fmul_t, at, bt)

# lazy mul in limbs-minor for a fair lazy-vs-canonical comparison
t("lazy mul (16,2^20) single-block", fmul_t,
  jnp.swapaxes(a, -1, -2)[None], jnp.swapaxes(b, -1, -2)[None])

L, R = 128, 1024
pbig = rand_pts((L, R))
add_j = jax.jit(ed.add)
t("ed.add (128,1024)", add_j, pbig, pbig)

ts_j = jax.jit(msm_mod._tree_sum_rows)
t("tree_sum_rows (128,1024)", ts_j, pbig)

# --- one full launch of each MSM family at (128,1024) ---
scal = jnp.asarray(
    rng.integers(0, 1 << 16, size=(L, R, 16), dtype=np.uint32))
gens = rand_pts((R,))

t("win  launch (128x1024)", msm_mod._msm_rows_win_jit, scal, gens)

try:
    from spartan_tpu.curve.pallas_msm import msm_rows_pallas
    t("pallas launch (128x1024)", lambda s, g: msm_rows_pallas(s, g), scal, gens)
except Exception as e:
    print("pallas launch FAILED:", type(e).__name__, e, flush=True)
