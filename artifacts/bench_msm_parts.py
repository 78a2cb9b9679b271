"""Per-component timing of the win-MSM step on the real chip, plus a
limb-first (limb axis leading) field-mul layout probe."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from spartan_tpu.curve import edwards as ed, msm as msm_mod
from spartan_tpu.ff import fp25519 as fp, fq, limb

print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(5)

def t(label, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)
    return out

def rand_limbs(shape):
    ints = rng.integers(0, 1 << 16, size=(*shape, 16), dtype=np.uint32)
    return jnp.asarray(ints)

def rand_pts(shape):
    n = int(np.prod(shape))
    from spartan_tpu.core import edwards as hed
    base = [hed.BASEPOINT.mul(int(rng.integers(1, 1 << 30))) for _ in range(min(n, 16))]
    reps = (n + len(base) - 1) // len(base)
    pts = (base * reps)[:n]
    p = ed.from_host(pts)
    return ed.PointArray(*(c.reshape(*shape, 16) for c in p))

# --- component timings at the launch shape (L=128, R=1024) ---
L, R = 128, 1024
pbig = rand_pts((L, R))
pflat = ed.PointArray(*(c.reshape(L * R, 16) for c in pbig))

add_j = jax.jit(ed.add)
t("ed.add (128,1024)", add_j, pbig, pbig)
t("ed.add (131072,)", add_j, pflat, pflat)

ts_j = jax.jit(msm_mod._tree_sum_rows)
t("tree_sum_rows (128,1024)", ts_j, pbig)

tab = [ed.identity((R,)) for _ in range(16)]
v = jnp.asarray(rng.integers(0, 16, size=(L, R), dtype=np.uint32))
sel_j = jax.jit(msm_mod._select16)
t("select16 (128,1024)", sel_j, v, tab)

fmul_j = jax.jit(fp.mul)
a = rand_limbs((1 << 20,))
b = rand_limbs((1 << 20,))
t("fp.mul (2^20,16)", fmul_j, a, b)
a2 = rand_limbs((L, R))
t("fp.mul (128,1024,16)", fmul_j, a2, a2)

# --- limb-first layout probe ---
MASK = jnp.uint32(0xFFFF)

def carry_prop_lf(acc):
    d = acc & MASK
    c = acc >> 16
    c_shift = jnp.pad(c[:-1], [(1, 0)] + [(0, 0)] * (acc.ndim - 1))
    s = d + c_shift
    g = (s >> 16).astype(jnp.uint32)
    p = ((s & MASK) == MASK).astype(jnp.uint32)
    def combine(x, y):
        gx, px = x
        gy, py = y
        return gy | (py & gx), px & py
    gs, _ = lax.associative_scan(combine, (g, p), axis=0)
    cin = jnp.pad(gs[:-1], [(1, 0)] + [(0, 0)] * (acc.ndim - 1))
    return (s + cin) & MASK

def mul_wide_lf(a, b):
    na, nb = a.shape[0], b.shape[0]
    acc = jnp.zeros((na + nb + 1, *a.shape[1:]), dtype=jnp.uint32)
    for i in range(na):
        p = a[i] * b
        acc = acc.at[i:i + nb].add(p & MASK)
        acc = acc.at[i + 1:i + 1 + nb].add(p >> 16)
    return carry_prop_lf(acc)[:na + nb]

P_LIMBS_LF = jnp.asarray(limb.int_to_limbs((1 << 255) - 19)).reshape(16, 1)

def fp_reduce_lf(w):  # (32, N) -> (16, N) partial (not exact mod, probe only)
    lo, hi = w[:16], w[16:32]
    acc = lo + hi * jnp.uint32(38)  # 2^256 = 38 mod p... probe arithmetic
    return carry_prop_lf(jnp.concatenate([acc, jnp.zeros((1, *acc.shape[1:]), jnp.uint32)]))[:16]

@jax.jit
def fp_mul_lf(a, b):
    return fp_reduce_lf(mul_wide_lf(a, b))

alf = jnp.transpose(a.reshape(1 << 20, 16))
blf = jnp.transpose(b.reshape(1 << 20, 16))
t("fp_mul_LF (16,2^20)", fp_mul_lf, alf, blf)

# one full win-MSM step at the launch shape
scal = jnp.asarray(rng.integers(0, 1 << 16, size=(L, R, 16), dtype=np.uint32))
gens = rand_pts((R,))

@jax.jit
def one_step(acc, scal, gens):
    tab = [ed.identity((R,)), gens]
    for vv in range(2, 16):
        tab.append(ed.add(tab[vv - 1], gens))
    lm = scal[:, :, 0]
    v = lm & 15
    sel = msm_mod._select16(v, tab)
    s_row = msm_mod._tree_sum_rows(sel)
    acc = ed.double(ed.double(ed.double(ed.double(acc))))
    return ed.add(acc, s_row)

acc0 = ed.identity((L,))
t("one win step (128,1024)", one_step, acc0, scal, gens)
