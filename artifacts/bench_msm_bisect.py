"""Bisect why the composed win-MSM step is 300x slower than its parts."""
import os, sys, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.curve import edwards as ed, msm as msm_mod

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(5)

def t(label, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1e3:.2f} ms   (first {compile_s:.1f}s)", flush=True)
    return out

def rand_pts(shape):
    n = int(np.prod(shape))
    from spartan_tpu.core import edwards as hed
    base = [hed.BASEPOINT.mul(int(rng.integers(1, 1 << 30))) for _ in range(min(n, 16))]
    reps = (n + len(base) - 1) // len(base)
    pts = (base * reps)[:n]
    p = ed.from_host(pts)
    return ed.PointArray(*(c.reshape(*shape, 16) for c in p))

L, R = 128, 1024
gens = rand_pts((R,))
scal = jnp.asarray(rng.integers(0, 1 << 16, size=(L, R, 16), dtype=np.uint32))
v = jnp.asarray(rng.integers(0, 16, size=(L, R), dtype=np.uint32))
acc0 = ed.identity((L,))

# A: table build alone
@jax.jit
def tab_build(gens):
    tab = [ed.identity((R,)), gens]
    for vv in range(2, 16):
        tab.append(ed.add(tab[vv - 1], gens))
    return tuple(tab)

tab = t("A tab_build (14 adds @1024)", tab_build, gens)

# B: select + tree-sum with tab as *inputs*
@jax.jit
def sel_sum(v, tab):
    sel = msm_mod._select16(v, list(tab))
    return msm_mod._tree_sum_rows(sel)

t("B select16+tree_sum (tab input)", sel_sum, v, tab)

# C: full step with tab as inputs (no table build inside)
@jax.jit
def step_tab_input(acc, v, tab):
    sel = msm_mod._select16(v, list(tab))
    s_row = msm_mod._tree_sum_rows(sel)
    acc = ed.double(ed.double(ed.double(ed.double(acc))))
    return ed.add(acc, s_row)

t("C step w/ tab input", step_tab_input, acc0, v, tab)

# D: table build + select only (no tree-sum)
@jax.jit
def build_sel(v, gens):
    tab = [ed.identity((R,)), gens]
    for vv in range(2, 16):
        tab.append(ed.add(tab[vv - 1], gens))
    return msm_mod._select16(v, tab)

t("D build+select16", build_sel, v, gens)

# E: doubles alone at (128,)
@jax.jit
def dbl4(acc):
    return ed.double(ed.double(ed.double(ed.double(acc))))

t("E 4 doubles @(128,)", dbl4, acc0)

# F: bit extraction from scal + select + tree-sum with tab input
from jax import lax
@jax.jit
def extract_sel_sum(scal, tab):
    lm = lax.dynamic_index_in_dim(scal, 3, axis=2, keepdims=False)
    vv = (lm >> jnp.uint32(4)) & 15
    sel = msm_mod._select16(vv, list(tab))
    return msm_mod._tree_sum_rows(sel)

t("F extract+select+sum (tab input)", extract_sel_sum, scal, tab)

# G: table build + select + tree-sum (no acc ops)
@jax.jit
def build_sel_sum(v, gens):
    tab = [ed.identity((R,)), gens]
    for vv in range(2, 16):
        tab.append(ed.add(tab[vv - 1], gens))
    sel = msm_mod._select16(v, tab)
    return msm_mod._tree_sum_rows(sel)

t("G build+select+sum", build_sel_sum, v, gens)
