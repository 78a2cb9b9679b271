"""Compare XLA compile time + runtime of mul_wide formulations (CPU).

1. current unrolled schoolbook (.at[].add x32)
2. fori_loop + roll (compact graph)
3. stacked-shift f32 8-bit limbs
Then: the cubic evals comb built on each.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

T0 = time.perf_counter()
def t(msg):
    print(f"[mul +{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import lax

from spartan_tpu.ff import fq, limb
from spartan_tpu.ff.limb import NLIMBS, LIMB_MASK

B = 1024
rng = np.random.default_rng(0)
xs = [int.from_bytes(rng.bytes(31), "little") for _ in range(B)]
ys = [int.from_bytes(rng.bytes(31), "little") for _ in range(B)]
a = jnp.asarray(limb.ints_to_limbs(xs))
b = jnp.asarray(limb.ints_to_limbs(ys))


def timed_compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    c = lowered.compile()
    t(f"{name}: compile {time.perf_counter()-t0:.2f}s")
    out = c(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = c(*args)
    jax.block_until_ready(out)
    t(f"{name}: run {(time.perf_counter()-t0)/20*1e3:.3f} ms")
    return out


# 1. current
o1 = timed_compile("schoolbook mul_wide", limb.mul_wide, a, b)

# 2. fori_loop + roll
def mul_wide_loop(x, y):
    n = x.shape[-1]
    wide = 2 * n + 1
    ypad = limb.pad_limbs(y, wide)

    def body(i, acc):
        xi = lax.dynamic_index_in_dim(x, i, axis=-1, keepdims=True)
        p = xi * ypad  # (..., wide); only first n entries nonzero
        plo = jnp.roll(p & LIMB_MASK, i, axis=-1)
        phi = jnp.roll(p >> 16, i + 1, axis=-1)
        return acc + plo + phi

    acc = jnp.zeros(x.shape[:-1] + (wide,), jnp.uint32)
    acc = lax.fori_loop(0, n, body, acc)
    return limb.carry_prop(acc)[..., : 2 * n]

o2 = timed_compile("fori+roll mul_wide", mul_wide_loop, a, b)
assert np.array_equal(np.asarray(o1), np.asarray(o2)), "loop mismatch"

# 3. stacked-shift f32 on 8-bit limbs
def to8(x):
    # (..., 16) u32 16-bit limbs -> (..., 32) 8-bit limbs
    lo = x & 0xFF
    hi = (x >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).reshape(*x.shape[:-1], 2 * x.shape[-1])

def from8_cols(cols):
    # (..., 64) u32 8-bit limb columns (already carried) -> (..., 32) 16-bit
    ev = cols[..., 0::2]
    od = cols[..., 1::2]
    return ev + (od << 8)

def mul_wide_f32(x, y):
    n8 = 2 * x.shape[-1]
    x8 = to8(x).astype(jnp.float32)
    y8 = to8(y).astype(jnp.float32)
    wide = 2 * n8  # 64 cols (63 + spare)
    ypad = jnp.pad(y8, [(0, 0)] * (y8.ndim - 1) + [(0, wide - n8)])
    sh = jnp.stack([jnp.roll(ypad, i, axis=-1) for i in range(n8)], axis=-2)
    # (..., 32, 64) f32; cols sums < 2^21 exact in f32
    cols = jnp.sum(x8[..., :, None] * sh, axis=-2)
    colsu = cols.astype(jnp.uint32)
    # carry-normalize 8-bit columns (values < 2^21): reuse carry_prop on
    # 16-bit pairs after recombining
    c16 = from8_cols(colsu)  # (..., 32) values < 2^30
    return limb.carry_prop(c16)[..., : n8]

o3 = timed_compile("f32 stacked-shift mul_wide", mul_wide_f32, a, b)
assert np.array_equal(np.asarray(o1), np.asarray(o3)), "f32 mismatch"

# full fq.mul built on each
def fqmul_current(x, y):
    return fq.mul(x, y)

def redc_loop(tt):
    t_lo = tt[..., :NLIMBS]
    m = mul_wide_loop(t_lo, jnp.asarray(fq.NPRIME))[..., :NLIMBS]
    mn = mul_wide_loop(m, jnp.asarray(fq.Q_LIMBS))
    acc = limb.pad_limbs(tt, 33) + limb.pad_limbs(mn, 33)
    s = limb.carry_prop(acc)
    out = s[..., NLIMBS: 2 * NLIMBS]
    return limb.cond_sub(out, jnp.asarray(fq.Q_LIMBS))

def fqmul_loop(x, y):
    return redc_loop(mul_wide_loop(x, y))

am = fq.to_mont(a)
bm = fq.to_mont(b)
o4 = timed_compile("fq.mul current", fqmul_current, am, bm)
o5 = timed_compile("fq.mul loop", fqmul_loop, am, bm)
assert np.array_equal(np.asarray(o4), np.asarray(o5)), "fqmul mismatch"
print("MULPROBE_OK")

# 4. static-pad schoolbook (no dynamic-update-slice, no rolls)
def mul_wide_pad(x, y):
    n = x.shape[-1]
    wide = 2 * n + 1

    def pad_at(p, off):
        padc = [(0, 0)] * (p.ndim - 1) + [(off, wide - off - p.shape[-1])]
        return jnp.pad(p, padc)

    acc = None
    for i in range(n):
        p = x[..., i:i+1] * y
        term = pad_at(p & LIMB_MASK, i) + pad_at(p >> 16, i + 1)
        acc = term if acc is None else acc + term
    return limb.carry_prop(acc)[..., : 2 * n]

o6 = timed_compile("static-pad mul_wide", mul_wide_pad, a, b)
assert np.array_equal(np.asarray(o1), np.asarray(o6)), "pad mismatch"

def redc_pad(tt):
    t_lo = tt[..., :NLIMBS]
    m = mul_wide_pad(t_lo, jnp.asarray(fq.NPRIME))[..., :NLIMBS]
    mn = mul_wide_pad(m, jnp.asarray(fq.Q_LIMBS))
    acc = limb.pad_limbs(tt, 33) + limb.pad_limbs(mn, 33)
    s = limb.carry_prop(acc)
    out = s[..., NLIMBS: 2 * NLIMBS]
    return limb.cond_sub(out, jnp.asarray(fq.Q_LIMBS))

def fqmul_pad(x, y):
    return redc_pad(mul_wide_pad(x, y))

o7 = timed_compile("fq.mul static-pad", fqmul_pad, am, bm)
assert np.array_equal(np.asarray(o4), np.asarray(o7)), "fqmul pad mismatch"

# mul_low with static pads
def mul_low_pad(x, y, n=NLIMBS):
    def pad_at(p, off, wide):
        padc = [(0, 0)] * (p.ndim - 1) + [(off, wide - off - p.shape[-1])]
        return jnp.pad(p, padc)
    acc = None
    for i in range(n):
        width = n - i
        p = x[..., i:i+1] * y[..., :width]
        term = pad_at(p & LIMB_MASK, i, n + 1) + pad_at(p >> 16, i + 1, n + 1)
        acc = term if acc is None else acc + term
    return limb.carry_prop(acc)[..., :n]

def redc_pad2(tt):
    t_lo = tt[..., :NLIMBS]
    m = mul_low_pad(t_lo, jnp.asarray(fq.NPRIME))
    mn = mul_wide_pad(m, jnp.asarray(fq.Q_LIMBS))
    acc = limb.pad_limbs(tt, 33) + limb.pad_limbs(mn, 33)
    s = limb.carry_prop(acc)
    out = s[..., NLIMBS: 2 * NLIMBS]
    return limb.cond_sub(out, jnp.asarray(fq.Q_LIMBS))

def fqmul_pad2(x, y):
    return redc_pad2(mul_wide_pad(x, y))

o8 = timed_compile("fq.mul static-pad+mullow", fqmul_pad2, am, bm)
assert np.array_equal(np.asarray(o4), np.asarray(o8)), "fqmul pad2 mismatch"
print("MULPROBE2_OK")
