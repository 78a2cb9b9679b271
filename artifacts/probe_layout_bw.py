"""Layout bandwidth probe: is the (N, 16) limb-minor layout wasting
TPU lanes?  Times v+1 (r+w) on the same 64 MiB held in different
shapes, plus the BR round-step dataflow in limb-minor vs limb-major."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)

def t(label, fn, reps=5):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); fn(); best = min(best, time.time() - t0)
    print(f"{label}: best {best*1e3:.2f} ms", flush=True)

@jax.jit
def touch(v):
    return v + 1

for shape in [(1 << 20, 16), (1 << 24,), (1 << 17, 128), (16, 1 << 20),
              (1 << 21, 8), (1 << 12, 1 << 12)]:
    big = jnp.ones(shape, dtype=jnp.uint32)
    t(f"touch u32 {shape} (64 MiB)",
      lambda b=big: jax.block_until_ready(touch(b)))

# BR fold+evals dataflow, limb-minor (N,16) vs limb-major (16,N)
from spartan_tpu.ff import fq

N = 1 << 20
minor = tuple(jnp.ones((N, 16), jnp.uint32) for _ in range(4))
major = tuple(jnp.ones((16, N), jnp.uint32) for _ in range(4))

@jax.jit
def fold_minor(tabs, r):
    out = []
    for T in tabs:
        T2 = T.reshape(N // 2, 2, 16)
        lo, hi = T2[:, 0], T2[:, 1]
        out.append(fq.add(lo, fq.mul(r, fq.sub(hi, lo))))
    return out

r_m = fq.to_mont(jnp.asarray(fq.encode_ints([12345])))
t("fold4 limb-minor (2^20,16)",
  lambda: jax.block_until_ready(fold_minor(minor, r_m)))

# pure elementwise mul chain on limb-minor vs limb-major (no REDC):
@jax.jit
def mul_chain(tabs):
    a, b, c, d = tabs
    return a * b + c * d

t("mul_chain limb-minor (2^20,16)",
  lambda: jax.block_until_ready(mul_chain(minor)))
t("mul_chain limb-major (16,2^20)",
  lambda: jax.block_until_ready(mul_chain(major)))
