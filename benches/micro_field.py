"""Microbenchmark: device Fq kernel throughput and layout comparison.

Measures the hot primitives of the prover (fq.mul, sum_mod, the fused
sumcheck round) at 2^20 on whatever backend JAX picks, and compares the
(n, 16) limbs-minor layout against a transposed (16, n) limbs-major
variant to quantify TPU lane utilization.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spartan_tpu.ff import fq, limb

    n = 1 << args.n
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 1 << 63, size=n)
    a = jnp.asarray(limb.ints_to_limbs([int(x) for x in xs]))
    b = jnp.asarray(limb.ints_to_limbs([int(x) | 1 for x in xs]))

    mul = jax.jit(fq.mul)
    t = bench(mul, a, b)
    print(f"fq.mul      (n,16): {t*1e3:8.3f} ms  "
          f"{n/t/1e6:8.1f} Mops/s  {n*16*4*3/t/1e9:6.1f} GB/s eff")

    summ = jax.jit(fq.sum_mod)
    t = bench(summ, a)
    print(f"fq.sum_mod  (n,16): {t*1e3:8.3f} ms  {n/t/1e6:8.1f} Mops/s")

    from spartan_tpu.protocols.sumcheck import _evals_cubic_additive
    t = bench(_evals_cubic_additive, a, b, a, b)
    print(f"cubic evals (n,16): {t*1e3:8.3f} ms  "
          f"(4 tables read, {4*n*16*4/t/1e9:6.1f} GB/s)")

    # --- transposed limbs-major layout --------------------------------
    at = a.T.copy()  # (16, n)
    bt = b.T.copy()

    QL = jnp.asarray(fq.Q_LIMBS)
    NP = jnp.asarray(fq.NPRIME)

    def mul_t(x, y):
        """Montgomery mul in (16, n) layout, limb loops on leading dim."""
        NL = 16
        # wide product: acc[k] over 32 columns, rows are n-lanes
        acc = jnp.zeros((2 * NL + 1, x.shape[1]), dtype=jnp.uint32)
        for i in range(NL):
            p = x[i][None, :] * y  # (16, n)
            acc = acc.at[i:i + NL].add(p & 0xFFFF)
            acc = acc.at[i + 1:i + 1 + NL].add(p >> 16)
        # carry
        def carry(acc):
            d = acc & 0xFFFF
            c = acc >> 16
            c = jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
            s = d + c
            import jax.lax as lax
            g = (s >> 16).astype(jnp.uint32)
            pr = ((s & 0xFFFF) == 0xFFFF).astype(jnp.uint32)
            def comb(aa, bb):
                ga, pa = aa
                gb, pb = bb
                return gb | (pb & ga), pa & pb
            gs, _ = lax.associative_scan(comb, (g, pr), axis=0)
            cin = jnp.concatenate([jnp.zeros_like(gs[:1]), gs[:-1]], axis=0)
            return (s + cin) & 0xFFFF
        tfull = carry(acc)[:2 * NL]
        # m = t_lo * NPRIME mod 2^256
        tlo = tfull[:NL]
        accm = jnp.zeros((NL + 1, x.shape[1]), dtype=jnp.uint32)
        for i in range(NL):
            w = NL - i
            p = tlo[i][None, :] * NP[:w, None]
            accm = accm.at[i:i + w].add(p & 0xFFFF)
            accm = accm.at[i + 1:i + 1 + w].add(p >> 16)
        m = carry(accm)[:NL]
        # m*q
        accq = jnp.zeros((2 * NL + 1, x.shape[1]), dtype=jnp.uint32)
        for i in range(NL):
            p = m[i][None, :] * QL[:, None]
            accq = accq.at[i:i + NL].add(p & 0xFFFF)
            accq = accq.at[i + 1:i + 1 + NL].add(p >> 16)
        mn = carry(accq)[:2 * NL]
        s = carry(
            jnp.concatenate([tfull, jnp.zeros_like(tfull[:1])], axis=0)
            + jnp.concatenate([mn, jnp.zeros_like(mn[:1])], axis=0))
        out = s[NL:2 * NL]
        # cond sub
        gt = out > QL[:, None]
        lt = out < QL[:, None]
        res = jnp.zeros(out.shape[1], dtype=bool)
        ge = jnp.ones(out.shape[1], dtype=bool)
        for k in range(NL):
            ge = jnp.where(gt[k], True, jnp.where(lt[k], False, ge))
        diff = carry(out + (0xFFFF - QL[:, None])
                     + jnp.concatenate([jnp.ones((1, out.shape[1]), jnp.uint32),
                                        jnp.zeros((NL - 1, out.shape[1]), jnp.uint32)]))
        return jnp.where(ge[None, :], diff[:NL], out)

    mul_tj = jax.jit(mul_t)
    t = bench(mul_tj, at, bt)
    print(f"fq.mul      (16,n): {t*1e3:8.3f} ms  "
          f"{n/t/1e6:8.1f} Mops/s  {n*16*4*3/t/1e9:6.1f} GB/s eff")


if __name__ == "__main__":
    main()
