"""On-chip probe: Pallas row-MSM correctness (small) + timing ladder.

Usage: python artifacts/probe_pallas_tpu.py [--lr L R] [--reps N]
Runs compiled Mosaic (not interpret) on the real TPU.
"""

import argparse
import hashlib
import random
import sys
import time

import jax
import jax.numpy as jnp

from spartan_tpu.core import ristretto as hri
from spartan_tpu.core.edwards import Point
from spartan_tpu.core.field import Q
from spartan_tpu.curve import edwards as ed
from spartan_tpu.curve import pallas_msm
from spartan_tpu.ff import limb

T0 = time.perf_counter()


def log(m):
    print(f"[probe +{time.perf_counter()-T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def rand_points(n, rng):
    return [hri.from_uniform_bytes(
        hashlib.sha512(b"pp%d" % rng.randrange(1 << 30)).digest())
        for _ in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lr", nargs=2, type=int, default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--lb", type=int, default=8)
    ap.add_argument("--rc", type=int, default=256)
    ap.add_argument("--skip-correct", action="store_true")
    ap.add_argument("--lean", type=int, default=None)
    ap.add_argument("--clr", nargs=2, type=int, default=[4, 16],
                    help="correctness-check (L, R)")
    args = ap.parse_args()
    log(f"backend={jax.default_backend()}")
    rng = random.Random(7)

    if not args.skip_correct:
        L, R = args.clr
        pts = rand_points(R, rng)
        gens = ed.from_host(pts)
        ks = [0, 1, 2, Q - 1] + [rng.randrange(Q) for _ in range(L * R - 4)]
        scal = jnp.asarray(limb.ints_to_limbs(ks)).reshape(L, R, 16)
        log(f"correctness: compiling + running L={L} R={R}")
        out = pallas_msm.msm_rows_pallas(scal, gens, LB=args.lb, RC=args.rc, lean=args.lean)
        got = ed.to_host(out)
        for l in range(L):
            want = Point.identity()
            for k, p in zip(ks[l * R:(l + 1) * R], pts):
                want = want.add(p.mul(k))
            assert hri.encode(got[l]) == hri.encode(want), f"row {l}"
        log("correctness OK (compiled Mosaic matches host oracle)")

    if args.lr:
        L, R = args.lr
        log(f"timing: building L={L} R={R} inputs")
        gens = ed.from_host(rand_points(min(R, 64), rng))
        # tile generators to R (derivation cost only; timing unaffected)
        reps = (R + min(R, 64) - 1) // min(R, 64)
        gens = ed.PointArray(*(jnp.tile(c, (reps, 1))[:R] for c in gens))
        ks = [rng.getrandbits(252) for _ in range(L * R)]
        scal = jnp.asarray(limb.ints_to_limbs(ks)).reshape(L, R, 16)
        log("warmup (compiles)")
        t0 = time.perf_counter()
        out = pallas_msm.msm_rows_pallas(scal, gens, LB=args.lb, RC=args.rc, lean=args.lean)
        jax.block_until_ready(out.x)
        log(f"cold {time.perf_counter()-t0:.1f}s")
        for i in range(args.reps):
            t0 = time.perf_counter()
            out = pallas_msm.msm_rows_pallas(scal, gens, LB=args.lb, RC=args.rc, lean=args.lean)
            jax.block_until_ready(out.x)
            dt = time.perf_counter() - t0
            log(f"warm rep {i}: {dt:.3f}s  ({L*R/dt/1e6:.3f} M pts/s)")


if __name__ == "__main__":
    main()
