"""Where does the pallas-MSM cold compile go?  AOT-lowers and compiles
each jit unit of msm_rows_pallas separately on the real backend and
prints per-unit compile seconds.

Usage: python artifacts/probe_pallas_compile_parts.py [--l 128] [--r 128]
       [--rc 128] [--lb 8]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

from spartan_tpu.curve import edwards as ed
from spartan_tpu.curve import pallas_msm as pm
from spartan_tpu.ff.limb import NLIMBS

T0 = time.perf_counter()


def log(m):
    print(f"[parts +{time.perf_counter()-T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


def timeit(label, fn, *args, **kw):
    t0 = time.perf_counter()
    lowered = jax.jit(fn, **kw).lower(*args)
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    log(f"{label}: lower {t1-t0:.1f}s  compile {t2-t1:.1f}s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=128)
    ap.add_argument("--r", type=int, default=128)
    ap.add_argument("--rc", type=int, default=128)
    ap.add_argument("--lb", type=int, default=8)
    args = ap.parse_args()
    L, R, RC, LB = args.l, args.r, args.rc, args.lb
    log(f"backend={jax.default_backend()} L={L} R={R} RC={RC} LB={LB}")

    pt = ed.identity((R,))
    sd = jax.ShapeDtypeStruct
    u32 = jnp.uint32

    # 1. table build: one ed.add at (R,)
    timeit("ed.add@(R,)", lambda a, b: ed.add(ed.PointArray(*a),
                                              ed.PointArray(*b)),
           tuple(sd((R, NLIMBS), u32) for _ in range(4)),
           tuple(sd((R, NLIMBS), u32) for _ in range(4)))

    # 2. the Mosaic kernel
    nblk = R // RC
    timeit(f"mosaic kernel RC={RC}",
           lambda s, t: pm._msm_windows_pallas(s, t, LB=LB, RC=RC),
           sd((L, NLIMBS, R), u32),
           tuple(sd((16, pm.H, R), u32) for _ in range(4)))

    # 3. canonicalize at the window-sums shape
    timeit("canonicalize", pm._canonicalize, sd((64, nblk, L, NLIMBS), u32))

    # 4. lane-block reduce
    timeit("reduce_laneblocks",
           lambda w: pm._reduce_laneblocks(w),
           tuple(sd((64, nblk, L, NLIMBS), u32) for _ in range(4)))

    # 5. horner over windows
    timeit("horner_windows",
           lambda w: pm._horner_windows(w),
           tuple(sd((64, L, NLIMBS), u32) for _ in range(4)))


if __name__ == "__main__":
    main()
