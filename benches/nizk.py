"""NIZK benchmarks (reference benches/nizk.rs): steady-state timings of
prove / verify at 2^10, 2^12, 2^16.

Usage: python benches/nizk.py [--sizes 10 12 16] [--reps 3]
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def timed(fn, reps):
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        out.append(time.perf_counter() - t0)
    return statistics.median(out), r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10, 12, 16])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--inputs", type=int, default=10)
    args = ap.parse_args()

    from spartan_tpu.api import NIZK, NIZKGens, Instance
    from spartan_tpu.core.merlin import Transcript

    for s in args.sizes:
        n = 1 << s
        inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
            n, n, args.inputs, seed=0)
        gens = NIZKGens(n, n, args.inputs)

        t_prove, proof = timed(
            lambda: NIZK.prove(inst, vars_a, inputs_a, gens,
                               Transcript(b"nizk_example")), args.reps)
        print(f"NIZK_prove/{s:>3}  {t_prove:9.4f} s")

        t_ver, _ = timed(
            lambda: proof.verify(inst, inputs_a,
                                 Transcript(b"nizk_example"), gens),
            args.reps)
        print(f"NIZK_verify/{s:>2}  {t_ver:9.4f} s")


if __name__ == "__main__":
    main()
