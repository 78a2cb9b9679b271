"""SNARK benchmarks (reference benches/snark.rs): steady-state timings
of encode / prove / verify at 2^10, 2^12, 2^16.

Usage: python benches/snark.py [--sizes 10 12 16] [--reps 3]
Prints one line per (phase, size): median seconds.
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

    from spartan_tpu.api import SNARK, SNARKGens, Instance
    from spartan_tpu.core.merlin import Transcript

    for s in args.sizes:
        n = 1 << s
        inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
            n, n, args.inputs, seed=0)
        gens = SNARKGens(n, n, args.inputs, n)

        t_enc, (comm, decomm) = timed(lambda: SNARK.encode(inst, gens),
                                      args.reps)
        print(f"SNARK_encode/{s:>2}  {t_enc:9.4f} s")

        t_prove, proof = timed(
            lambda: SNARK.prove(inst, comm, decomm, vars_a, inputs_a, gens,
                                Transcript(b"snark_example")), args.reps)
        print(f"SNARK_prove/{s:>3}  {t_prove:9.4f} s")

        t_ver, _ = timed(
            lambda: proof.verify(comm, inputs_a,
                                 Transcript(b"snark_example"), gens),
            args.reps)
        print(f"SNARK_verify/{s:>2}  {t_ver:9.4f} s")


if __name__ == "__main__":
    main()
