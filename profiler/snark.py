"""SNARK profiler (reference profiler/snark.rs:17-62): sweeps instance
sizes, prints hierarchical phase timings (SPARTAN_TPU_PROFILE=1 is
forced on) and zlib-compressed proof sizes.

Usage: python profiler/snark.py [--min 10] [--max 20] [--inputs 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.stdout.reconfigure(line_buffering=True)  # progress visible under redirection
os.environ["SPARTAN_TPU_PROFILE"] = "1"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=int, default=10)
    ap.add_argument("--max", type=int, default=20)
    ap.add_argument("--inputs", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reps", type=int, default=1,
                    help="prove() repetitions; rep >= 2 shows warm "
                         "steady-state phase timings")
    args = ap.parse_args()

    # declare warm intent to the RC auto-policy (curve/pallas_msm.py):
    # with reps > 1 the warm-optimal Mosaic kernel is compiled up front
    # so rep >= 1 reports true steady-state numbers
    os.environ.setdefault("SPARTAN_TPU_EXPECT_REPS", str(args.reps))

    import jax

    from spartan_tpu import serialize as ser
    from spartan_tpu.api import SNARK, SNARKGens, Instance
    from spartan_tpu.core.merlin import Transcript
    from spartan_tpu.utils.timer import Timer

    print(f"backend: {jax.devices()[0].platform} "
          f"({len(jax.devices())} device(s)); "
          f"native host crypto: {__import__('spartan_tpu.native', fromlist=['available']).available()}")

    for s in range(args.min, args.max + 1):
        n = 1 << s
        print(f"\n{'=' * 60}\nprofiler:: SNARK 2^{s} "
              f"(cons={n}, vars={n}, inputs={args.inputs})\n{'=' * 60}")
        t = Timer("produce_synthetic_r1cs")
        inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
            n, n, args.inputs, seed=args.seed)
        t.stop()

        t = Timer("SNARKGens")
        gens = SNARKGens(n, n, args.inputs, n)
        t.stop()

        import time as _time

        t0 = _time.perf_counter()
        comm, decomm = SNARK.encode(inst, gens)
        print(f"SNARK::encode wall {_time.perf_counter() - t0:.3f}s")

        for rep in range(args.reps):
            t0 = _time.perf_counter()
            proof = SNARK.prove(inst, comm, decomm, vars_a, inputs_a, gens,
                                Transcript(b"snark_example"))
            print(f"[rep {rep}] SNARK::prove wall "
                  f"{_time.perf_counter() - t0:.3f}s")

        blob = ser.snark_to_bytes(proof)
        print(f"proof size: {len(blob)} bytes "
              f"({ser.compressed_size(blob)} compressed)")
        rep = ser.snark_size_report(proof)
        assert sum(rep.values()) == len(blob)
        for k, v in rep.items():
            print(f"  len::{k}: {v} B")

        proof.verify(comm, inputs_a, Transcript(b"snark_example"), gens)
        print("proof verification successful")


if __name__ == "__main__":
    main()
