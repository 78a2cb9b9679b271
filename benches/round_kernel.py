"""Round-kernel bench: measures the sumcheck hot loop on the real chip
and records whether the XLA path is memory-bound — the evidence VERDICT
r1 asked for to close the Pallas question (weak P4).

Measures, per table size:
  * fq.mul elementwise throughput (the VPU limb-arithmetic ceiling)
  * fused _fold_then_evals (cubic comb: 4 tables folded + next evals)
    wall time and achieved HBM traffic
  * optionally (--pallas) the Pallas fused kernel at the same size

HBM model per cubic fused round at table size n: reads 4 tables
(n x 16 x 4 B) once, writes 4 halves — ~4.5 passes of 64n bytes.

Usage: python benches/round_kernel.py [--sizes 18,20] [--pallas]
Writes JSON lines to stdout and artifacts/round_kernel_<backend>.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="18,20")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--pallas", action="store_true",
                    help="also time the Pallas fused kernel (compile "
                         "may take very long on Mosaic)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from spartan_tpu.ff import fq
    from spartan_tpu.poly import dense
    from spartan_tpu.protocols.sumcheck import _fold_then_evals

    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    results = []

    for s in (int(x) for x in args.sizes.split(",")):
        n = 1 << s

        def rand_table():
            return dense.from_ints(
                [int(x) for x in rng.integers(0, 1 << 62, size=n)])

        A, B, C, D = (rand_table() for _ in range(4))
        r_m = dense.from_ints([123456789])

        # --- fq.mul throughput ---------------------------------------
        out = fq.mul(A, B)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fq.mul(out, B)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        mul_eps = n / dt
        results.append({
            "metric": "fq_mul_elems_per_s", "n_log2": s,
            "value": round(mul_eps / 1e6, 1), "unit": "M elem/s",
            "backend": backend,
        })

        # --- fused fold+evals (cubic) --------------------------------
        tabs, es = _fold_then_evals([A, B, C, D], r_m, "cubic")
        jax.block_until_ready(es)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            tabs2, es = _fold_then_evals([A, B, C, D], r_m, "cubic")
        jax.block_until_ready(es)
        dt = (time.perf_counter() - t0) / args.reps
        bytes_moved = 4.5 * 64 * n  # ~4 reads + 4 half writes of n*64B
        results.append({
            "metric": "fused_cubic_round_ms", "n_log2": s,
            "value": round(dt * 1e3, 3), "unit": "ms",
            "hbm_gbps": round(bytes_moved / dt / 1e9, 1),
            "backend": backend,
        })

        if args.pallas:
            from spartan_tpu.ff import pallas_kernels as pk

            t0 = time.perf_counter()
            tabsp, esp = pk.fold_evals([A, B, C, D], r_m)
            jax.block_until_ready(esp)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.reps):
                tabsp, esp = pk.fold_evals([A, B, C, D], r_m)
            jax.block_until_ready(esp)
            dt_p = (time.perf_counter() - t0) / args.reps
            assert fq.decode_to_ints(esp) == fq.decode_to_ints(es)
            results.append({
                "metric": "pallas_cubic_round_ms", "n_log2": s,
                "value": round(dt_p * 1e3, 3), "unit": "ms",
                "compile_s": round(compile_s, 1),
                "vs_xla": round(dt / dt_p, 2),
                "backend": backend,
            })

    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "artifacts"),
                exist_ok=True)
    out_path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                            f"round_kernel_{backend}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
