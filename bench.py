"""Driver benchmark: prints ONE JSON line.

Headline metric: MSM throughput (points/s/chip) on the device JAX
backend — the kernel every Spartan commitment reduces to.  Baseline:
the reference's witness polycommit at 2^20 takes 2.7176 s on one CPU
core (BASELINE.md), i.e. 385,875 points/s.

Usage: python bench.py [--n LOG2N] [--c WINDOW]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=14, help="log2 #points")
    ap.add_argument("--c", type=int, default=8, help="Pippenger window bits")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from spartan_tpu.core import ristretto as hri
    from spartan_tpu.curve import edwards as ed
    from spartan_tpu.curve import msm as msm_mod
    from spartan_tpu.ff import limb

    n = 1 << args.n
    rng = np.random.default_rng(0)

    # random points: one base point, randomized via cheap device doublings
    # of distinct scalar multiples (avoids slow host generation)
    base = hri.decode(hri.BASEPOINT_BYTES)
    seed_scalars = jnp.asarray(
        limb.ints_to_limbs([int(x) | 1 for x in rng.integers(1, 1 << 63, size=n)])
    )
    base_dev = ed.from_host([base] * 1)
    base_tiled = ed.PointArray(*(jnp.tile(c, (n, 1)) for c in base_dev))
    pts = ed.scalar_mul(base_tiled, seed_scalars)
    jax.block_until_ready(pts.x)

    scalars = jnp.asarray(
        limb.ints_to_limbs(
            [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
        )
    )

    # warmup/compile
    out = msm_mod.msm(scalars, pts, c=args.c)
    jax.block_until_ready(out.x)

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = msm_mod.msm(scalars, pts, c=args.c)
        jax.block_until_ready(out.x)
        times.append(time.perf_counter() - t0)

    best = min(times)
    pps = n / best
    baseline_pps = (1 << 20) / 2.7176  # reference polycommit rate, 1 CPU core
    print(json.dumps({
        "metric": "msm_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": f"points/s (N=2^{args.n}, c={args.c}, backend={jax.default_backend()})",
        "vs_baseline": round(pps / baseline_pps, 3),
    }))


if __name__ == "__main__":
    main()
