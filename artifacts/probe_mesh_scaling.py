"""Multi-chip MSM scaling probe: msm_rows_sharded at D = 1/2/4/8 on
the virtual CPU mesh (xla_force_host_platform_device_count).

HONEST FRAMING: all D virtual devices share this box's ONE physical
core, so wall time cannot show real speedup — total work is constant
and partitions execute serially.  What this DOES measure is the
*partition overhead* of the GSPMD row-MSM (collective-free by design):
T(D) / T(1).  Overhead near 1.0 means the sharded program adds no
extra compute/copies, i.e. on real chips — where partitions run
concurrently — per-chip time would be T(1)/D and scaling efficiency
T(1) / (D * T_perchip(D)) = 1 / overhead.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python artifacts/probe_mesh_scaling.py [--l 64] [--r 64] [--reps 3]
"""

import argparse
import hashlib
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

T0 = time.perf_counter()


def log(m):
    print(f"[scale +{time.perf_counter()-T0:7.1f}s] {m}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=64)
    ap.add_argument("--r", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from spartan_tpu.core import ristretto as hri
    from spartan_tpu.core.edwards import Point
    from spartan_tpu.curve import edwards as ed
    from spartan_tpu.ff import limb
    from spartan_tpu.parallel import mesh as pmesh

    L, R = args.l, args.r
    n = L * R
    rng = np.random.default_rng(11)
    log(f"{len(jax.devices())} devices; row-MSM {L}x{R} = 2^"
        f"{n.bit_length()-1} points")
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"sc%d" % i).digest())
           for i in range(R)]
    gens = ed.from_host(pts)
    ks = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    scal = jnp.asarray(limb.ints_to_limbs(ks)).reshape(L, R, 16)

    # host oracle on a few rows
    oracle_rows = [0, L // 2, L - 1]
    want = {}
    for l in oracle_rows:
        acc = Point.identity()
        for k, p in zip(ks[l * R:(l + 1) * R], pts):
            acc = acc.add(p.mul(k))
        want[l] = hri.encode(acc)

    results = {}
    for d in (1, 2, 4, 8):
        if len(jax.devices()) < d:
            log(f"D={d}: skipped (not enough devices)")
            continue
        mesh = pmesh.make_mesh(d)
        log(f"D={d}: compiling + warmup")
        out = pmesh.msm_rows_sharded(scal, gens, mesh)
        jax.block_until_ready(out.x)
        got = ed.to_host(
            ed.PointArray(*(np.asarray(c)[oracle_rows] for c in out)))
        for i, l in enumerate(oracle_rows):
            assert hri.encode(got[i]) == want[l], f"D={d} row {l}"
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = pmesh.msm_rows_sharded(scal, gens, mesh)
            jax.block_until_ready(out.x)
            times.append(time.perf_counter() - t0)
        best = min(times)
        results[d] = best
        log(f"D={d}: {best:.3f} s warm ({n/best/1e3:.1f} K pts/s total, "
            f"correct on {len(oracle_rows)} oracle rows)")

    if 1 in results:
        for d, t in sorted(results.items()):
            ov = t / results[1]
            log(f"D={d}: overhead T(D)/T(1) = {ov:.3f} "
                f"(projected real-chip scaling efficiency {1/ov:.1%})")


if __name__ == "__main__":
    main()
