"""Driver benchmark: prints exactly ONE JSON line on stdout.

Headline metric: NIZK::prove wall-time on a synthetic R1CS instance
(cons = vars = 2^n, 10 inputs) — the reference's README "Performance"
configuration, where NIZK::prove takes 4.5140 s at 2^20 on one
i7-1065G7 core (BASELINE.md).  vs_baseline = baseline_seconds /
our_seconds at the SAME instance size (baseline rescaled linearly from
2^20; the prover is O(n)).

Tiered execution under a wall-clock budget: each tier runs in a
SUBPROCESS with a hard timeout, so a stuck XLA compile or a dead TPU
relay can never leave the driver with no number — the first tier to
finish wins (tiers are ordered best-value-first), and the `unit` field
says which tier ran.

  tier 1  TPU row-MSM 2^14 (the commitment kernel, Mosaic lean body —
          compile-affordable cold; reference polycommit = 2.718 s
          for 2^20 points on one core)
  tier 2  TPU NIZK 2^{--n}        only when the budget can absorb the
          full per-process compile bill (axon cannot cache executables)
  tier 3+ CPU NIZK 2^10 -> 2^12 -> 2^14, smallest FIRST so some
          nizk_prove_s lands before budget death; children run with
          PALLAS_AXON_POOL_IPS popped so CPU XLA compiles run LOCALLY
          (the serial remote-compile relay costs minutes per module —
          the same fix tests/conftest.py applies for pytest)
  last    host-native MSM points/s (C++ path, no XLA at all)

Budget: SPARTAN_TPU_BENCH_BUDGET_S (default 480 s).

Usage: python bench.py [--n LOG2N] [--reps N] [--msm]
       --msm reports the MSM microbench instead.
       --_child TIER is internal (single-tier run, JSON on stdout).
"""

import argparse
import json
import os
import subprocess
import sys
import time

BASELINE_NIZK_PROVE_S = 4.5140   # README.md:413, 2^20, 1 CPU core
BASELINE_POLYCOMMIT_S = 2.7176   # README.md:353-354

_T0 = time.perf_counter()


def _progress(msg: str) -> None:
    # stderr only: stdout must stay the one JSON line the driver parses
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _budget() -> float:
    return float(os.environ.get("SPARTAN_TPU_BENCH_BUDGET_S", "480"))


def _elapsed() -> float:
    return time.perf_counter() - _T0


# ---------------------------------------------------------------------------
# Child: run ONE tier in this process and print its JSON line
# ---------------------------------------------------------------------------

def _child_env_setup(backend: str) -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    # Measured-best prover configuration (PERF.md compile economics):
    # shape-stable host rounds, host-side bullet, no device-resident
    # loop — these are the library defaults now; nothing to override.
    if backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def child_nizk(n_log2: int, backend: str, reps: int) -> None:
    _child_env_setup(backend)
    import jax

    from spartan_tpu.api import NIZK, NIZKGens, Instance
    from spartan_tpu.core.merlin import Transcript

    n = 1 << n_log2
    _progress(f"[child] synthesizing 2^{n_log2} R1CS on {jax.default_backend()}")
    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(n, n, 10, seed=0)
    gens = NIZKGens(n, n, 10)

    _progress("[child] warmup prove (pays XLA compiles / cache loads)")
    NIZK.prove(inst, vars_a, inputs_a, gens, Transcript(b"bench"))

    times = []
    for i in range(reps):
        _progress(f"[child] timed prove {i + 1}/{reps}")
        t0 = time.perf_counter()
        proof = NIZK.prove(inst, vars_a, inputs_a, gens, Transcript(b"bench"))
        times.append(time.perf_counter() - t0)
        _progress(f"[child]   -> {times[-1]:.3f} s")
    best = min(times)

    _progress("[child] verifying")
    proof.verify(inst, inputs_a, Transcript(b"bench"), gens)

    baseline = BASELINE_NIZK_PROVE_S * n / (1 << 20)
    print(json.dumps({
        "metric": "nizk_prove_s",
        "value": round(best, 4),
        "unit": f"s (2^{n_log2} cons/vars, 10 inputs, 1 chip, "
                f"backend={jax.default_backend()})",
        "vs_baseline": round(baseline / best, 4),
    }), flush=True)


def child_rowmsm(n_log2: int, r_size: int, rc: int, reps: int) -> None:
    """TPU tier: the Pedersen commitment kernel (batch row-MSM,
    dense_mlpoly.rs:148-162 analogue) on 2^n points as an
    (L, R) = (2^n / r_size, r_size) block with the Mosaic lane-block
    width pinned to `rc` — r_size/rc select a point on the measured
    compile-time/throughput ladder (PERF.md).  Generators derive
    host-side (native C++ hash-to-point, milliseconds) so the child
    pays only the MSM kernel's own compile."""
    _child_env_setup("tpu")
    import hashlib

    import numpy as np
    import jax
    import jax.numpy as jnp

    from spartan_tpu.core import ristretto as hri
    from spartan_tpu.curve import edwards as ed
    from spartan_tpu.curve import msm as msm_mod
    from spartan_tpu.ff import limb

    os.environ["SPARTAN_TPU_PALLAS_RC"] = str(rc)
    n = 1 << n_log2
    R = r_size
    L = n // R
    rng = np.random.default_rng(0)
    _progress(f"[child] row-MSM {L}x{R} on {jax.default_backend()}; "
              "deriving generators host-side")
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"bench%d" % i).digest())
           for i in range(R)]
    gens = ed.from_host(pts)
    scal_ints = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    scalars = jnp.asarray(limb.ints_to_limbs(scal_ints)).reshape(L, R, 16)

    _progress("[child] warmup row-MSM (pays the Mosaic/XLA compiles)")
    out = msm_mod.msm_rows(scalars, gens)
    jax.block_until_ready(out.x)

    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = msm_mod.msm_rows(scalars, gens)
        jax.block_until_ready(out.x)
        times.append(time.perf_counter() - t0)
        _progress(f"[child] timed row-MSM {i + 1}/{reps} -> {times[-1]:.3f} s")
    best = min(times)
    pps = n / best
    baseline_pps = (1 << 20) / BASELINE_POLYCOMMIT_S
    print(json.dumps({
        "metric": "msm_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": f"points/s (row-MSM {L}x{R}, polycommit kernel, "
                f"backend={jax.default_backend()})",
        "vs_baseline": round(pps / baseline_pps, 4),
    }), flush=True)


def child_host_msm(n_log2: int) -> None:
    """Last-resort tier: the host C++/python MSM — no XLA, finishes in
    seconds no matter what the relay or the compile service is doing."""
    import hashlib

    from spartan_tpu.core import ristretto as hri
    from spartan_tpu.core import edwards as hed

    n = 1 << n_log2
    _progress(f"[child] host-native MSM over {n} points")
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"h%d" % i).digest())
           for i in range(n)]
    import random

    rng = random.Random(0)
    ks = [rng.getrandbits(252) for _ in range(n)]
    t0 = time.perf_counter()
    hed.msm(ks, pts)
    dt = time.perf_counter() - t0
    pps = n / dt
    baseline_pps = (1 << 20) / BASELINE_POLYCOMMIT_S
    print(json.dumps({
        "metric": "msm_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": f"points/s (N=2^{n_log2}, backend=host-native fallback; "
                f"XLA tiers exceeded the bench budget)",
        "vs_baseline": round(pps / baseline_pps, 4),
    }), flush=True)


# ---------------------------------------------------------------------------
# Parent: tier ladder under the budget
# ---------------------------------------------------------------------------

def _tpu_reachable(timeout_s: float) -> bool:
    """Probe the axon TPU tunnel in a SUBPROCESS with a hard timeout:
    when the experimental relay is down, axon backend init retries for
    ~25 minutes, which would read as a bench timeout."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        _progress("no PALLAS_AXON_POOL_IPS: TPU tier skipped")
        return False
    _progress(f"probing TPU relay (timeout {timeout_s:.0f}s)")
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() != 'cpu'"],
            timeout=timeout_s, capture_output=True)
        ok = r.returncode == 0
        _progress(f"TPU relay probe: {'up' if ok else 'down'}")
        return ok
    except subprocess.TimeoutExpired:
        _progress("TPU relay probe timed out")
        return False


def _run_tier(args_list: list[str], timeout_s: float, label: str,
              local_cpu: bool = False) -> str | None:
    """Run one tier as a child; return its stdout JSON line or None.

    local_cpu=True pops PALLAS_AXON_POOL_IPS from the child env so the
    axon sitecustomize never arms and CPU XLA compiles run locally —
    through the serial remote-compile relay a CPU NIZK pays minutes
    per module (the round-3 bench's CPU tiers all timed out on exactly
    this; tests/conftest.py applies the same fix for pytest)."""
    if timeout_s < 10:
        _progress(f"tier {label}: skipped (only {timeout_s:.0f}s left)")
        return None
    _progress(f"tier {label}: starting (timeout {timeout_s:.0f}s)")
    env = dict(os.environ)
    if local_cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        env["JAX_PLATFORMS"] = "cpu"
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args_list,
            timeout=timeout_s, capture_output=True, text=True, env=env)
    except subprocess.TimeoutExpired as e:
        tail = (e.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        _progress(f"tier {label}: TIMEOUT; child tail: "
                  f"{tail.strip().splitlines()[-3:] if tail else '[]'}")
        return None
    for ln in (r.stderr or "").splitlines():
        if ln.startswith("[bench"):
            print(ln, file=sys.stderr, flush=True)
    if r.returncode == 0:
        for ln in (r.stdout or "").strip().splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                _progress(f"tier {label}: OK")
                return ln
    _progress(f"tier {label}: failed rc={r.returncode}; stderr tail: "
              f"{(r.stderr or '').strip().splitlines()[-3:]}")
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None, help="log2 instance size")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--msm", action="store_true",
                    help="MSM microbench instead of NIZK::prove")
    ap.add_argument("--_child", default=None,
                    help="internal: nizk:<n>:<backend> | rowmsm:<n> "
                         "| hostmsm:<n>")
    args = ap.parse_args()

    if args._child:
        parts = args._child.split(":")
        if parts[0] == "nizk":
            child_nizk(int(parts[1]), parts[2], args.reps)
        elif parts[0] == "rowmsm":
            child_rowmsm(int(parts[1]), int(parts[2]), int(parts[3]),
                         args.reps)
        else:
            child_host_msm(int(parts[1]))
        return

    budget = _budget()
    _progress(f"budget {budget:.0f}s; mode={'msm' if args.msm else 'nizk'}")

    # (child_args, frac_of_budget, label, local_cpu)
    tiers: list[tuple[list[str], float, str, bool]] = []
    on_tpu = _tpu_reachable(min(120.0, budget / 4))
    remaining = lambda: budget - _elapsed()  # noqa: E731

    if on_tpu:
        # Best-value first: the commitment row-MSM with the lean Mosaic
        # body is the one TPU tier whose full cold-compile bill fits a
        # default budget (the axon backend cannot persist executables).
        # Measured pallas compile ladder (PERF.md): RC=32 -> 235 s cold,
        # 3 M pts/s warm (~8x baseline); RC=8 -> 135 s cold, 1.5 M pts/s
        # (~4x).  Primary tier RC=32; RC=8 as the in-budget retry.
        n_msm = args.n if (args.n is not None and args.msm) else 14
        tiers.append(([f"--_child=rowmsm:{n_msm}:32:32",
                       f"--reps={args.reps}"],
                      0.72, f"TPU row-MSM 2^{n_msm} RC=32", False))
        tiers.append(([f"--_child=rowmsm:{n_msm}:8:8",
                       f"--reps={args.reps}"],
                      0.45, f"TPU row-MSM 2^{n_msm} RC=8", False))
        # A full TPU NIZK prove only fits an extended budget.
        if not args.msm and remaining() >= 2400:
            n_tpu = args.n if args.n is not None else 20
            tiers.append(([f"--_child=nizk:{n_tpu}:tpu",
                           f"--reps={args.reps}"],
                          0.60, f"TPU nizk 2^{n_tpu}", False))
    if not args.msm:
        # Smallest FIRST: land some nizk_prove_s before budget death.
        cpu_ns = [args.n] if (args.n is not None and not on_tpu) else [10, 12, 14]
        for n_cpu in cpu_ns:
            tiers.append(([f"--_child=nizk:{n_cpu}:cpu",
                           f"--reps={args.reps}"],
                          0.5, f"CPU nizk 2^{n_cpu} (local compiles)", True))

    for child_args, frac, label, local_cpu in tiers:
        out = _run_tier(child_args, min(remaining() - 15, frac * budget),
                        label, local_cpu=local_cpu)
        if out:
            print(out, flush=True)
            return

    # last resort: host-native MSM — never needs XLA
    out = _run_tier(["--_child=hostmsm:12"], max(remaining(), 60),
                    "host-native MSM 2^12")
    if out:
        print(out, flush=True)
        return
    # absolute floor: even the host tier failed; report that honestly
    print(json.dumps({
        "metric": "nizk_prove_s",
        "value": -1,
        "unit": "all bench tiers failed within budget (see stderr)",
        "vs_baseline": 0,
    }), flush=True)


if __name__ == "__main__":
    main()
