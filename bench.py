"""Driver benchmark: prints exactly ONE JSON line on stdout.

Metrics (vs BASELINE.md, one i7-1065G7 core):
  * msm_points_per_s_per_chip — the Pedersen polycommit workload
    (README.md:349-354: 2^20 points in 2.7176 s = 385.9k pts/s)
  * nizk_prove_s — NIZK::prove wall-time at 2^n (README.md:413:
    4.5140 s at 2^20; baseline rescaled linearly, the prover is O(n))

CONCURRENT tiers under a wall-clock budget (round-4 redesign).  The
round-3 serial ladder failed structurally: the axon TPU *chip grant*
alone takes ~315 s cold (measured) — longer than any serial slot — and
a CPU-backend NIZK's local XLA compile bill exceeds 240 s on this
1-core box.  So the tiers now run as CONCURRENT subprocesses, each
with its own deadline, and the parent prints the best-vs-baseline
result that completed:

  host   C++ Pippenger MSM (no XLA, no relay; finishes in ~1 min,
         ~0.7x baseline) — the guaranteed floor
  tpu    SELF-SIZING Mosaic row-MSM: pays the chip grant (the one
         unknowable cost: ~10 s warm, ~315 s cold), then picks the
         biggest rung of a measured compile-time ladder that fits the
         remaining budget (2^20 RC=256 ~104x | 2^17 RC=32 59.5x
         measured | 2^14 RC=32 ~3.4x | 2^14 RC=8 ~2.3x) and banks a
         JSON line after every rep — partial results survive the kill
  tpu-retry  launched only if the auto tier dies WITHOUT banking a
         line (crash/relay hiccup): cheap RC=8 compile rides the chip
         grant the dead child's init completed
  tpu-nizk  full NIZK::prove at 2^--n — only when the budget can
         absorb the whole per-process compile bill (>= 2400 s; axon
         cannot persist compiled executables)

The TPU children mostly wait on the remote relay, so they do not
contend with the host tier for this box's single core.

Budget: SPARTAN_TPU_BENCH_BUDGET_S (default 480 s).

Usage: python bench.py [--n LOG2N] [--reps N] [--msm]
       --msm reports the MSM microbench only.
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


def child_nizk(n_log2: int, backend: str, reps: int,
               cold_opt: bool = False) -> None:
    if cold_opt:
        # post-MSM-tier upgrade slot: ride the warm chip grant with the
        # cheapest-compile prover config (RC=8 Mosaic + BR host rounds,
        # 424 s cold / 3.69 s warm at 2^14, PERF.md r4) — the warm-
        # optimal configs cannot fit the leftover budget cold
        os.environ.setdefault("SPARTAN_TPU_PALLAS_RC", "8")
        os.environ.setdefault("SPARTAN_TPU_EXPECT_REPS", "1")
    else:
        # warmup + timed reps = warm intent: the RC auto-policy and the
        # device-resident ZK phases compile their warm-optimal configs
        # in the warmup prove so the timed reps run at steady state
        os.environ.setdefault("SPARTAN_TPU_EXPECT_REPS",
                              str(max(reps + 1, 2)))
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
    import jax

    jax.devices()  # chip grant
    _run_rowmsm(n_log2, r_size, rc, reps)


def _rand_scalar_limbs(n: int):
    """(n, 16) uint32 16-bit-limb array of 248-bit scalars, vectorized
    (a Python int loop takes ~40 s at 2^20)."""
    import numpy as np

    raw = np.frombuffer(np.random.default_rng(0).bytes(32 * n),
                        dtype=np.uint8).reshape(n, 32).copy()
    raw[:, 31] = 0  # 248-bit scalars (< q, canonical)
    return raw.view("<u2").astype(np.uint32)


def _run_rowmsm(n_log2: int, r_size: int, rc: int, reps: int) -> None:
    """Body of the row-MSM tiers; assumes the backend is already
    initialized (chip grant paid).  A JSON line is printed after EVERY
    rep that improves the best, so a partial result survives a
    deadline kill."""
    import hashlib

    import jax
    import jax.numpy as jnp

    from spartan_tpu.core import ristretto as hri
    from spartan_tpu.curve import edwards as ed
    from spartan_tpu.curve import msm as msm_mod

    os.environ["SPARTAN_TPU_PALLAS_RC"] = str(rc)
    n = 1 << n_log2
    R = r_size
    L = n // R
    _progress(f"[child] row-MSM {L}x{R} RC={rc} on {jax.default_backend()}; "
              "deriving generators host-side")
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"bench%d" % i).digest())
           for i in range(R)]
    gens = ed.from_host(pts)
    scalars = jnp.asarray(_rand_scalar_limbs(n)).reshape(L, R, 16)

    import numpy as np

    def _fetch_sync(arr):
        """Force TRUE completion: d2h of one element.  Round-5 finding
        (PERF.md): jax.block_until_ready through the axon relay can
        return before the device work ran, and repeated identical
        calls can be served from a relay-side cache — the round-3/4
        sub-second 2^20 MSM 'measurements' were artifacts of exactly
        that (the honest fetch-synced kernel time is ~8.1 s at 2^20
        RC=256, artifacts/profile_nizk_20_tpu_r5b.log decomp)."""
        np.asarray(arr[(0,) * (arr.ndim - 1)])

    @jax.jit
    def _perturb(s, k):
        # distinct inputs every rep (defeats any relay memoization);
        # keeps limbs 16-bit so scalars stay canonical
        return s ^ (k & jnp.uint32(0x7FFF))

    _progress("[child] warmup row-MSM (pays the Mosaic/XLA compiles)")
    out = msm_mod.msm_rows(scalars, gens)
    _fetch_sync(out.x)
    _progress("[child] compiles done")

    baseline_pps = (1 << 20) / BASELINE_POLYCOMMIT_S
    best = None
    for i in range(reps):
        t0 = time.perf_counter()
        out = msm_mod.msm_rows(_perturb(scalars, jnp.uint32(i + 1)), gens)
        _fetch_sync(out.x)
        dt = time.perf_counter() - t0
        _progress(f"[child] timed row-MSM {i + 1}/{reps} -> {dt:.3f} s")
        if best is None or dt < best:
            best = dt
            pps = n / best
            print(json.dumps({
                "metric": "msm_points_per_s_per_chip",
                "value": round(pps, 1),
                "unit": f"points/s (row-MSM {L}x{R}, polycommit kernel, "
                        f"backend={jax.default_backend()})",
                "vs_baseline": round(pps / baseline_pps, 4),
            }), flush=True)


# Adaptive ladder: (min seconds left AFTER backend init, n_log2, R, RC).
# Cold-path costs measured on the v5e through the axon relay (PERF.md
# round-4 compile ladder + fresh child-process validations): each
# rung's threshold is its measured full cold path + safety margin.
#
# HONEST round-5 expectations (fetch-synced timing; the round-3/4
# sub-second warm claims were async/memoization artifacts, PERF.md):
# the 2^20 RC=256 kernel really runs ~8.1 s warm = ~130 k pts/s =
# ~0.33x the reference core — BELOW the host C++ Pippenger floor
# (~0.69x).  The rungs stay because the chip number is the one this
# tier exists to report; the parent's best-result selection will bank
# the host floor when it wins.
_AUTO_LADDER = [
    (1150, 20, 1024, 256),  # ~850 s cold, ~8.1 s warm (~0.33x honest)
    (380, 17, 32, 32),      # 261-327 s cold; same grid as above (~0.04x)
    (330, 14, 32, 32),      # ~275 s cold (~0.02x honest)
    (0, 14, 8, 8),          # ~145 s cold
]


def child_rowmsm_auto(deadline_s: float, reps: int) -> None:
    """TPU tier that sizes itself: the axon chip GRANT is the one
    unknowable cost (~10 s warm, ~315 s cold, measured) — so pay it
    first, then pick the biggest ladder rung whose measured cold path
    fits the time actually left."""
    _child_env_setup("tpu")
    import jax

    jax.devices()  # chip grant — the adaptive decision waits for this
    left = deadline_s - _elapsed()
    _progress(f"[child] backend up at +{_elapsed():.1f}s "
              f"(grant {'cold' if _elapsed() > 60 else 'warm'}); "
              f"{left:.0f}s of budget left")
    for min_left, n_log2, r_size, rc in _AUTO_LADDER:
        if left >= min_left:
            _run_rowmsm(n_log2, r_size, rc, reps)
            return


def child_host_msm(n_log2: int, reps: int = 2) -> None:
    """Floor tier: the host C++ Pippenger at the reference's own
    polycommit size — no XLA, no relay, finishes in ~1 min cold."""
    import ctypes
    import hashlib

    import numpy as np

    from spartan_tpu.core import ristretto as hri
    from spartan_tpu.native import get_lib

    lib = get_lib()
    n = 1 << n_log2
    if lib is None:  # no compiler: tiny pure-python fallback
        from spartan_tpu.core import edwards as hed

        n = min(n, 1 << 10)
        _progress(f"[child] pure-python MSM over {n} points (no g++)")
        pts = [hri.from_uniform_bytes(hashlib.sha512(b"h%d" % i).digest())
               for i in range(n)]
        import random

        rng = random.Random(0)
        ks = [rng.getrandbits(252) for _ in range(n)]
        t0 = time.perf_counter()
        hed.msm(ks, pts)
        dt = time.perf_counter() - t0
    else:
        _progress(f"[child] host-native Pippenger over 2^{n_log2} points")
        base = hri.from_uniform_bytes(hashlib.sha512(b"bench-host").digest())
        ptbuf = ctypes.create_string_buffer(128 * n)
        lib.spartan_ge_seq_points(base._blob(), n, ptbuf)
        rng = np.random.default_rng(0)
        sc = np.frombuffer(rng.bytes(32 * n), dtype=np.uint8
                           ).reshape(n, 32).copy()
        sc[:, 31] &= 0x0F  # 252-bit scalars, the curve25519 convention
        scb = sc.tobytes()
        out = ctypes.create_string_buffer(128)
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            lib.spartan_ge_msm(ptbuf, scb, n, out)
            times.append(time.perf_counter() - t0)
            _progress(f"[child] msm rep {i + 1}/{reps} -> {times[-1]:.3f} s")
        dt = min(times)
    pps = n / dt
    baseline_pps = (1 << 20) / BASELINE_POLYCOMMIT_S
    print(json.dumps({
        "metric": "msm_points_per_s_per_chip",
        "value": round(pps, 1),
        "unit": f"points/s (N=2^{n_log2}, polycommit workload, "
                f"backend=host-native C++ Pippenger, 1 core)",
        "vs_baseline": round(pps / baseline_pps, 4),
    }), flush=True)


# ---------------------------------------------------------------------------
# Parent: concurrent tiers under the budget
# ---------------------------------------------------------------------------

class _Tier:
    """One tier subprocess with its own absolute deadline."""

    def __init__(self, label: str, child_args: list[str], deadline: float,
                 local_cpu: bool = False):
        self.label = label
        self.deadline = deadline  # absolute, in _elapsed() seconds
        env = dict(os.environ)
        if local_cpu:
            # never arm the axon sitecustomize: CPU XLA compiles must run
            # locally, not through the serial remote-compile relay
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
            env["JAX_PLATFORMS"] = "cpu"
        import tempfile

        self.out_f = tempfile.NamedTemporaryFile("w+", delete=False,
                                                 prefix="bench_out_")
        self.err_f = tempfile.NamedTemporaryFile("w+", delete=False,
                                                 prefix="bench_err_")
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)] + child_args,
            stdout=self.out_f, stderr=self.err_f, env=env)
        _progress(f"tier {label}: launched (deadline +{deadline:.0f}s)")

    def _read(self, f) -> str:
        f.flush()
        with open(f.name) as fh:
            return fh.read()

    def finish(self) -> list[str]:
        """Collect a finished/killed child; return its JSON lines.
        Lines from killed/crashed children count too — each line is a
        complete measurement the child banked before dying."""
        err = self._read(self.err_f)
        for ln in err.splitlines():
            if ln.startswith("[bench"):
                print(ln, file=sys.stderr, flush=True)
        lines = [ln.strip() for ln in self._read(self.out_f).splitlines()
                 if ln.strip().startswith("{")]
        if lines:
            _progress(f"tier {self.label}: {len(lines)} result(s) "
                      f"(rc={self.proc.returncode})")
        else:
            tail = err.strip().splitlines()[-2:]
            _progress(f"tier {self.label}: no result "
                      f"(rc={self.proc.returncode}); tail: {tail}")
        for f in (self.out_f, self.err_f):
            try:
                f.close()
                os.unlink(f.name)
            except OSError:
                pass
        return lines

    def kill(self) -> None:
        try:
            self.proc.kill()
            self.proc.wait(timeout=10)
        except Exception:
            pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=None, help="log2 instance size")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--msm", action="store_true",
                    help="MSM microbench instead of NIZK::prove")
    ap.add_argument("--_child", default=None,
                    help="internal: nizk:<n>:<backend> | rowmsm:<n>:<r>:<rc> "
                         "| rowmsm_auto:<deadline_s> | hostmsm:<n>")
    args = ap.parse_args()

    if args._child:
        parts = args._child.split(":")
        if parts[0] == "nizk":
            child_nizk(int(parts[1]), parts[2], args.reps,
                       cold_opt=len(parts) > 3 and parts[3] == "cold")
        elif parts[0] == "rowmsm":
            child_rowmsm(int(parts[1]), int(parts[2]), int(parts[3]),
                         args.reps)
        elif parts[0] == "rowmsm_auto":
            child_rowmsm_auto(float(parts[1]), args.reps)
        else:
            child_host_msm(int(parts[1]), args.reps)
        return

    budget = _budget()
    _progress(f"budget {budget:.0f}s; mode={'msm' if args.msm else 'nizk'}")
    hard_stop = budget - 20  # parent must print by then

    live: list[_Tier] = []
    results: list[tuple[float, str, str]] = []  # (vs_baseline, line, label)
    have_tpu = os.environ.get("PALLAS_AXON_POOL_IPS") is not None
    tpu_followup_pending = have_tpu

    # floor tier: host C++ Pippenger at the reference's own size
    live.append(_Tier("host-msm 2^20",
                      ["--_child=hostmsm:20", f"--reps={args.reps}"],
                      min(180.0, hard_stop), local_cpu=True))
    if have_tpu:
        # primary TPU tier: self-sizing — after its backend init (the
        # chip grant, the one unknowable cost) it picks the biggest
        # measured ladder rung that fits the time left, and banks a
        # JSON line after every rep (counted even if killed at budget)
        live.append(_Tier("tpu row-MSM auto",
                          [f"--_child=rowmsm_auto:{hard_stop - _elapsed()}",
                           f"--reps={args.reps}"],
                          hard_stop))
    if not args.msm and budget - _elapsed() >= 2400:
        n_tpu = args.n if args.n is not None else 20
        live.append(_Tier(f"tpu nizk 2^{n_tpu}",
                          [f"--_child=nizk:{n_tpu}:tpu",
                           f"--reps={args.reps}"],
                          hard_stop))

    def harvest(t: _Tier) -> None:
        for line in t.finish():
            try:
                results.append((float(json.loads(line)["vs_baseline"]),
                                line, t.label))
            except (ValueError, KeyError):
                _progress(f"tier {t.label}: unparseable JSON dropped")

    while live and _elapsed() < hard_stop:
        time.sleep(1.0)
        for t in list(live):
            if t.proc.poll() is not None:
                live.remove(t)
                harvest(t)
            elif _elapsed() >= t.deadline:
                _progress(f"tier {t.label}: deadline reached, killing")
                t.kill()
                live.remove(t)
                harvest(t)
            else:
                continue
            # adaptive TPU tier finished: pick its follow-up.  Either
            # way the chip grant it paid outlives the client
            # (measured: next-process init ~10 s), so the follow-up
            # rides it.
            if t.label.startswith("tpu row-MSM auto") and \
                    tpu_followup_pending:
                tpu_followup_pending = False
                banked = any(lbl == t.label for _, _, lbl in results)
                left = hard_stop - _elapsed()
                if not banked and left > 160:
                    # died without a result (relay hiccup / crash):
                    # one cheap RC=8 retry
                    live.append(_Tier(
                        "tpu row-MSM 2^14 RC=8 (retry)",
                        ["--_child=rowmsm:14:8:8", f"--reps={args.reps}"],
                        hard_stop))
                elif banked and left > 430 and not args.msm:
                    # MSM floor is in the bank: spend the leftover on
                    # an END-TO-END warm NIZK::prove (the true system
                    # metric; cheapest-compile config, 424 s cold /
                    # 3.69 s warm at 2^14 measured).  A banked prove
                    # line is preferred over MSM lines at selection.
                    live.append(_Tier(
                        "tpu nizk 2^14 (upgrade)",
                        ["--_child=nizk:14:tpu:cold",
                         f"--reps={args.reps}"],
                        hard_stop))

    for t in live:
        _progress(f"tier {t.label}: still running at budget, killing")
        t.kill()
        harvest(t)

    if results:
        # end-to-end prove results at the baseline's own size class
        # (n >= 2^18) outrank kernel-microbench results regardless of
        # ratio: nizk_prove_s is the system metric the baseline states
        # (README.md:413), and a kernel line must not mask a slower
        # prover (VERDICT r4 weak #3).  Small-shape prove upgrades and
        # MSM tiers compete on vs_baseline.
        def rank(r):
            vs, line, _lbl = r
            big_prove = False
            try:
                d = json.loads(line)
                big_prove = (d.get("metric") == "nizk_prove_s"
                             and "2^1" in d.get("unit", "")
                             and any(f"2^{k}" in d["unit"]
                                     for k in (18, 19, 20, 21, 22)))
            except ValueError:
                pass
            return (1 if big_prove and vs > 0 else 0, vs)

        results.sort(key=rank, reverse=True)
        _progress(f"best tier: {results[0][2]} "
                  f"(vs_baseline {results[0][0]:.3f})")
        print(results[0][1], flush=True)
        return
    # absolute floor: every tier failed; report that honestly
    print(json.dumps({
        "metric": "nizk_prove_s",
        "value": -1,
        "unit": "all bench tiers failed within budget (see stderr)",
        "vs_baseline": 0,
    }), flush=True)


if __name__ == "__main__":
    main()
