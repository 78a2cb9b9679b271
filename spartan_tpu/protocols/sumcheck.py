"""Sumcheck protocols (reference src/sumcheck.rs), TPU-shaped.

Per round, the prover evaluates the degree-d round polynomial at
{0,2,3} with one fused device reduction over the halved tables, the
host transcript absorbs the (committed) polynomial and returns the
challenge, and one fused device kernel folds every table
(bound_poly_var_top).  That host<->device cadence — log n round trips,
each transferring a handful of scalars — is the central design
constraint called out in SURVEY.md §3.1.

Non-ZK variant sends the round polys in the clear; the ZK variant
commits them and proves consistency with one DotProductProof per round
(sumcheck.rs:427-776).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..commitments import MultiCommitGens, commit_scalar, commit_vector_host
from ..core import ristretto as hri
from ..core.field import Q
from ..core.merlin import RandomTape, Transcript
from ..curve.msm import vmsm
from ..ff import fq, limb
from ..poly import dense
from ..poly.unipoly import UniPoly
from ..utils.errors import ProofVerifyError
from . import _combs
from .sigma import DotProductProof


def _use_device_prover() -> bool:
    """Device-resident ZK round loops: OPT-IN ONLY
    (SPARTAN_TPU_DEVICE_PROVER=1), measured SLOWER warm than the BR
    host rounds in every regime tried:

    * round 5 A/B at 2^20 on the v5e, same process, warm
      (artifacts/profile_nizk_20_tpu_r5.log): device phases 70 s each
      vs BR host rounds 21-23 s — the per-round on-device Pedersen
      ladders + ristretto compressions (hundreds of sequential tiny
      ops each) cost ~3.5 s/round, far more than the ~0.03 s
      fetch round-trip they avoid; and their traced executables add
      ~1,240 s of per-process compile (rep-0 cold 2,092 s vs 404 s
      for the BR first call in the same process).
    * the ZK rounds are inherently host-coupled (each round's sigma
      proof needs tape blinds), so unlike the non-ZK Spark layers
      there is no all-device win to harvest.

    When a device mesh is active the sharded host-path rounds are used
    regardless (the device transcript is single-chip)."""
    import os

    from ..parallel import context as pctx

    if pctx.get_mesh() is not None:
        return False
    return os.environ.get("SPARTAN_TPU_DEVICE_PROVER", "0") == "1"


def _use_device_nonzk() -> bool:
    """Device-resident NON-ZK round loops (Spark's product layers as
    whole-layer traced dispatches through the device transcript):
    OPT-IN ONLY (SPARTAN_TPU_DEVICE_NONZK=1).

    Round-5 measurement killed the auto-default: at 2^16 the per-layer
    traced executables (one per (width, batch, claims, rand) combo,
    ~33 of them, each containing every round body + STROBE absorbs)
    spent >95 minutes in XLA compile on the axon backend before rep 0
    could finish (artifacts/profile_snark_16_tpu_r5.log, killed), and
    the backend cannot persist executables across processes — every
    fresh prover pays it again.  The BR host layers prove the same
    bytes with ~10 small shape-tiered executables; their per-round
    fetch cost is addressed by the one-program round consolidation
    (_step3_br_io), not by moving the transcript on device.  The
    device-layer code remains for warm-serving processes that prove
    many times behind one compile bill."""
    import os

    from ..parallel import context as pctx

    if pctx.get_mesh() is not None:
        return False
    return os.environ.get("SPARTAN_TPU_DEVICE_NONZK", "0") == "1"


def _to_int(x: jnp.ndarray) -> int:
    return fq.decode_to_ints(x[None])[0]


def _to_ints_stacked(xs) -> list[int]:
    """Decode several () scalars with ONE device->host transfer."""
    return fq.decode_to_ints(jnp.stack(list(xs), axis=0))


from functools import partial


@partial(jax.jit, static_argnums=2)
def _fold_then_evals(tables, r_m, which: str):
    """Fused round step: bind the top variable of every table to the
    previous challenge, then evaluate the next round polynomial — one
    dispatch, one pass over HBM (the fold output feeds the eval reads
    inside the same XLA program).  `which` picks the comb."""
    folded = [dense.bound_var_top(T, r_m) for T in tables]
    if which == "quad":
        es = _evals_quad(*folded)
    elif which == "cubic":
        es = _evals_cubic_additive(*folded)
    else:
        es = _evals_cubic_prod(*folded)
    return folded, jnp.stack(list(es), axis=0)


def _r_mont(r: int) -> jnp.ndarray:
    return fq.to_mont(jnp.asarray(fq.encode_ints([r])))


def _use_stable_rounds() -> bool:
    """Shape-stable host-path rounds over BIT-REVERSED tables: arrays
    keep their full padded shape all phase, so a phase costs TWO small
    XLA compiles (evals-only + fused step) instead of log(n) per-size
    ones.  The axon TPU backend cannot persist compiled executables
    across processes, so per-process compile cost is a first-class
    constraint; on by default off-CPU.
    SPARTAN_TPU_STABLE_ROUNDS=0/1 overrides."""
    import os

    v = os.environ.get("SPARTAN_TPU_STABLE_ROUNDS", "auto")
    if v in ("0", "1"):
        return v == "1"
    return jax.default_backend() != "cpu"


def stable_layout_active() -> bool:
    """True when R1CSProof should build its sumcheck tables in
    bit-reversed layout for the shape-stable round path.  Must be
    decided once, before table construction: the device-resident
    prover, the sharded mesh path, and the CPU halving path all expect
    normal layout."""
    from ..parallel import context as pctx

    return (_use_stable_rounds() and not _use_device_prover()
            and pctx.get_mesh() is None)


# -- bit-reversed-layout round kernels --------------------------------------
#
# With the table stored at bit-reversed logical indices, binding the TOP
# sumcheck variable pairs *adjacent* elements: lo = T[2k], hi = T[2k+1].
# Rounds become pure reshape + elementwise ops — no gather, no
# dynamic-shift roll (a traced-shift jnp.roll lowers to a gather that
# runs ~10 M rows/s on TPU; measured 2.99 s per 2^21 round vs ~ms for
# the streaming form).  The dead upper region stays exactly zero (zero
# folds to zero; zero contributes comb(...)=0 to every eval), so no
# live-length mask is needed and ONE executable serves every round of a
# phase.  The layout itself is free: eq tables are built with reversed
# tau order and SpMV scatter/gather index vectors are bit-reversed on
# the host (see r1cs/shape.py, poly/dense.py).

def _pairs(T: jnp.ndarray):
    N = T.shape[0]
    T2 = T.reshape(N // 2, 2, T.shape[-1])
    return T2[:, 0, :], T2[:, 1, :]


def _evals_br(tables, which: str):
    lo, hi = zip(*(_pairs(T) for T in tables))

    if which == "cubic":
        def comb(a, b, c, d):
            return fq.mul(a, fq.sub(fq.mul(b, c), d))
    else:
        def comb(a, b):
            return fq.mul(a, b)

    e0 = fq.sum_mod(comb(*lo))
    p2 = [fq.sub(fq.add(h, h), l) for h, l in zip(hi, lo)]
    e2 = fq.sum_mod(comb(*p2))
    if which != "cubic":
        return [e0, e2]
    p3 = [fq.add(x2, fq.sub(h, l)) for x2, h, l in zip(p2, hi, lo)]
    e3 = fq.sum_mod(comb(*p3))
    return [e0, e2, e3]


def _fold_br(tables, r: jnp.ndarray):
    """new[k] = T[2k] + r*(T[2k+1] - T[2k]), zero-padded back to N."""
    out = []
    for T in tables:
        lo, hi = _pairs(T)
        f = fq.add(lo, fq.mul(r, fq.sub(hi, lo)))
        out.append(jnp.concatenate([f, jnp.zeros_like(f)], axis=0))
    return out


@partial(jax.jit, static_argnames=("which",))
def _evals_br_jit(tables, which: str):
    return jnp.stack(_evals_br(list(tables), which), axis=0)


# Shrink floor for the stable rounds: tables keep their full padded
# shape until the live region fits the floor, then shrink ONCE.  The
# floor bounds the tail rounds' per-round traffic without adding
# executables for every intermediate size.
_TIER_FLOOR = 1 << 14
_TIER_FACTOR = 4


def _maybe_shrink(tables, live: int):
    """Slice the padded tables down as the live region halves.  Beyond
    `live` the tables are exactly zero (zero folds to zero and
    contributes nothing to the evals), so slicing never drops data.

    Two schedules, picked by process intent (every distinct shape
    costs a fresh _step_br compile, and the axon backend cannot
    persist executables across processes):

    * cold one-shot (default): ONE shrink straight to the floor once
      live fits it — two shapes per phase, the compile-optimal
      schedule.
    * warm intent (SPARTAN_TPU_EXPECT_REPS>1 / SERVING): a /4 tier
      ladder (2^20 -> 2^18 -> 2^16 -> floor).  MEASURED round 5
      (artifacts/profile_nizk_20_tpu_r5.log): with the single-shrink
      schedule a warm 2^20 phase spends 19.4 s folding mostly-dead
      full-width tables (6 of ~20 rounds run at 2^20 width; the
      per-round fetch stall ~0.92 s IS the table math).  The ladder
      caps padded work at ~2.7x the live work for ~2 extra compiles
      per phase — steady-state-optimal."""
    from ..curve.pallas_msm import _warm_intent

    cur = tables[0].shape[0]
    if _warm_intent():
        new = cur
        while (new > _TIER_FLOOR and live <= new // _TIER_FACTOR):
            new //= _TIER_FACTOR
        new = max(new, _TIER_FLOOR)
        if new == cur:
            return tables
        return tuple(T[:new] for T in tables)
    if cur <= _TIER_FLOOR or live > _TIER_FLOOR:
        return tables
    return tuple(T[:_TIER_FLOOR] for T in tables)


@partial(jax.jit, static_argnames=("which",))
def _step_br(tables, r_m, which: str):
    """Fused fold + next-round evals, fixed shapes: ONE executable
    serves every round of a phase."""
    folded = _fold_br(list(tables), r_m)
    es = jnp.stack(_evals_br(folded, which), axis=0)
    return tuple(folded), es


@partial(jax.jit, static_argnames=("which",))
def _step_br_io(tables, r_canon, which: str):
    """Single-program round step: Montgomery-encode the challenge,
    fold, next-round evals, and decode the evals to canonical form all
    inside ONE executable, so a round is exactly one program invocation
    plus one small d2h fetch.  The split form (_r_mont program +
    _step_br program + from_mont program + fetch) pays the relay's
    per-invocation cost three times per round — measured round 5 as
    the width-independent ~0.9 s/round floor of the in-prove phases."""
    rm = fq.to_mont(r_canon)
    folded = _fold_br(list(tables), rm)
    es = jnp.stack(_evals_br(folded, which), axis=0)
    return tuple(folded), fq.from_mont(es)


@partial(jax.jit, static_argnames=("which",))
def _evals_br_io_jit(tables, which: str):
    return fq.from_mont(jnp.stack(_evals_br(list(tables), which), axis=0))


@jax.jit
def _fold_br_io_jit(tables, r_canon):
    return tuple(_fold_br(list(tables), fq.to_mont(r_canon)))


def _decode_canon(es_canon) -> list[int]:
    """Fetch + int-decode of already-canonical limbs (the _io round
    kernels moved from_mont on device); counts as one rt fetch."""
    import time as _time

    from ..utils import rt as _rt

    t0 = _time.perf_counter()
    arr = np.asarray(es_canon)
    _rt.record(_time.perf_counter() - t0)
    return limb.limbs_to_ints(arr)


@jax.jit
def _fold_br_jit(tables, r_m):
    return tuple(_fold_br(list(tables), r_m))


# ---------------------------------------------------------------------------
# Device round kernels
# ---------------------------------------------------------------------------

@jax.jit
def _evals_quad(A: jnp.ndarray, B: jnp.ndarray):
    """Round evals at {0,2} of sum_i A(i)*B(i) (comb = product)."""
    return _combs.evals("quad", (A, B), fq.sum_mod)


@jax.jit
def _evals_cubic_additive(A, B, C, D):
    """Round evals at {0,2,3} of sum_i A*(B*C - D) — phase-1 comb
    (r1csproof.rs:85-89)."""
    return _combs.evals("cubic", (A, B, C, D), fq.sum_mod)


@jax.jit
def _evals_cubic_prod(A, B, C):
    """Round evals at {0,2,3} of sum_i A*B*C (product-tree comb)."""
    return _combs.evals("cubic_prod", (A, B, C), fq.sum_mod)


# ---------------------------------------------------------------------------
# Non-ZK sumcheck (SumcheckInstanceProof, sumcheck.rs:18-61,183-252)
# ---------------------------------------------------------------------------

@dataclass
class SumcheckInstanceProof:
    compressed_polys: list  # list[list[int]]

    def verify(self, claim: int, num_rounds: int, degree_bound: int,
               transcript: Transcript) -> tuple[int, list[int]]:
        e = claim % Q
        r = []
        if len(self.compressed_polys) != num_rounds:
            raise ProofVerifyError("wrong number of rounds")
        for coeffs in self.compressed_polys:
            poly = UniPoly.decompress(coeffs, e)
            if poly.degree() != degree_bound:
                raise ProofVerifyError("degree bound violated")
            if (poly.eval_at_zero() + poly.eval_at_one()) % Q != e:
                raise ProofVerifyError("sum claim mismatch")
            poly.append_to_transcript(b"poly", transcript)
            r_i = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_i)
            e = poly.evaluate(r_i)
        return e, r

    @staticmethod
    def prove_cubic(claim: int, num_rounds: int, polys: list[jnp.ndarray],
                    transcript: Transcript
                    ) -> tuple["SumcheckInstanceProof", list[int], list[int]]:
        """prove_cubic with comb = A*B*C (sumcheck.rs:183-252); ``polys``
        = [A, B, C] device tables, consumed."""
        tables = list(polys)
        e = claim % Q
        r = []
        compressed = []
        es_dev = jnp.stack(list(_evals_cubic_prod(*tables)), axis=0)
        for j in range(num_rounds):
            e0, e2, e3 = fq.decode_to_ints(es_dev)
            poly = UniPoly.from_evals([e0, (e - e0) % Q, e2, e3])
            poly.append_to_transcript(b"poly", transcript)
            r_j = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_j)
            rm = _r_mont(r_j)
            if j + 1 < num_rounds:
                tables, es_dev = _fold_then_evals(tables, rm, "cubic_prod")
            else:
                tables = [dense.bound_var_top(T, rm) for T in tables]
            e = poly.evaluate(r_j)
            compressed.append(poly.compress())
        claims = fq.decode_to_ints(
            jnp.stack([T[0] for T in tables], axis=0))
        return SumcheckInstanceProof(compressed), r, claims


# ---------------------------------------------------------------------------
# ZK sumcheck (ZKSumcheckInstanceProof, sumcheck.rs:64-179,427-776)
# ---------------------------------------------------------------------------

@dataclass
class ZKSumcheckInstanceProof:
    comm_polys: list  # bytes
    comm_evals: list  # bytes
    proofs: list  # DotProductProof

    def verify(self, comm_claim: bytes, num_rounds: int, degree_bound: int,
               gens_1: MultiCommitGens, gens_n: MultiCommitGens,
               transcript: Transcript) -> tuple[bytes, list[int]]:
        if gens_n.n != degree_bound + 1:
            raise ProofVerifyError("generator count != degree bound + 1")
        if len(self.comm_polys) != num_rounds or len(self.comm_evals) != num_rounds:
            raise ProofVerifyError("wrong number of rounds")
        r = []
        for i in range(num_rounds):
            comm_poly = self.comm_polys[i]
            transcript.append_point(b"comm_poly", comm_poly)
            r_i = transcript.challenge_scalar(b"challenge_nextround")
            comm_claim_per_round = comm_claim if i == 0 else self.comm_evals[i - 1]
            comm_eval = self.comm_evals[i]
            transcript.append_point(b"comm_claim_per_round", comm_claim_per_round)
            transcript.append_point(b"comm_eval", comm_eval)
            w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)
            from .sigma import _decompress

            comm_target = hri.encode(vmsm(
                w, [_decompress(comm_claim_per_round), _decompress(comm_eval)]
            ))
            a_sc = [1] * (degree_bound + 1)
            a_sc[0] = 2
            a_eval = [1]
            for _ in range(degree_bound):
                a_eval.append(a_eval[-1] * r_i % Q)
            a = [(w[0] * x + w[1] * y) % Q for x, y in zip(a_sc, a_eval)]
            self.proofs[i].verify(gens_1, gens_n, transcript, a,
                                  comm_poly, comm_target)
            r.append(r_i)
        return self.comm_evals[-1], r

    @staticmethod
    def _prove_rounds(claim: int, blind_claim: int, num_rounds: int,
                      tables: list[jnp.ndarray], evals_fn, degree: int,
                      gens_1: MultiCommitGens, gens_n: MultiCommitGens,
                      transcript: Transcript, tape: RandomTape,
                      which: str | None = None, layout: str | None = None):
        """Shared round loop for prove_quad / prove_cubic_with_additive_term
        (identical structure, sumcheck.rs:428-586 vs 588-776).

        Round cadence: the fused fold+next-evals kernel is dispatched
        (async) as soon as the challenge is known, so the device folds
        round j+1's tables while the host runs round j's sigma proof.

        When a device mesh is active (parallel.context), tables run
        trailing-bit-sharded across it with psum round reductions —
        proof bytes are identical either way."""
        from ..parallel import context as pctx

        mesh = pctx.get_mesh()
        mgr = None
        stable = layout == "br"  # caller built bit-reversed tables
        if mesh is not None and which is not None and not stable:
            from ..parallel.mesh import ShardedSumcheckTables

            mgr = ShardedSumcheckTables(mesh, tables, which)

        blinds_poly = tape.random_vector(b"blinds_poly", num_rounds)
        blinds_evals = tape.random_vector(b"blinds_evals", num_rounds)
        claim_per_round = claim % Q
        comm_claim_per_round = hri.encode(
            commit_scalar(claim_per_round, blind_claim, gens_1))

        r: list[int] = []
        comm_polys: list[bytes] = []
        comm_evals: list[bytes] = []
        proofs: list[DotProductProof] = []

        if mgr is not None:
            es_dev = mgr.evals()
        elif stable:
            tables = tuple(tables)
            live = tables[0].shape[0]
            es_dev = _evals_br_io_jit(tables, which)
        else:
            es_dev = jnp.stack(list(evals_fn(*tables)), axis=0)
        import os as _os
        import time as _time

        trace = _os.environ.get("SPARTAN_TPU_ROUND_TRACE", "0") == "1"
        for j in range(num_rounds):
            t0 = _time.perf_counter()
            es = (_decode_canon(es_dev) if stable and mgr is None
                  else fq.decode_to_ints(es_dev))
            t_dec = _time.perf_counter() - t0
            e0 = es[0]
            evals = [e0, (claim_per_round - e0) % Q] + es[1:]
            poly = UniPoly.from_evals(evals)
            comm_poly = hri.encode(
                commit_vector_host(poly.coeffs, blinds_poly[j], gens_n))
            transcript.append_point(b"comm_poly", comm_poly)
            comm_polys.append(comm_poly)

            r_j = transcript.challenge_scalar(b"challenge_nextround")
            t0 = _time.perf_counter()
            if mgr is not None:
                rm = _r_mont(r_j)
                if j + 1 < num_rounds:
                    es_dev = mgr.fold_evals(rm)
                else:
                    mgr.fold(rm)
            elif stable:
                # one program invocation per round: challenge encode,
                # fold, evals and canonical decode are all inside
                # _step_br_io (see its docstring for the measurement)
                r_canon = limb.int_to_limbs(r_j)
                if j + 1 < num_rounds:
                    tables, es_dev = _step_br_io(tables, r_canon, which)
                    live //= 2  # post-fold live prefix of the new tables
                    tables = _maybe_shrink(tables, live)
                else:
                    tables = _fold_br_io_jit(tables, r_canon)
            elif which is not None and j + 1 < num_rounds:
                rm = _r_mont(r_j)
                tables, es_dev = _fold_then_evals(tables, rm, which)
            else:
                rm = _r_mont(r_j)
                tables = [dense.bound_var_top(T, rm) for T in tables]
            if trace:
                t_disp = _time.perf_counter() - t0
                shape = (tables[0].shape[0] if stable and tables
                         else -1)
                print(f"    [round {j} shape {shape} decode "
                      f"{t_dec*1e3:.1f}ms dispatch {t_disp*1e3:.1f}ms]",
                      flush=True)

            eval_r = poly.evaluate(r_j)
            comm_eval = hri.encode(
                commit_scalar(eval_r, blinds_evals[j], gens_1))
            transcript.append_point(b"comm_claim_per_round", comm_claim_per_round)
            transcript.append_point(b"comm_eval", comm_eval)
            w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)

            target = (w[0] * claim_per_round + w[1] * eval_r) % Q
            blind_sc = blind_claim if j == 0 else blinds_evals[j - 1]
            blind = (w[0] * blind_sc + w[1] * blinds_evals[j]) % Q

            a_sc = [1] * (poly.degree() + 1)
            a_sc[0] = 2
            a_eval = [1]
            for _ in range(poly.degree()):
                a_eval.append(a_eval[-1] * r_j % Q)
            a = [(w[0] * x + w[1] * y) % Q for x, y in zip(a_sc, a_eval)]

            proof, _, _ = DotProductProof.prove(
                gens_1, gens_n, transcript, tape,
                poly.coeffs, blinds_poly[j], a, target, blind)

            proofs.append(proof)
            claim_per_round = eval_r
            comm_claim_per_round = comm_eval
            r.append(r_j)
            comm_evals.append(comm_eval)

        final_claims = fq.decode_to_ints(
            mgr.final_scalars() if mgr
            else jnp.stack([T[0] for T in tables], axis=0))
        return (
            ZKSumcheckInstanceProof(comm_polys, comm_evals, proofs),
            r,
            final_claims,
            blinds_evals[num_rounds - 1],
        )

    @staticmethod
    def prove_quad(claim: int, blind_claim: int, num_rounds: int,
                   poly_A: jnp.ndarray, poly_B: jnp.ndarray,
                   gens_1: MultiCommitGens, gens_n: MultiCommitGens,
                   transcript: Transcript, tape: RandomTape,
                   layout: str | None = None):
        if layout is None and _use_device_prover():
            from .device_prover import zk_sumcheck_phase_device

            return zk_sumcheck_phase_device(
                claim, blind_claim, num_rounds, [poly_A, poly_B],
                "quad", gens_1, gens_n, transcript, tape)
        return ZKSumcheckInstanceProof._prove_rounds(
            claim, blind_claim, num_rounds, [poly_A, poly_B],
            _evals_quad, 2, gens_1, gens_n, transcript, tape, which="quad",
            layout=layout)

    @staticmethod
    def prove_cubic_with_additive_term(
            claim: int, blind_claim: int, num_rounds: int,
            poly_A, poly_B, poly_C, poly_D,
            gens_1: MultiCommitGens, gens_n: MultiCommitGens,
            transcript: Transcript, tape: RandomTape,
            layout: str | None = None):
        if layout is None and _use_device_prover():
            from .device_prover import zk_sumcheck_phase_device

            return zk_sumcheck_phase_device(
                claim, blind_claim, num_rounds,
                [poly_A, poly_B, poly_C, poly_D],
                "cubic", gens_1, gens_n, transcript, tape)
        return ZKSumcheckInstanceProof._prove_rounds(
            claim, blind_claim, num_rounds, [poly_A, poly_B, poly_C, poly_D],
            _evals_cubic_additive, 3, gens_1, gens_n, transcript, tape,
            which="cubic", layout=layout)
