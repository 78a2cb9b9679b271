"""Reference-scale test tier (marked slow; VERDICT r1 next #8).

Mirrors the sizes the Rust reference tests at: NIZK round-trip at 1024
vars/cons (r1csproof.rs:559-603), Spark eval proof on 256x256 batch-3
matrices (sparse_mlpoly.rs:1596-1667), DotProductProofLog at n=1024
(nizk/mod.rs:580-736) — plus a non-square Spark case to exercise the
`_equalize` unequal rx/ry padding path (sparse_mlpoly.rs:1429-1445)
that square instances never hit.
"""

import random

import pytest

from spartan_tpu.core.field import Q
from spartan_tpu.core.merlin import RandomTape, Transcript
from spartan_tpu.utils.errors import ProofVerifyError

pytestmark = pytest.mark.slow

rng = random.Random(0x5CA1E)


def test_nizk_roundtrip_1024():
    from spartan_tpu import serialize as ser
    from spartan_tpu.api import NIZK, NIZKGens, Instance

    n = 1024
    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
        n, n, 10, seed=101)
    gens = NIZKGens(n, n, 10)
    proof = NIZK.prove(inst, vars_a, inputs_a, gens,
                       Transcript(b"nizk_1024"), _tape_seed=23)
    blob = ser.nizk_to_bytes(proof)
    proof2 = ser.nizk_from_bytes(blob)
    proof2.verify(inst, inputs_a, Transcript(b"nizk_1024"), gens)

    bad_inputs = [(x + 1) % Q for x in inputs_a.assignment]
    from spartan_tpu.api import Assignment

    with pytest.raises(ProofVerifyError):
        proof2.verify(inst, Assignment(bad_inputs),
                      Transcript(b"nizk_1024"), gens)


def _random_sparse(num_vars_x, num_vars_y, nnz, seed):
    from spartan_tpu.r1cs.shape import SparseMatPolynomial

    r = random.Random(seed)
    seen = set()
    entries = []
    while len(entries) < nnz:
        row = r.randrange(1 << num_vars_x)
        col = r.randrange(1 << num_vars_y)
        if (row, col) in seen:
            continue
        seen.add((row, col))
        entries.append((row, col, r.randrange(Q)))
    return SparseMatPolynomial.from_entries(num_vars_x, num_vars_y, entries)


def _spark_roundtrip(num_vars_x, num_vars_y, num_nz, label):
    from spartan_tpu.protocols.spark import (
        SparseMatPolyCommitmentGens,
        SparseMatPolyEvalProof,
        multi_commit,
    )
    from spartan_tpu.r1cs.shape import SparseMatPolynomial

    polys = [_random_sparse(num_vars_x, num_vars_y, num_nz, s)
             for s in (11, 12, 13)]
    gens = SparseMatPolyCommitmentGens(
        label, num_vars_x, num_vars_y, num_nz, 3)
    comm, dense_rep = multi_commit(polys, gens)

    rx = [rng.randrange(Q) for _ in range(num_vars_x)]
    ry = [rng.randrange(Q) for _ in range(num_vars_y)]
    evals = SparseMatPolynomial.multi_evaluate(polys, rx, ry)

    pt = Transcript(b"spark_scale")
    proof = SparseMatPolyEvalProof.prove(
        dense_rep, rx, ry, evals, gens, pt, RandomTape(b"p", seed=3))
    vt = Transcript(b"spark_scale")
    proof.verify(comm, rx, ry, evals, gens, vt)


def test_spark_256x256_batch3():
    """The reference's exact config: 256x256, nnz=256, batch of 3."""
    _spark_roundtrip(8, 8, 256, b"gens_spark_256")


def test_spark_nonsquare_equalize():
    """64 x 1024 forces len(rx)=6 != len(ry)=10 through _equalize."""
    _spark_roundtrip(6, 10, 128, b"gens_spark_eq")


def test_device_prover_parity_256(monkeypatch):
    """Device-resident rounds vs host rounds at n=256 (16 rounds
    total across both phases): proof bytes must match exactly.  Round-1
    parity coverage stopped at n=16 (VERDICT weak #6); this exercises
    the masked live-length fold (_evals_live/_fold_live) deeper, where
    the (idx+half) % N wrap/mask interplay could bite."""
    from spartan_tpu import serialize as ser
    from spartan_tpu.api import NIZK, NIZKGens, Instance

    n = 256
    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
        n, n, 5, seed=303)
    gens = NIZKGens(n, n, 5)

    monkeypatch.setenv("SPARTAN_TPU_DEVICE_PROVER", "0")
    host = ser.nizk_to_bytes(NIZK.prove(
        inst, vars_a, inputs_a, gens, Transcript(b"dp256"), _tape_seed=41))

    monkeypatch.setenv("SPARTAN_TPU_DEVICE_PROVER", "1")
    dev = ser.nizk_to_bytes(NIZK.prove(
        inst, vars_a, inputs_a, gens, Transcript(b"dp256"), _tape_seed=41))

    assert dev == host
    ser.nizk_from_bytes(dev).verify(
        inst, inputs_a, Transcript(b"dp256"), gens)


def test_dotproduct_log_1024():
    from spartan_tpu.poly import dense
    from spartan_tpu.protocols.dotproduct_log import DotProductProofLog
    from spartan_tpu.protocols.sigma import DotProductProofGens

    n = 1024
    a = [rng.randrange(Q) for _ in range(n)]
    x = [rng.randrange(Q) for _ in range(n)]
    y = sum(ai * xi for ai, xi in zip(a, x)) % Q
    gens = DotProductProofGens(n, b"test-dpl-1024")
    tape = RandomTape(b"tape", seed=9)
    pt = Transcript(b"dpl1024")
    proof, Cx, Cy = DotProductProofLog.prove(
        gens, pt, tape, dense.from_ints(x), rng.randrange(Q),
        dense.from_ints(a), a, y, rng.randrange(Q))
    vt = Transcript(b"dpl1024")
    proof.verify(n, gens, vt, a, Cx, Cy)
