"""Spark + SNARK end-to-end tests (reference sparse_mlpoly.rs:1596-1667,
lib.rs check_snark)."""

import random

import numpy as np
import pytest

from spartan_tpu.api import Assignment, Instance, SNARK, SNARKGens
from spartan_tpu.core.field import Q
from spartan_tpu.core.merlin import RandomTape, Transcript
from spartan_tpu.poly import dense
from spartan_tpu.protocols.spark import (
    AddrTimestamps,
    SparseMatPolyCommitmentGens,
    SparseMatPolyEvalProof,
    multi_commit,
)
from spartan_tpu.r1cs.shape import SparseMatPolynomial
from spartan_tpu.utils.errors import ProofVerifyError

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)

rng = random.Random(0xABCD)


def test_addr_timestamps_matches_sequential():
    num_cells, num_ops = 8, 12
    addrs = np.array([
        [0, 3, 3, 1, 0, 7, 3, 3, 2, 2, 0, 1],
        [5, 5, 5, 5, 0, 1, 2, 3, 4, 5, 6, 7],
    ])
    at = AddrTimestamps(num_cells, num_ops, addrs)
    # sequential oracle (sparse_mlpoly.rs:228-246)
    audit = [0] * num_cells
    read_ref = np.zeros_like(addrs)
    for inst in range(addrs.shape[0]):
        for i in range(num_ops):
            a = addrs[inst, i]
            read_ref[inst, i] = audit[a]
            audit[a] += 1
    assert np.array_equal(at.read_ts_int, read_ref)
    assert np.array_equal(at.audit_ts_int, np.array(audit))


def test_product_circuit_batch():
    from spartan_tpu.protocols.product_tree import ProductCircuitBatch

    B, n = 3, 8
    vals = [[rng.randrange(Q) for _ in range(n)] for _ in range(B)]
    import jax.numpy as jnp

    tables = jnp.stack([dense.from_ints(v) for v in vals])
    circ = ProductCircuitBatch(tables)
    got = circ.evaluate()
    for b in range(B):
        prod = 1
        for v in vals[b]:
            prod = prod * v % Q
        assert got[b] == prod


def test_batched_product_proof_roundtrip():
    from spartan_tpu.protocols.product_tree import (
        ProductCircuitBatch,
        ProductCircuitEvalProofBatched,
    )
    import jax.numpy as jnp

    B, n = 4, 8
    vals = [[rng.randrange(Q) for _ in range(n)] for _ in range(B)]
    tables = jnp.stack([dense.from_ints(v) for v in vals])
    circ = ProductCircuitBatch(tables)
    claims = circ.evaluate()
    pt = Transcript(b"prodtree")
    proof, rand_p = ProductCircuitEvalProofBatched.prove(circ, None, pt)
    vt = Transcript(b"prodtree")
    claims_v, _, rand_v = proof.verify(claims, [], n, vt)
    assert rand_v == rand_p


def _random_sparse(num_vars_x, num_vars_y, nnz, seed):
    r = random.Random(seed)
    entries = []
    seen = set()
    while len(entries) < nnz:
        row = r.randrange(1 << num_vars_x)
        col = r.randrange(1 << num_vars_y)
        if (row, col) in seen:
            continue
        seen.add((row, col))
        entries.append((row, col, r.randrange(Q)))
    return SparseMatPolynomial.from_entries(num_vars_x, num_vars_y, entries)


def test_sparse_polyeval_proof():
    """check_sparse_polyeval_proof (sparse_mlpoly.rs:1596-1667) scaled
    down: batch of 3 random sparse matrices."""
    num_vars_x = num_vars_y = 4
    num_nz = 16
    polys = [_random_sparse(num_vars_x, num_vars_y, num_nz, s) for s in (1, 2, 3)]

    gens = SparseMatPolyCommitmentGens(
        b"gens_sparse_poly", num_vars_x, num_vars_y, num_nz, 3)
    comm, dense_rep = multi_commit(polys, gens)

    rx = [rng.randrange(Q) for _ in range(num_vars_x)]
    ry = [rng.randrange(Q) for _ in range(num_vars_y)]
    evals = SparseMatPolynomial.multi_evaluate(polys, rx, ry)

    pt = Transcript(b"example")
    proof = SparseMatPolyEvalProof.prove(
        dense_rep, rx, ry, evals, gens, pt, RandomTape(b"proof", seed=5))
    vt = Transcript(b"example")
    proof.verify(comm, rx, ry, evals, gens, vt)

    # wrong eval must fail
    bad = list(evals)
    bad[0] = (bad[0] + 1) % Q
    with pytest.raises(ProofVerifyError):
        proof.verify(comm, rx, ry, bad, gens, Transcript(b"example"))


def test_snark_end_to_end():
    num_vars = num_cons = 16
    num_inputs = 3
    gens = SNARKGens(num_cons, num_vars, num_inputs, num_cons)
    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
        num_cons, num_vars, num_inputs, seed=21)
    comm, decomm = SNARK.encode(inst, gens)
    proof = SNARK.prove(inst, comm, decomm, vars_a, inputs_a, gens,
                        Transcript(b"example"), _tape_seed=6)
    proof.verify(comm, inputs_a, Transcript(b"example"), gens)

    bad_inputs = Assignment([(x + 1) % Q for x in inputs_a.assignment])
    with pytest.raises(ProofVerifyError):
        proof.verify(comm, bad_inputs, Transcript(b"example"), gens)


def test_padded_constraints_snark():
    """lib.rs test_padded_constraints, SNARK flavor."""
    num_cons, num_vars, num_inputs = 1, 0, 3
    one = 1
    A = [(0, num_vars + 2, one)]
    B = [(0, num_vars + 2, one)]
    C = [(0, num_vars + 1, one), (0, num_vars, (-13) % Q),
         (0, num_vars + 3, (-1) % Q)]
    inst = Instance.new(num_cons, num_vars, num_inputs, A, B, C)
    vars_a = Assignment([])
    inputs_a = Assignment([16, 1, 2])
    assert inst.is_sat(vars_a, inputs_a)
    gens = SNARKGens(num_cons, num_vars, num_inputs, 3)
    comm, decomm = SNARK.encode(inst, gens)
    proof = SNARK.prove(inst, comm, decomm, vars_a, inputs_a, gens,
                        Transcript(b"snark_example"), _tape_seed=7)
    proof.verify(comm, inputs_a, Transcript(b"snark_example"), gens)


def test_snark_stable_rounds_byte_parity(monkeypatch):
    """Bit-reversed shape-stable Spark product layers (the accelerator
    default) must emit the same SNARK proof bytes as the plain layout:
    the BR relayout + padded tiers are execution choices, not protocol
    changes."""
    from spartan_tpu import serialize as ser
    from spartan_tpu.api import SNARK, SNARKGens, Instance
    from spartan_tpu.core.merlin import Transcript

    n = 32
    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
        n, n, 3, seed=91)
    nnz = max(inst.inst.A.get_num_nz_entries(),
              inst.inst.B.get_num_nz_entries(),
              inst.inst.C.get_num_nz_entries())
    sgens = SNARKGens(n, n, 3, nnz)
    comm, decomm = SNARK.encode(inst, sgens)

    monkeypatch.setenv("SPARTAN_TPU_DEVICE_PROVER", "0")
    monkeypatch.setenv("SPARTAN_TPU_STABLE_ROUNDS", "0")
    plain = ser.snark_to_bytes(SNARK.prove(
        inst, comm, decomm, vars_a, inputs_a, sgens,
        Transcript(b"srk32"), _tape_seed=23))

    monkeypatch.setenv("SPARTAN_TPU_STABLE_ROUNDS", "1")
    stable = ser.snark_to_bytes(SNARK.prove(
        inst, comm, decomm, vars_a, inputs_a, sgens,
        Transcript(b"srk32"), _tape_seed=23))

    assert stable == plain
    ser.snark_from_bytes(stable).verify(
        comm, inputs_a, Transcript(b"srk32"), sgens)


def test_snark_stable_rounds_tiered_byte_parity(monkeypatch):
    """With an aggressive BR tier schedule (floor 4), the padded-grid
    tree build, the layer-round tier shrinks and the dotp relayout must
    all still emit identical SNARK bytes — this is what exercises
    _tier_up/_shrink3 transitions that real floors only hit at 2^16+."""
    from spartan_tpu import serialize as ser
    from spartan_tpu.api import SNARK, SNARKGens, Instance
    from spartan_tpu.core.merlin import Transcript
    from spartan_tpu.protocols import product_tree as pt
    from spartan_tpu.protocols import sumcheck as sc

    n = 32
    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
        n, n, 3, seed=92)
    nnz = max(inst.inst.A.get_num_nz_entries(),
              inst.inst.B.get_num_nz_entries(),
              inst.inst.C.get_num_nz_entries())
    sgens = SNARKGens(n, n, 3, nnz)
    comm, decomm = SNARK.encode(inst, sgens)

    monkeypatch.setenv("SPARTAN_TPU_DEVICE_PROVER", "0")
    monkeypatch.setenv("SPARTAN_TPU_STABLE_ROUNDS", "0")
    plain = ser.snark_to_bytes(SNARK.prove(
        inst, comm, decomm, vars_a, inputs_a, sgens,
        Transcript(b"srkt32"), _tape_seed=24))

    monkeypatch.setenv("SPARTAN_TPU_STABLE_ROUNDS", "1")
    monkeypatch.setattr(pt, "_BR_FLOOR", 4)
    monkeypatch.setattr(sc, "_TIER_FLOOR", 4)
    tiered = ser.snark_to_bytes(SNARK.prove(
        inst, comm, decomm, vars_a, inputs_a, sgens,
        Transcript(b"srkt32"), _tape_seed=24))

    assert tiered == plain
    ser.snark_from_bytes(tiered).verify(
        comm, inputs_a, Transcript(b"srkt32"), sgens)
