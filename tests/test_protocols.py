"""Round-trip tests for sigma protocols, sumcheck, and poly commitments
— the reference's universal prove->verify oracle pattern
(nizk/mod.rs:580-736, dense_mlpoly.rs:567-603)."""

import random

import jax.numpy as jnp
import pytest

from spartan_tpu.commitments import MultiCommitGens
from spartan_tpu.core.field import Q
from spartan_tpu.core.merlin import RandomTape, Transcript
from spartan_tpu.poly import dense
from spartan_tpu.poly.commit import PolyCommitmentGens, PolyEvalProof, commit
from spartan_tpu.poly.unipoly import UniPoly
from spartan_tpu.protocols.dotproduct_log import DotProductProofLog
from spartan_tpu.protocols.sigma import (
    DotProductProof,
    DotProductProofGens,
    EqualityProof,
    KnowledgeProof,
    ProductProof,
)
from spartan_tpu.protocols.sumcheck import SumcheckInstanceProof
from spartan_tpu.utils.errors import ProofVerifyError

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)

rng = random.Random(0xFEED)


def tape():
    return RandomTape(b"proof", seed=42)


def test_unipoly_quad_cubic():
    # 2x^2+3x+1 at 0,1,2 and x^3+2x^2+3x+1 at 0..3 (unipoly.rs tests)
    p = UniPoly.from_evals([1, 6, 15])
    assert p.coeffs == [1, 3, 2]
    assert p.evaluate(3) == 28
    assert UniPoly.decompress(p.compress(), (1 + 6) % Q).coeffs == p.coeffs
    p3 = UniPoly.from_evals([1, 7, 23, 55])
    assert p3.coeffs == [1, 3, 2, 1]
    assert p3.evaluate(4) == 109
    assert UniPoly.decompress(p3.compress(), 8).coeffs == p3.coeffs


def test_eq_evals_matches_naive():
    r = [rng.randrange(Q) for _ in range(5)]
    table = dense.to_ints(dense.eq_evals(r))
    for i in range(32):
        chi = 1
        for j in range(5):
            bit = (i >> (4 - j)) & 1
            chi = chi * (r[j] if bit else (1 - r[j])) % Q
        assert table[i] == chi


def test_bound_var_top_and_evaluate():
    xs = [rng.randrange(Q) for _ in range(16)]
    r = [rng.randrange(Q) for _ in range(4)]
    Z = dense.from_ints(xs)
    # fold all four vars then compare against direct evaluation
    cur = Z
    for rj in r:
        cur = dense.bound_var_top(cur, dense.from_ints([rj]))
    folded = dense.to_ints(cur)[0]
    assert folded == dense.evaluate(Z, r)


def test_knowledge_proof():
    gens = MultiCommitGens(1, b"test-knowledgeproof")
    x, r = rng.randrange(Q), rng.randrange(Q)
    pt, vt = Transcript(b"example"), Transcript(b"example")
    proof, C = KnowledgeProof.prove(gens, pt, tape(), x, r)
    proof.verify(gens, vt, C)
    # tampered commitment must fail
    with pytest.raises(ProofVerifyError):
        proof.verify(gens, Transcript(b"example"),
                     bytes([C[0] ^ 1]) + C[1:])


def test_equality_proof():
    gens = MultiCommitGens(1, b"test-equalityproof")
    v = rng.randrange(Q)
    s1, s2 = rng.randrange(Q), rng.randrange(Q)
    pt, vt = Transcript(b"example"), Transcript(b"example")
    proof, C1, C2 = EqualityProof.prove(gens, pt, tape(), v, s1, v, s2)
    proof.verify(gens, vt, C1, C2)


def test_product_proof():
    gens = MultiCommitGens(1, b"test-productproof")
    x, y = rng.randrange(Q), rng.randrange(Q)
    rX, rY, rZ = (rng.randrange(Q) for _ in range(3))
    z = x * y % Q
    pt, vt = Transcript(b"example"), Transcript(b"example")
    proof, X, Y, Z = ProductProof.prove(gens, pt, tape(), x, rX, y, rY, z, rZ)
    proof.verify(gens, vt, X, Y, Z)


def test_dot_product_proof():
    n = 4
    gens_1 = MultiCommitGens(1, b"test-two")
    gens_n = MultiCommitGens(n, b"test-n")
    x = [rng.randrange(Q) for _ in range(n)]
    a = [rng.randrange(Q) for _ in range(n)]
    y = sum(i * j for i, j in zip(x, a)) % Q
    r_x, r_y = rng.randrange(Q), rng.randrange(Q)
    pt, vt = Transcript(b"example"), Transcript(b"example")
    proof, Cx, Cy = DotProductProof.prove(
        gens_1, gens_n, pt, tape(), x, r_x, a, y, r_y)
    proof.verify(gens_1, gens_n, vt, a, Cx, Cy)


def test_dot_product_proof_log():
    n = 16
    gens = DotProductProofGens(n, b"test-16")
    x = [rng.randrange(Q) for _ in range(n)]
    a = [rng.randrange(Q) for _ in range(n)]
    y = sum(i * j for i, j in zip(x, a)) % Q
    r_x, r_y = rng.randrange(Q), rng.randrange(Q)
    pt, vt = Transcript(b"example"), Transcript(b"example")
    proof, Cx, Cy = DotProductProofLog.prove(
        gens, pt, tape(), dense.from_ints(x), r_x,
        dense.from_ints(a), a, y, r_y)
    proof.verify(n, gens, vt, a, Cx, Cy)


def test_nonzk_sumcheck_cubic():
    ell = 4
    n = 1 << ell
    A = [rng.randrange(Q) for _ in range(n)]
    B = [rng.randrange(Q) for _ in range(n)]
    C = [rng.randrange(Q) for _ in range(n)]
    claim = sum(a * b % Q * c for a, b, c in zip(A, B, C)) % Q
    pt, vt = Transcript(b"sc"), Transcript(b"sc")
    proof, r, claims = SumcheckInstanceProof.prove_cubic(
        claim, ell, [dense.from_ints(A), dense.from_ints(B),
                     dense.from_ints(C)], pt)
    e, r_v = proof.verify(claim, ell, 3, vt)
    assert r_v == r
    assert e == claims[0] * claims[1] % Q * claims[2] % Q


def test_poly_commit_eval_roundtrip():
    ell = 4
    n = 1 << ell
    xs = [rng.randrange(Q) for _ in range(n)]
    r = [rng.randrange(Q) for _ in range(ell)]
    Z = dense.from_ints(xs)
    gens = PolyCommitmentGens(ell, b"test-pc")
    comm, blinds = commit(Z, gens, tape())
    eval_r = dense.evaluate(Z, r)
    pt, vt = Transcript(b"example"), Transcript(b"example")
    proof, C_Zr = PolyEvalProof.prove(
        Z, blinds, r, eval_r, None, gens, pt, tape())
    proof.verify(gens, vt, r, C_Zr, comm)
    # wrong eval point must fail
    with pytest.raises(ProofVerifyError):
        bad_r = list(r)
        bad_r[0] = (bad_r[0] + 1) % Q
        proof.verify(gens, Transcript(b"example"), bad_r, C_Zr, comm)
