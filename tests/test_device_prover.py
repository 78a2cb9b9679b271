"""Device-resident ZK sumcheck vs the host round loop: byte-exact
proof and transcript equality with a fixed RandomTape seed."""

import os

import numpy as np
import pytest

from spartan_tpu.commitments import MultiCommitGens
from spartan_tpu.core.field import Q
from spartan_tpu.core.merlin import RandomTape, Transcript
from spartan_tpu.poly import dense
from spartan_tpu.protocols import device_prover as dp
from spartan_tpu.protocols.sumcheck import ZKSumcheckInstanceProof

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)


def _tables(n, count, seed):
    rng = np.random.default_rng(seed)
    return [dense.from_ints([int(x) for x in rng.integers(0, 1 << 61, size=n)])
            for _ in range(count)]


@pytest.mark.parametrize("which,ntab,deg", [("quad", 2, 2), ("cubic", 4, 3)])
def test_device_zk_phase_matches_host(which, ntab, deg):
    n = 16
    num_rounds = 4
    tables = _tables(n, ntab, seed=3)
    gens_n = MultiCommitGens(deg + 1, b"test gens n")
    gens_1 = MultiCommitGens(1, b"test gens 1")

    if which == "cubic":
        # claim irrelevant to structure; use 0 like phase 1
        claim, blind = 0, 0
    else:
        claim, blind = 12345, 678

    # host path
    from spartan_tpu.protocols.sumcheck import (
        _evals_cubic_additive, _evals_quad)

    th = Transcript(b"zkphase")
    proof_h, r_h, claims_h, be_h = ZKSumcheckInstanceProof._prove_rounds(
        claim, blind, num_rounds, list(tables),
        _evals_cubic_additive if which == "cubic" else _evals_quad,
        deg, gens_1, gens_n, th, RandomTape(b"tape", seed=99), which=which)

    # device path
    td = Transcript(b"zkphase")
    proof_d, r_d, claims_d, be_d = dp.zk_sumcheck_phase_device(
        claim, blind, num_rounds, list(tables), which,
        gens_1, gens_n, td, RandomTape(b"tape", seed=99))

    assert r_d == r_h
    assert claims_d == claims_h
    assert be_d == be_h
    assert proof_d.comm_polys == proof_h.comm_polys
    assert proof_d.comm_evals == proof_h.comm_evals
    for a, b in zip(proof_d.proofs, proof_h.proofs):
        assert (a.delta, a.beta, a.z, a.z_delta, a.z_beta) == (
            b.delta, b.beta, b.z, b.z_delta, b.z_beta)
    # transcripts advanced identically
    assert th.challenge_scalar(b"post") == td.challenge_scalar(b"post")


def test_device_prover_nizk_end_to_end():
    """Full NIZK prove with the device prover forced on; proof verifies
    and equals the host-path proof byte-for-byte."""
    from spartan_tpu import serialize as ser
    from spartan_tpu.api import NIZK, NIZKGens, Instance

    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(16, 16, 2, seed=5)
    gens = NIZKGens(16, 16, 2)

    os.environ["SPARTAN_TPU_DEVICE_PROVER"] = "0"
    try:
        p_host = NIZK.prove(inst, vars_a, inputs_a, gens,
                            Transcript(b"nizk_dp"), _tape_seed=7)
        os.environ["SPARTAN_TPU_DEVICE_PROVER"] = "1"
        p_dev = NIZK.prove(inst, vars_a, inputs_a, gens,
                           Transcript(b"nizk_dp"), _tape_seed=7)
    finally:
        os.environ.pop("SPARTAN_TPU_DEVICE_PROVER", None)

    assert ser.nizk_to_bytes(p_dev) == ser.nizk_to_bytes(p_host)
    p_dev.verify(inst, inputs_a, Transcript(b"nizk_dp"), gens)


def test_device_product_layers_match_host():
    """ProductCircuitEvalProofBatched: device tree prover vs host."""
    import jax.numpy as jnp

    from spartan_tpu.protocols.product_tree import (
        DotProductCircuitBatch,
        ProductCircuitBatch,
        ProductCircuitEvalProofBatched,
    )
    from spartan_tpu.protocols import device_prover as dpp

    rng = np.random.default_rng(11)
    B, n = 3, 16

    def batch(seed, width=n):
        r = np.random.default_rng(seed)
        return jnp.stack([
            dense.from_ints(
                [int(x) for x in r.integers(1, 1 << 60, size=width)])
            for _ in range(B)])

    leaves = batch(1)
    # dotp (seq-set) tables must match the layer-0 width n/2 — Spark
    # always passes the interleaved HALVES (sparse_mlpoly.rs:1089-1118);
    # full-width dotp inputs are protocol-invalid and now rejected by
    # the host path's instance-axis concatenation
    dotp = DotProductCircuitBatch(
        batch(2, n // 2), batch(3, n // 2), batch(4, n // 2))

    th = Transcript(b"prodlayers")
    proof_h, rand_h = ProductCircuitEvalProofBatched.prove(
        ProductCircuitBatch(leaves), dotp, th)

    td = Transcript(b"prodlayers")
    proof_d, rand_d = dpp.prove_product_layers_device(
        ProductCircuitBatch(leaves), dotp, td)

    assert rand_d == rand_h
    assert proof_d.claims_dotp == tuple(
        list(x) for x in proof_h.claims_dotp) or \
        tuple(map(list, proof_d.claims_dotp)) == tuple(
            map(list, proof_h.claims_dotp))
    assert len(proof_d.proof) == len(proof_h.proof)
    for a, b in zip(proof_d.proof, proof_h.proof):
        assert a.proof.compressed_polys == b.proof.compressed_polys
        assert a.claims_prod_left == b.claims_prod_left
        assert a.claims_prod_right == b.claims_prod_right
    assert th.challenge_scalar(b"post") == td.challenge_scalar(b"post")

    # and without a dotp circuit (the mem tree case)
    th2 = Transcript(b"prodlayers2")
    proof_h2, rand_h2 = ProductCircuitEvalProofBatched.prove(
        ProductCircuitBatch(leaves), None, th2)
    td2 = Transcript(b"prodlayers2")
    proof_d2, rand_d2 = dpp.prove_product_layers_device(
        ProductCircuitBatch(leaves), None, td2)
    assert rand_d2 == rand_h2
    for a, b in zip(proof_d2.proof, proof_h2.proof):
        assert a.proof.compressed_polys == b.proof.compressed_polys
    assert th2.challenge_scalar(b"post") == td2.challenge_scalar(b"post")


def test_device_dotproduct_log_matches_host():
    """DotProductProofLog: device bullet pipeline vs host, byte-exact."""
    from spartan_tpu.core.field import Q as _Q
    from spartan_tpu.protocols import device_prover as dpp
    from spartan_tpu.protocols.dotproduct_log import DotProductProofLog
    from spartan_tpu.protocols.sigma import DotProductProofGens

    n = 16
    rng = np.random.default_rng(21)
    x_ints = [int(v) for v in rng.integers(1, 1 << 60, size=n)]
    a_ints = [int(v) for v in rng.integers(1, 1 << 60, size=n)]
    x_dev = dense.from_ints(x_ints)
    a_dev = dense.from_ints(a_ints)
    y = sum(a * b for a, b in zip(x_ints, a_ints)) % _Q
    gens = DotProductProofGens(n, b"dplog test")

    th = Transcript(b"dplog")
    os.environ["SPARTAN_TPU_DEVICE_PROVER"] = "0"
    try:
        proof_h, cx_h, cy_h = DotProductProofLog.prove(
            gens, th, RandomTape(b"tape", seed=31), x_dev, 555,
            a_dev, a_ints, y, 777)
    finally:
        os.environ.pop("SPARTAN_TPU_DEVICE_PROVER", None)

    td = Transcript(b"dplog")
    proof_d, cx_d, cy_d = dpp.dotproduct_log_device(
        gens, td, RandomTape(b"tape", seed=31), x_dev, 555, a_dev, y, 777)

    assert (cx_d, cy_d) == (cx_h, cy_h)
    assert proof_d.bullet_reduction_proof.L_vec == proof_h.bullet_reduction_proof.L_vec
    assert proof_d.bullet_reduction_proof.R_vec == proof_h.bullet_reduction_proof.R_vec
    assert (proof_d.delta, proof_d.beta, proof_d.z1, proof_d.z2) == (
        proof_h.delta, proof_h.beta, proof_h.z1, proof_h.z2)
    assert th.challenge_scalar(b"post") == td.challenge_scalar(b"post")

    # and the proof verifies
    tv = Transcript(b"dplog")
    proof_d.verify(n, gens, tv, a_ints, cx_d, cy_d)
