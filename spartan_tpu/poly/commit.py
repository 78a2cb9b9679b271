"""Polynomial commitment (sqrt-matrix Pedersen) and evaluation proof
(reference dense_mlpoly.rs:24-404).

The 2^ell table is viewed as an L x R matrix (L = 2^(ell/2) rows); each
row gets one Pedersen commitment under a shared generator vector — on
TPU this is a single msm_rows launch (all rows batched through one
sort+scan Pippenger) followed by one batched ristretto compression.
The evaluation proof reduces Z(r) = v to a log-size dot-product proof
on the R-side vector.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..commitments import commit_scalar
from ..core import ristretto as hri
from ..core.field import Q
from ..core.merlin import RandomTape, Transcript
from ..curve import edwards as ded
from ..curve import msm as dmsm
from ..curve import ristretto as dri
from ..ff import fq, limb
from ..protocols.dotproduct_log import DotProductProofLog
from ..protocols.sigma import DotProductProofGens
from ..utils.errors import ProofVerifyError
from . import dense


class PolyCommitmentGens:
    """dense_mlpoly.rs:24-37: gens sized to the R side (2^(ell - ell/2))."""

    def __init__(self, num_vars: int, label: bytes):
        _, right = dense.factored_lens(num_vars)
        self.gens = DotProductProofGens(1 << right, label)


@dataclass
class PolyCommitment:
    C: list  # list of 32-byte compressed row commitments

    def append_to_transcript(self, label: bytes, transcript: Transcript) -> None:
        transcript.append_message(label, b"poly_commitment_begin")
        for c in self.C:
            transcript.append_point(b"poly_commitment_share", c)
        transcript.append_message(label, b"poly_commitment_end")


def commit(Z: jnp.ndarray, gens: PolyCommitmentGens,
           tape: RandomTape | None) -> tuple[PolyCommitment, list[int]]:
    """DensePolynomial::commit (dense_mlpoly.rs:164-204).  Z: (n, 16)
    Montgomery device table, n = 2^ell.  Returns (commitment, blinds)."""
    n = Z.shape[0]
    ell = n.bit_length() - 1
    assert 1 << ell == n
    left, right = dense.factored_lens(ell)
    L_size, R_size = 1 << left, 1 << right
    if tape is not None:
        blinds = tape.random_vector(b"poly_blinds", L_size)
    else:
        blinds = [0] * L_size

    from ..utils import timer as _timer
    from ..utils.timer import Timer

    # Phase boundaries only materialize (block_until_ready) under
    # SPARTAN_TPU_PROFILE=1 — unconditional syncs would serialize the
    # async dispatch pipeline in production runs.
    def _sync(x):
        if _timer._ENABLED:
            import jax as _jax

            _jax.block_until_ready(x)

    t = Timer("commit::from_mont")
    scalars = fq.from_mont_big(Z).reshape(L_size, R_size, 16)
    from ..parallel import context as pctx

    mesh = pctx.get_mesh()
    t.stop()
    t = Timer("commit::msm_rows")
    if mesh is not None:
        from ..parallel.mesh import msm_rows_blocked

        rows = msm_rows_blocked(
            scalars, gens.gens.gens_n.device_G, mesh)  # (L_size,)
    else:
        rows = dmsm.msm_rows(scalars, gens.gens.gens_n.device_G)  # (L_size,)
    _sync(rows.x)
    t.stop()
    t = Timer("commit::blinds")
    # add blinds * h: batched scalar-mul of the fixed h.  Under the
    # pallas MSM impl this is a degenerate row-MSM (R=1, shared
    # generator h) through the SAME Mosaic kernel family — no scalar
    # ladder module in the TPU prove path at all; otherwise it goes
    # through the shared flat ladder module so every pow-of-two L_size
    # reuses the naive-MSM executable instead of compiling its own.
    blind_limbs = jnp.asarray(limb.ints_to_limbs(blinds))
    if dmsm._msm_impl() == "pallas":
        from ..curve.pallas_msm import msm_rows_pallas

        bh = msm_rows_pallas(blind_limbs[:, None, :],
                             gens.gens.gens_n.device_h)
    else:
        h_tiled = ded.PointArray(
            *(jnp.tile(c, (L_size, 1)) for c in gens.gens.gens_n.device_h)
        )
        bh = dmsm.scalar_mul_padded(h_tiled, blind_limbs)
    rows = ded.add(rows, bh)
    _sync(rows.x)
    t.stop()
    t = Timer("commit::compress")
    blobs = dri.compress_to_bytes(rows)
    t.stop()
    return PolyCommitment(blobs), blinds


@dataclass
class PolyEvalProof:
    """dense_mlpoly.rs:302-404."""

    proof: DotProductProofLog

    PROTOCOL = b"polynomial evaluation proof"

    @staticmethod
    def prove(Z: jnp.ndarray, blinds: list[int] | None, r: list[int],
              Zr: int, blind_Zr: int | None, gens: PolyCommitmentGens,
              transcript: Transcript, tape: RandomTape
              ) -> tuple["PolyEvalProof", bytes]:
        transcript.append_protocol_name(PolyEvalProof.PROTOCOL)
        ell = len(r)
        assert Z.shape[0] == 1 << ell
        left, right = dense.factored_lens(ell)
        L_size, R_size = 1 << left, 1 << right
        blinds = blinds if blinds is not None else [0] * L_size
        blind_Zr = blind_Zr if blind_Zr is not None else 0
        assert len(blinds) == L_size

        # L and R chi tables (host ints, sqrt-size each)
        L_ints = _eq_evals_host(r[:left])
        R_ints = _eq_evals_host(r[left:])

        L_dev = dense.from_ints(L_ints)
        LZ = dense.bound_L(Z, L_dev)  # (R_size, 16) device
        LZ_blind = sum(b * l for b, l in zip(blinds, L_ints)) % Q

        R_dev = dense.from_ints(R_ints)
        proof, _Cx, C_Zr_prime = DotProductProofLog.prove(
            gens.gens, transcript, tape, LZ, LZ_blind,
            R_dev, R_ints, Zr, blind_Zr)
        return PolyEvalProof(proof), C_Zr_prime

    def verify(self, gens: PolyCommitmentGens, transcript: Transcript,
               r: list[int], C_Zr: bytes, comm: PolyCommitment) -> None:
        transcript.append_protocol_name(PolyEvalProof.PROTOCOL)
        ell = len(r)
        left, right = dense.factored_lens(ell)
        L_ints = _eq_evals_host(r[:left])
        R_ints = _eq_evals_host(r[left:])
        C_pts = []
        for blob in comm.C:
            pt = hri.decode(blob)
            if pt is None:
                raise ProofVerifyError("poly commitment decompression")
            C_pts.append(pt)
        C_LZ = hri.encode(dmsm.vmsm(L_ints, C_pts))
        self.proof.verify(len(R_ints), gens.gens, transcript, R_ints,
                          C_LZ, C_Zr)

    def verify_plain(self, gens: PolyCommitmentGens, transcript: Transcript,
                     r: list[int], Zr: int, comm: PolyCommitment) -> None:
        C_Zr = hri.encode(commit_scalar(Zr, 0, gens.gens.gens_1))
        self.verify(gens, transcript, r, C_Zr, comm)


def _eq_evals_host(r: list[int]) -> list[int]:
    """EqPolynomial::evals on host ints (sqrt-size tables only)."""
    evals = [1]
    for rj in r:
        nxt = []
        for e in evals:
            hi = e * rj % Q
            nxt.append((e - hi) % Q)
            nxt.append(hi)
        evals = nxt
    return evals
