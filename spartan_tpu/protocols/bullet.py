"""Bulletproofs-style inner-product reduction (reference
src/nizk/bullet.rs, itself adapted from the bulletproofs crate).

Hybrid host/device execution: rounds operating on >= _DEVICE_MIN
elements run their inner products, cross-term MSMs and generator fold
as batched device kernels; the log-tail of small rounds runs on host
python ints (cheaper than one XLA dispatch, and avoids compiling a
kernel per halved shape).  Transcript I/O is host-side throughout.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core import ristretto as hri
from ..core.edwards import Point, msm_ct
from ..core.field import Q, batch_inv
from ..core.merlin import Transcript
from ..curve import edwards as ded
from ..curve import msm as dmsm
from ..ff import fq, limb
from ..utils.errors import ProofVerifyError

def _device_min() -> int:
    """Rounds smaller than this fold on host python ints.  Host rounds
    are the DEFAULT on every backend: each device round compiles one
    fused ladder executable per halved shape (minutes each, re-paid
    every process on the axon TPU backend, which cannot persist
    executables), while the native-C++ host rounds cost ~10 ms at the
    R-side sizes the prover ever sees (2^10 at 2^20 constraints) —
    this was 3,037 s of the 4,521 s 2^14 TPU prove (PERF.md).  Proof
    bytes are identical either way (the host/device boundary is
    bitwise-invisible); SPARTAN_TPU_BULLET_DEVICE_MIN opts device
    rounds back in for warm-process serving."""
    import os

    v = os.environ.get("SPARTAN_TPU_BULLET_DEVICE_MIN")
    if v is not None:
        return int(v)
    return 1 << 62


def _mont(x: int) -> jnp.ndarray:
    return fq.to_mont(jnp.asarray(fq.encode_ints([x])))


def _expand(p: ded.PointArray) -> ded.PointArray:
    """() PointArray -> (1,) for to_host."""
    return ded.PointArray(*(c[None] for c in p))


@jax.jit
def _bullet_round_jit(a, b, G, qpt, hpt, blind_L, blind_R):
    """One bullet round's transcript inputs, fully on device:
    L = <a_L, G_R> + c_L*Q + blind_L*H,  R = <a_R, G_L> + c_R*Q +
    blind_R*H, ristretto-compressed.  Returns (2, 32) uint32 bytes.
    (bullet.rs:70-113; the fold to the half-size vectors happens in
    _bullet_fold_jit once the challenge is known.)"""
    from ..curve import ristretto as dri

    n = a.shape[0] // 2
    a_L, a_R = a[:n], a[n:]
    b_L, b_R = b[:n], b[n:]
    G_L = ded.PointArray(*(c[:n] for c in G))
    G_R = ded.PointArray(*(c[n:] for c in G))

    c_L = fq.from_mont(fq.dot_mod(a_L, b_R))  # canonical (16,)
    c_R = fq.from_mont(fq.dot_mod(a_R, b_L))

    L_main = ded.sum_reduce(ded.scalar_mul(G_R, fq.from_mont(a_L)))
    R_main = ded.sum_reduce(ded.scalar_mul(G_L, fq.from_mont(a_R)))

    def complete(main, c, blind):
        cq = ded.scalar_mul(qpt, c[None])
        bh = ded.scalar_mul(hpt, blind[None])
        return ded.add(ded.add(main, ded.PointArray(*(x[0] for x in cq))),
                       ded.PointArray(*(x[0] for x in bh)))

    L = complete(L_main, c_L, blind_L)
    R = complete(R_main, c_R, blind_R)
    both = ded.PointArray(*(jnp.stack([lc, rc]) for lc, rc in zip(L, R)))
    return dri.compress(both)  # (2, 16) s limbs


@jax.jit
def _bullet_fold_jit(a, b, G, um, uim):
    """Fold to the half-size (a', b', G') given the round challenge
    (bullet.rs:116-124)."""
    n = a.shape[0] // 2
    a_L, a_R = a[:n], a[n:]
    b_L, b_R = b[:n], b[n:]
    G_L = ded.PointArray(*(c[:n] for c in G))
    G_R = ded.PointArray(*(c[n:] for c in G))
    a2 = fq.add(fq.mul(a_L, um), fq.mul(a_R, uim))
    b2 = fq.add(fq.mul(b_L, uim), fq.mul(b_R, um))
    uim_c = fq.from_mont(jnp.broadcast_to(uim, (n, 16)))
    um_c = fq.from_mont(jnp.broadcast_to(um, (n, 16)))
    G2 = ded.add(ded.scalar_mul(G_L, uim_c), ded.scalar_mul(G_R, um_c))
    return a2, b2, G2


@dataclass
class BulletReductionProof:
    L_vec: list  # bytes
    R_vec: list  # bytes

    @staticmethod
    def prove(transcript: Transcript, Q_pt: Point, G: ded.PointArray,
              H: Point, a: jnp.ndarray, b: jnp.ndarray,
              blind: int, blinds_vec: list[tuple[int, int]]):
        """a, b: device Montgomery tables (n, 16), n a power of two.
        Returns (proof, Gamma_hat, a_hat, b_hat, g_hat, blind_final)
        mirroring bullet.rs:32-135."""
        n = a.shape[0]
        assert n & (n - 1) == 0
        lg_n = n.bit_length() - 1
        assert len(blinds_vec) == lg_n

        L_vec, R_vec = [], []
        blind_fin = blind % Q
        it = iter(blinds_vec)

        # --- device rounds -------------------------------------------------
        # One fused executable + ONE 64-byte fetch per round: the L/R
        # cross-term MSMs, the Q/H completion and the ristretto
        # compression all run on device (a per-op round costs ~4 relay
        # round-trips; the fold below is dispatched async while the
        # host absorbs L,R and derives u).
        qpt_d = ded.from_host([Q_pt])
        hpt_d = ded.from_host([H])
        dev_min = _device_min()
        while n > 1 and n // 2 >= dev_min:
            n //= 2
            blind_L, blind_R = next(it)
            lr_s = _bullet_round_jit(
                a, b, G, qpt_d, hpt_d,
                jnp.asarray(limb.int_to_limbs(blind_L % Q)),
                jnp.asarray(limb.int_to_limbs(blind_R % Q)))
            lr = np.asarray(lr_s).astype("<u2")
            Lb, Rb = lr[0].tobytes(), lr[1].tobytes()
            transcript.append_point(b"L", Lb)
            transcript.append_point(b"R", Rb)
            u = transcript.challenge_scalar(b"u")
            u_inv = pow(u, -1, Q)

            a, b, G = _bullet_fold_jit(a, b, G, _mont(u), _mont(u_inv))
            blind_fin = (blind_fin + blind_L * u * u + blind_R * u_inv * u_inv) % Q
            L_vec.append(Lb)
            R_vec.append(Rb)

        # --- host tail ------------------------------------------------------
        a_i = fq.decode_to_ints(a)
        b_i = fq.decode_to_ints(b)
        G_h = ded.to_host(G)
        while n != 1:
            n //= 2
            a_L, a_R = a_i[:n], a_i[n:]
            b_L, b_R = b_i[:n], b_i[n:]
            G_L, G_R = G_h[:n], G_h[n:]
            c_L = sum(x * y for x, y in zip(a_L, b_R)) % Q
            c_R = sum(x * y for x, y in zip(a_R, b_L)) % Q
            blind_L, blind_R = next(it)
            # cross-term MSM vartime (as the reference's bullet.rs does
            # for the same data); the secret c/blind completion terms on
            # the constant-time ladder
            L = dmsm.vmsm(a_L, G_R).add(msm_ct([c_L, blind_L], [Q_pt, H]))
            R = dmsm.vmsm(a_R, G_L).add(msm_ct([c_R, blind_R], [Q_pt, H]))
            Lb, Rb = hri.encode(L), hri.encode(R)
            transcript.append_point(b"L", Lb)
            transcript.append_point(b"R", Rb)
            u = transcript.challenge_scalar(b"u")
            u_inv = pow(u, -1, Q)
            a_i = [(x * u + u_inv * y) % Q for x, y in zip(a_L, a_R)]
            b_i = [(x * u_inv + u * y) % Q for x, y in zip(b_L, b_R)]
            G_h = [gl.mul(u_inv).add(gr.mul(u)) for gl, gr in zip(G_L, G_R)]
            blind_fin = (blind_fin + blind_L * u * u + blind_R * u_inv * u_inv) % Q
            L_vec.append(Lb)
            R_vec.append(Rb)

        a_hat, b_hat, g_hat = a_i[0], b_i[0], G_h[0]
        # a_hat and blind_fin are secret: constant-time ladder
        Gamma_hat = msm_ct([a_hat, a_hat * b_hat % Q, blind_fin],
                           [g_hat, Q_pt, H])
        return (
            BulletReductionProof(L_vec, R_vec),
            Gamma_hat, a_hat, b_hat, g_hat, blind_fin,
        )

    def verification_scalars(self, n: int, transcript: Transcript):
        """bullet.rs:137-185: recompute challenges; u^2, u^-2 and the
        s-vector."""
        lg_n = len(self.L_vec)
        if lg_n >= 32 or n != (1 << lg_n):
            raise ProofVerifyError("bullet: bad length")
        challenges = []
        for L, R in zip(self.L_vec, self.R_vec):
            transcript.append_point(b"L", L)
            transcript.append_point(b"R", R)
            challenges.append(transcript.challenge_scalar(b"u"))
        challenges_inv = batch_inv(challenges, Q)
        allinv = 1
        for ci in challenges_inv:
            allinv = allinv * ci % Q
        u_sq = [c * c % Q for c in challenges]
        u_inv_sq = [c * c % Q for c in challenges_inv]
        s = [allinv]
        for i in range(1, n):
            lg_i = i.bit_length() - 1
            k = 1 << lg_i
            s.append(s[i - k] * u_sq[(lg_n - 1) - lg_i] % Q)
        return u_sq, u_inv_sq, s

    def verify(self, n: int, a: list[int], transcript: Transcript,
               Gamma: Point, G: ded.PointArray):
        """bullet.rs:191-225.  a: public vector ints; G: device gens.
        Returns (g_hat, Gamma_hat, a_hat)."""
        u_sq, u_inv_sq, s = self.verification_scalars(n, transcript)
        Ls = [hri.decode(x) for x in self.L_vec]
        Rs = [hri.decode(x) for x in self.R_vec]
        if any(x is None for x in Ls + Rs):
            raise ProofVerifyError("bullet: decompression")
        if n >= _device_min():
            G_hat = ded.to_host(
                _expand(dmsm.msm(jnp.asarray(limb.ints_to_limbs(s)), G))
            )[0]
        else:
            G_hat = dmsm.vmsm(s, ded.to_host(G))
        a_hat = sum(x * y for x, y in zip(a, s)) % Q
        Gamma_hat = dmsm.vmsm(u_sq + u_inv_sq + [1], Ls + Rs + [Gamma])
        return G_hat, Gamma_hat, a_hat
