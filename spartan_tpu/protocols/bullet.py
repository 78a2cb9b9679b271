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

import jax.numpy as jnp

from ..core import ristretto as hri
from ..core.edwards import Point
from ..core.field import Q, batch_inv
from ..core.merlin import Transcript
from ..curve import edwards as ded
from ..curve import msm as dmsm
from ..ff import fq, limb
from ..utils.errors import ProofVerifyError

_DEVICE_MIN = 256  # rounds smaller than this fold on host


def _bcast_scalar(x: int, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(limb.int_to_limbs(x % Q)), (n, 16))


def _mont(x: int) -> jnp.ndarray:
    return fq.to_mont(jnp.asarray(fq.encode_ints([x])))


def _to_int(x: jnp.ndarray) -> int:
    return fq.decode_to_ints(x[None])[0]


def _expand(p: ded.PointArray) -> ded.PointArray:
    """() PointArray -> (1,) for to_host."""
    return ded.PointArray(*(c[None] for c in p))


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
        while n > 1 and n // 2 >= _DEVICE_MIN:
            n //= 2
            a_L, a_R = a[:n], a[n:]
            b_L, b_R = b[:n], b[n:]
            G_L = ded.PointArray(*(c[:n] for c in G))
            G_R = ded.PointArray(*(c[n:] for c in G))

            c_L = _to_int(fq.dot_mod(a_L, b_R))
            c_R = _to_int(fq.dot_mod(a_R, b_L))
            blind_L, blind_R = next(it)

            L_main = ded.to_host(_expand(dmsm.msm(fq.from_mont(a_L), G_R)))[0]
            L = L_main.add(Q_pt.mul(c_L)).add(H.mul(blind_L % Q))
            R_main = ded.to_host(_expand(dmsm.msm(fq.from_mont(a_R), G_L)))[0]
            R = R_main.add(Q_pt.mul(c_R)).add(H.mul(blind_R % Q))

            Lb, Rb = hri.encode(L), hri.encode(R)
            transcript.append_point(b"L", Lb)
            transcript.append_point(b"R", Rb)
            u = transcript.challenge_scalar(b"u")
            u_inv = pow(u, -1, Q)

            um, uim = _mont(u), _mont(u_inv)
            a = fq.add(fq.mul(a_L, um), fq.mul(a_R, uim))
            b = fq.add(fq.mul(b_L, uim), fq.mul(b_R, um))
            G = ded.add(
                ded.scalar_mul(G_L, _bcast_scalar(u_inv, n)),
                ded.scalar_mul(G_R, _bcast_scalar(u, n)),
            )
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
            L = dmsm.vmsm(a_L + [c_L, blind_L], G_R + [Q_pt, H])
            R = dmsm.vmsm(a_R + [c_R, blind_R], G_L + [Q_pt, H])
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
        Gamma_hat = (
            g_hat.mul(a_hat)
            .add(Q_pt.mul(a_hat * b_hat % Q))
            .add(H.mul(blind_fin))
        )
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
        if n >= _DEVICE_MIN:
            G_hat = ded.to_host(
                _expand(dmsm.msm(jnp.asarray(limb.ints_to_limbs(s)), G))
            )[0]
        else:
            G_hat = dmsm.vmsm(s, ded.to_host(G))
        a_hat = sum(x * y for x, y in zip(a, s)) % Q
        Gamma_hat = dmsm.vmsm(u_sq + u_inv_sq + [1], Ls + Rs + [Gamma])
        return G_hat, Gamma_hat, a_hat
