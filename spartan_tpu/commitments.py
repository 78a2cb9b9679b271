"""Pedersen commitment generators and commitment helpers.

Generator derivation mirrors the reference MultiCommitGens::new
(/root/reference/src/commitments.rs:14-33): SHAKE-256 over
(label || compressed ristretto basepoint), squeezed in 64-byte chunks,
each mapped to the group by the RFC 9496 one-way map.  Derivation is
host-side (one-time, cached); the generator vector is also materialized
as a device PointArray for MSM kernels.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import jax.numpy as jnp

from .core import edwards as hed
from .core import ristretto as hri
from .core.field import Q
from .curve import edwards as ded
from .curve import msm as dmsm
from .ff import limb


class MultiCommitGens:
    """n generators G plus blinding generator h."""

    def __init__(self, n: int, label: bytes, _points=None):
        self.n = n
        self.label = label
        if _points is None:
            _points = _derive_gens(label, n + 1)
        self.G = list(_points[:n])
        self.h = _points[n]
        self._device = None
        self._device_h = None

    @property
    def device_G(self) -> ded.PointArray:
        if self._device is None:
            self._device = ded.from_host(self.G)
        return self._device

    @property
    def device_h(self) -> ded.PointArray:
        if self._device_h is None:
            self._device_h = ded.from_host([self.h])
        return self._device_h

    def scale(self, s: int) -> "MultiCommitGens":
        """commitments.rs:43-51: scale G by s, keep h."""
        out = MultiCommitGens.__new__(MultiCommitGens)
        out.n = self.n
        out.label = self.label
        out.G = [g.mul(s % Q) for g in self.G]
        out.h = self.h
        out._device = None
        out._device_h = None
        return out

    def split_at(self, mid: int) -> tuple["MultiCommitGens", "MultiCommitGens"]:
        """commitments.rs:53-66."""
        a = MultiCommitGens.__new__(MultiCommitGens)
        a.n, a.label, a.G, a.h = mid, self.label, self.G[:mid], self.h
        a._device = a._device_h = None
        b = MultiCommitGens.__new__(MultiCommitGens)
        b.n, b.label, b.G, b.h = self.n - mid, self.label, self.G[mid:], self.h
        b._device = b._device_h = None
        return a, b


@lru_cache(maxsize=64)
def _derive_gens_cached(label: bytes, count: int) -> tuple:
    shake = hashlib.shake_256()
    shake.update(label)
    shake.update(hri.BASEPOINT_BYTES)
    stream = shake.digest(64 * count)
    return tuple(
        hri.from_uniform_bytes(stream[64 * i : 64 * i + 64]) for i in range(count)
    )


def _derive_gens(label: bytes, count: int) -> tuple:
    return _derive_gens_cached(bytes(label), count)


def commit_scalar(x: int, blind: int, gens: MultiCommitGens) -> hed.Point:
    """Scalar::commit (commitments.rs:75-80): x*G[0] + blind*h.

    Both x (a claim derived from the witness) and blind are prover
    secrets: runs on the constant-time ladder (core/edwards.py msm_ct)."""
    assert gens.n == 1
    return hed.msm_ct([x % Q, blind % Q], [gens.G[0], gens.h])


def commit_vector_host(xs, blind: int, gens: MultiCommitGens) -> hed.Point:
    """[Scalar]::commit on host (small vectors; sigma protocols).

    The vectors here are secret round-poly coefficients / sigma nonce
    vectors with a secret blind — constant-time ladder, one call."""
    assert gens.n == len(xs)
    return hed.msm_ct([x % Q for x in xs] + [blind % Q], gens.G + [gens.h])


def commit_vector_device(
    scalars_canonical: jnp.ndarray, blind: int, gens: MultiCommitGens
) -> ded.PointArray:
    """[Scalar]::commit on device: MSM over gens + blind*h."""
    n = scalars_canonical.shape[0]
    assert gens.n == n
    c = dmsm.msm(scalars_canonical, gens.device_G)
    hb = ded.from_host([gens.h.mul(blind % Q)])
    return ded.add(c, ded.PointArray(*(x[0] for x in hb)))
