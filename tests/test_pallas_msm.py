"""Pallas windowed row-MSM kernel vs the host oracle (interpret mode).

The compiled-Mosaic path is exercised on real hardware by bench.py /
profiler runs; CI runs the interpreter, which executes the identical
kernel trace (ref parity: group.rs:98-117, dense_mlpoly.rs:148-162)."""

import hashlib
import random

import jax.numpy as jnp

from spartan_tpu.core import ristretto as hri
from spartan_tpu.core.edwards import Point
from spartan_tpu.core.field import Q
from spartan_tpu.curve import edwards as ed
from spartan_tpu.curve import pallas_msm
from spartan_tpu.ff import limb

rng = random.Random(0xA110C)


def _rand_points(n):
    return [
        hri.from_uniform_bytes(
            hashlib.sha512(b"pp%d" % rng.randrange(1 << 30)).digest())
        for _ in range(n)
    ]


def _rand_scalars(n):
    special = [0, 1, 2, 15, 16, Q - 1]
    return (special + [rng.randrange(Q) for _ in range(n)])[:n]


def _host_msm(ks, pts):
    acc = Point.identity()
    for k, p in zip(ks, pts):
        acc = acc.add(p.mul(k))
    return hri.encode(acc)


def _check(L, R, LB, n_unroll):
    pts = _rand_points(R)
    gens = ed.from_host(pts)
    ks = _rand_scalars(L * R)
    scal = jnp.asarray(limb.ints_to_limbs(ks)).reshape(L, R, 16)
    got = ed.to_host(pallas_msm.msm_rows_pallas(
        scal, gens, LB=LB, n_unroll=n_unroll, interpret=True))
    for l in range(L):
        want = _host_msm(ks[l * R:(l + 1) * R], pts)
        assert hri.encode(got[l]) == want, f"row {l} (L={L},R={R})"


def test_pallas_msm_rows_tiny():
    _check(L=4, R=16, LB=4, n_unroll=1)


def test_pallas_msm_rows_row_pad_and_deep_tree():
    # L=3 exercises the LB row padding; R=32 exercises a longer
    # masked-roll tail (widths 8..1)
    _check(L=3, R=32, LB=2, n_unroll=2)
