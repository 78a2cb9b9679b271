"""Two-tier (DCN x ICI) collectives vs single-device oracles, on the
8-virtual-device CPU mesh shaped (hosts=2, ici=4).  Graphs are the same
ones a real multi-host run compiles; only the transport differs."""

import hashlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spartan_tpu.core.field import Q
from spartan_tpu.core import ristretto as hri
from spartan_tpu.core.edwards import Point
from spartan_tpu.curve import edwards as ed
from spartan_tpu.ff import fq, limb
from spartan_tpu.parallel import dcn

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)


@pytest.fixture(scope="module")
def mesh2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return dcn.make_mesh2d(n_hosts=2, chips_per_host=4)


def test_mesh2d_axes(mesh2d):
    assert mesh2d.shape[dcn.DCN_AXIS] == 2
    assert mesh2d.shape[dcn.ICI_AXIS] == 4


def test_sum_mod_q_two_tier(mesh2d):
    rng = np.random.default_rng(5)
    xs = [int(x) for x in rng.integers(0, 1 << 62, size=64)]
    table = fq.to_mont(jnp.asarray(fq.encode_ints(xs)))
    got = dcn.sum_mod_q_two_tier(mesh2d)(table)
    want = fq.sum_mod(table)
    assert fq.decode_to_ints(got) == fq.decode_to_ints(want[None])


def test_msm_two_tier_vs_host(mesh2d):
    # The per-chip stage is a GSPMD row-MSM through the shared flat
    # ladder module (zero collectives); only the tiny two-tier combine
    # runs under shard_map, so this compiles in minutes, not hours.
    npts = 16
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"dcn%d" % i).digest())
           for i in range(npts)]
    rng = np.random.default_rng(6)
    ks = [int(x) for x in rng.integers(1, 1 << 61, size=npts)]
    s = jnp.asarray(limb.ints_to_limbs(ks))
    dpts = ed.from_host(pts)
    out = dcn.msm_two_tier(mesh2d)(s, dpts)
    got = ed.to_host(out)[0]
    want = Point.identity()
    for k, pt in zip(ks, pts):
        want = want.add(pt.mul(k))
    assert hri.encode(got) == hri.encode(want)
