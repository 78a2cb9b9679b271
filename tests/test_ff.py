"""Differential tests: device limb fields vs the python-int oracle
(spartan_tpu.core.field) on random and adversarial edge inputs —
the 'dual implementations cross-checked' pattern of the reference
(dense_mlpoly.rs:493-565 naive-vs-memoized tests)."""

import random

import jax
import numpy as np
import jax.numpy as jnp

from spartan_tpu.core.field import P25519, Q
from spartan_tpu.ff import fp25519, fq, limb

import pytest

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)

rng = random.Random(0xC0FFEE)


def rand_ints(n, m):
    edge = [0, 1, 2, m - 1, m - 2, (1 << 255) % m, (m - 1) // 2]
    return edge + [rng.randrange(m) for _ in range(n - len(edge))]


def test_limb_roundtrip():
    xs = rand_ints(64, 1 << 256)
    arr = limb.ints_to_limbs(xs)
    assert limb.limbs_to_ints(arr) == xs
    assert limb.limbs_to_int(limb.int_to_limbs(xs[7])) == xs[7]


def test_mul_wide_exact():
    xs = rand_ints(64, 1 << 256)
    ys = rand_ints(64, 1 << 256)
    a = jnp.asarray(limb.ints_to_limbs(xs))
    b = jnp.asarray(limb.ints_to_limbs(ys))
    w = limb.mul_wide(a, b)
    got = limb.limbs_to_ints(np.asarray(w))
    assert got == [x * y for x, y in zip(xs, ys)]


def test_mul_low_exact():
    xs = rand_ints(64, 1 << 256)
    ys = rand_ints(64, 1 << 256)
    a = jnp.asarray(limb.ints_to_limbs(xs))
    b = jnp.asarray(limb.ints_to_limbs(ys))
    w = limb.mul_low(a, b)
    got = limb.limbs_to_ints(np.asarray(w))
    assert got == [(x * y) % (1 << 256) for x, y in zip(xs, ys)]


def test_fq_mont_ops_vs_oracle():
    xs = rand_ints(64, Q)
    ys = rand_ints(64, Q)
    a = fq.to_mont(jnp.asarray(fq.encode_ints(xs)))
    b = fq.to_mont(jnp.asarray(fq.encode_ints(ys)))
    assert fq.decode_to_ints(fq.mul(a, b)) == [x * y % Q for x, y in zip(xs, ys)]
    assert fq.decode_to_ints(fq.add(a, b)) == [(x + y) % Q for x, y in zip(xs, ys)]
    assert fq.decode_to_ints(fq.sub(a, b)) == [(x - y) % Q for x, y in zip(xs, ys)]
    assert fq.decode_to_ints(fq.neg(a)) == [(-x) % Q for x in xs]
    assert fq.decode_to_ints(fq.square(a)) == [x * x % Q for x in xs]


def test_fq_mont_roundtrip_and_encode_mont():
    xs = rand_ints(64, Q)
    mont_host = jnp.asarray(fq.encode_ints_mont(xs))
    mont_dev = fq.to_mont(jnp.asarray(fq.encode_ints(xs)))
    assert np.array_equal(np.asarray(mont_host), np.asarray(mont_dev))
    assert fq.decode_to_ints(mont_dev) == xs


def test_fq_sum_and_dot():
    n = 1000
    xs = rand_ints(n, Q)
    ys = rand_ints(n, Q)
    a = fq.to_mont(jnp.asarray(fq.encode_ints(xs)))
    b = fq.to_mont(jnp.asarray(fq.encode_ints(ys)))
    s = fq.sum_mod(a, axis=0)
    assert fq.decode_to_ints(s[None])[0] == sum(xs) % Q
    d = fq.dot_mod(a, b, axis=0)
    assert fq.decode_to_ints(d[None])[0] == sum(x * y for x, y in zip(xs, ys)) % Q


def test_fq_inv():
    xs = [x for x in rand_ints(17, Q) if x != 0][:16]
    a = fq.to_mont(jnp.asarray(fq.encode_ints(xs)))
    assert fq.decode_to_ints(fq.inv(a)) == [pow(x, -1, Q) for x in xs]


def test_fp_ops_vs_oracle():
    xs = rand_ints(64, P25519)
    ys = rand_ints(64, P25519)
    a = jnp.asarray(fp25519.encode_ints(xs))
    b = jnp.asarray(fp25519.encode_ints(ys))
    assert fp25519.decode_to_ints(fp25519.mul(a, b)) == [
        x * y % P25519 for x, y in zip(xs, ys)
    ]
    assert fp25519.decode_to_ints(fp25519.add(a, b)) == [
        (x + y) % P25519 for x, y in zip(xs, ys)
    ]
    assert fp25519.decode_to_ints(fp25519.sub(a, b)) == [
        (x - y) % P25519 for x, y in zip(xs, ys)
    ]
    assert fp25519.decode_to_ints(fp25519.mul_small(a, 38)) == [
        x * 38 % P25519 for x in xs
    ]
    assert fp25519.decode_to_ints(fp25519.neg(a)) == [(-x) % P25519 for x in xs]


def test_fp_inv_and_sqrt_ratio():
    from spartan_tpu.core import field as F

    xs = [x for x in rand_ints(12, P25519) if x != 0]
    a = jnp.asarray(fp25519.encode_ints(xs))
    assert fp25519.decode_to_ints(fp25519.inv(a)) == [
        pow(x, -1, P25519) for x in xs
    ]

    us = rand_ints(12, P25519)
    vs = [v for v in rand_ints(13, P25519) if v != 0][:12]
    u = jnp.asarray(fp25519.encode_ints(us))
    v = jnp.asarray(fp25519.encode_ints(vs))
    ok, r = fp25519.sqrt_ratio_m1(u, v)
    ok = np.asarray(ok)
    r = fp25519.decode_to_ints(r)
    for i, (uu, vv) in enumerate(zip(us, vs)):
        ok_ref, r_ref = F.sqrt_ratio_m1(uu, vv)
        assert bool(ok[i]) == ok_ref
        assert r[i] == r_ref


def test_fp_sign_helpers():
    xs = rand_ints(32, P25519)
    a = jnp.asarray(fp25519.encode_ints(xs))
    from spartan_tpu.core import field as F

    assert list(np.asarray(fp25519.is_negative(a))) == [F.is_negative(x) for x in xs]
    assert fp25519.decode_to_ints(fp25519.ct_abs(a)) == [F.ct_abs(x) for x in xs]


def test_ops_jit_and_2d_batch():
    xs = rand_ints(24, Q)
    a = fq.to_mont(jnp.asarray(fq.encode_ints(xs))).reshape(4, 6, 16)
    f = jax.jit(lambda x: fq.mul(x, x))
    out = f(a).reshape(24, 16)
    assert fq.decode_to_ints(out) == [x * x % Q for x in xs]
