"""Pallas fused sumcheck round kernel vs the XLA path (interpret mode
on CPU; the compiled kernel runs on real TPU only)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spartan_tpu.ff import fq, pallas_kernels as pk
from spartan_tpu.poly import dense
from spartan_tpu.protocols.sumcheck import (
    _evals_cubic_additive,
    _evals_quad,
)

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)


def _rand_table(n, seed):
    rng = np.random.default_rng(seed)
    return dense.from_ints([int(x) for x in rng.integers(0, 1 << 62, size=n)])


@pytest.mark.parametrize("n", [8, 64, 4096])
def test_fold_evals_cubic_matches_xla(n):
    tables = [_rand_table(n, i) for i in range(4)]
    r_m = dense.from_ints([987654321])

    folded_ref = [dense.bound_var_top(T, r_m) for T in tables]
    ref = _evals_cubic_additive(*folded_ref)

    got_tables, evals = pk.fold_evals(tables, r_m, interpret=True, blk=16)
    for g, w in zip(got_tables, folded_ref):
        assert fq.decode_to_ints(g) == fq.decode_to_ints(w)
    got = [evals[i] for i in range(3)]
    for g, w in zip(got, ref):
        assert fq.decode_to_ints(g[None]) == fq.decode_to_ints(w[None])


@pytest.mark.parametrize("n", [8, 256])
def test_fold_evals_quad_matches_xla(n):
    tables = [_rand_table(n, 10 + i) for i in range(2)]
    r_m = dense.from_ints([1234567])

    folded_ref = [dense.bound_var_top(T, r_m) for T in tables]
    ref = _evals_quad(*folded_ref)

    _, evals = pk.fold_evals(tables, r_m, interpret=True, blk=32)
    for i, w in enumerate(ref):
        assert (fq.decode_to_ints(evals[i][None])
                == fq.decode_to_ints(w[None]))


def test_pair_state_round_trip():
    n = 128
    tables = [_rand_table(n, 20 + i) for i in range(4)]
    r1 = dense.from_ints([111])
    r2 = dense.from_ints([222])

    # two fused rounds on pair state == two XLA rounds
    halves = []
    for T in tables:
        T0, T1 = pk.split_table(T)
        halves += [T0, T1]
    halves, _ = pk.fold_evals_pairs(halves, r1, interpret=True, blk=16)
    halves, evals = pk.fold_evals_pairs(halves, r2, interpret=True, blk=16)

    ref = tables
    ref = [dense.bound_var_top(T, r1) for T in ref]
    ref = [dense.bound_var_top(T, r2) for T in ref]
    for t in range(4):
        joined = pk.join_halves(halves[2 * t], halves[2 * t + 1])
        assert fq.decode_to_ints(joined) == fq.decode_to_ints(ref[t])
    e = _evals_cubic_additive(*ref)
    for i, w in enumerate(e):
        assert (fq.decode_to_ints(evals[i][None])
                == fq.decode_to_ints(w[None]))
