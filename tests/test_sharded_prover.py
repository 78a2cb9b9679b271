"""Sharded-vs-single-chip equality: the same NIZK proof BYTES must come
out whether or not a device mesh is active (VERDICT r1 next #3; the CPU
8-device mesh stands in for a pod slice, SURVEY §4).

Sharding is an execution-layout choice (trailing-bit table sharding +
mod-q psum round reductions + row-block MSM), never a protocol change.
"""

import pytest

from spartan_tpu import serialize as ser
from spartan_tpu.api import NIZK, NIZKGens, Instance
from spartan_tpu.core.field import Q
from spartan_tpu.core.merlin import Transcript
from spartan_tpu.parallel import context as pctx
from spartan_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.mid  # XLA-compile-heavy: run via -m mid (default tier is host-path + golden)


@pytest.fixture(scope="module")
def mesh8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return pmesh.make_mesh(8)


def _prove_bytes(inst, vars_a, inputs_a, gens, label):
    proof = NIZK.prove(inst, vars_a, inputs_a, gens,
                       Transcript(label), _tape_seed=77)
    return ser.nizk_to_bytes(proof)


def test_nizk_proof_bytes_sharded_equal(mesh8):
    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
        16, 16, 3, seed=55)
    gens = NIZKGens(16, 16, 3)

    plain = _prove_bytes(inst, vars_a, inputs_a, gens, b"shard_eq")
    with pctx.use_mesh(mesh8):
        sharded = _prove_bytes(inst, vars_a, inputs_a, gens, b"shard_eq")
    assert sharded == plain

    # and the sharded proof verifies
    proof = ser.nizk_from_bytes(sharded)
    proof.verify(inst, inputs_a, Transcript(b"shard_eq"), gens)


def test_sharded_rounds_match_reference_kernels(mesh8):
    """One quad and one cubic round on random 2^8 tables: sharded
    kernels vs the single-device kernels, exact limb equality."""
    import jax.numpy as jnp
    import numpy as np

    from spartan_tpu.ff import fq
    from spartan_tpu.poly import dense
    from spartan_tpu.parallel.mesh import ShardedSumcheckTables
    from spartan_tpu.protocols import _combs

    rng = np.random.default_rng(3)
    n = 1 << 8

    def rand_table():
        return dense.from_ints([int(x) for x in rng.integers(0, 1 << 62, n)])

    for which in ("quad", "cubic", "cubic_prod"):
        k = _combs.NTABLES[which]
        tables = [rand_table() for _ in range(k)]
        r_m = dense.from_ints([987654321])

        ref = fq.decode_to_ints(jnp.stack(
            list(_combs.evals(which, tables, fq.sum_mod)), axis=0))

        mgr = ShardedSumcheckTables(mesh8, tables, which)
        got = fq.decode_to_ints(mgr.evals())
        assert got == ref, which

        # fold once and compare next-round evals too
        es2 = fq.decode_to_ints(mgr.fold_evals(r_m))
        folded = [dense.bound_var_top(T, r_m) for T in tables]
        ref2 = fq.decode_to_ints(jnp.stack(
            list(_combs.evals(which, folded, fq.sum_mod)), axis=0))
        assert es2 == ref2, which


def test_msm_rows_blocked_matches(mesh8):
    import hashlib

    import jax.numpy as jnp
    import numpy as np

    from spartan_tpu.core import ristretto as hri
    from spartan_tpu.curve import edwards as ed
    from spartan_tpu.curve import msm as dmsm
    from spartan_tpu.curve import ristretto as dri
    from spartan_tpu.ff import limb

    rng = np.random.default_rng(9)
    L, R = 16, 16
    pts = [hri.from_uniform_bytes(hashlib.sha512(b"mrb%d" % i).digest())
           for i in range(R)]
    gens = ed.from_host(pts)
    scalars = jnp.asarray(limb.ints_to_limbs(
        [int(x) for x in rng.integers(0, 1 << 61, L * R)])).reshape(L, R, 16)

    want = dri.compress_to_bytes(dmsm.msm_rows(scalars, gens, c=4))
    got = dri.compress_to_bytes(
        pmesh.msm_rows_blocked(scalars, gens, mesh8))
    assert got == want


def test_sharded_product_layer_matches(mesh8):
    """Batched product-layer rounds (the Spark/grand-product comb):
    ShardedProductLayerTables vs the single-device kernels, exact limb
    equality through a full fold sequence (SURVEY §2 P3)."""
    import jax.numpy as jnp
    import numpy as np

    from spartan_tpu.ff import fq
    from spartan_tpu.parallel.mesh import ShardedProductLayerTables
    from spartan_tpu.poly import dense
    from spartan_tpu.protocols.product_tree import (
        _bound_var_top_batched,
        _evals_cubic_batched,
    )

    rng = np.random.default_rng(12)
    B, n = 3, 1 << 6

    def rand_batch():
        flat = dense.from_ints(
            [int(x) for x in rng.integers(0, 1 << 62, B * n)])
        return flat.reshape(B, n, 16)

    A, Bt, C = rand_batch(), rand_batch(), rand_batch()
    mgr = ShardedProductLayerTables(mesh8, A, Bt, C)
    assert mgr.sharded

    num_rounds = n.bit_length() - 1
    for k in range(num_rounds):
        got = fq.decode_to_ints(mgr.evals().reshape(3 * B, 16))
        ref = fq.decode_to_ints(jnp.stack(
            list(_evals_cubic_batched(A, Bt, C)), axis=0).reshape(3 * B, 16))
        assert got == ref, f"round {k}"
        r_m = dense.from_ints([1000003 + k])
        mgr.fold(r_m)
        A = _bound_var_top_batched(A, r_m)
        Bt = _bound_var_top_batched(Bt, r_m)
        C = _bound_var_top_batched(C, r_m)

    A2, Bt2, C2 = mgr.tables
    got_fin = fq.decode_to_ints(
        jnp.concatenate([A2[:, 0], Bt2[:, 0], C2[:, 0]], axis=0))
    ref_fin = fq.decode_to_ints(
        jnp.concatenate([A[:, 0], Bt[:, 0], C[:, 0]], axis=0))
    assert got_fin == ref_fin


def test_snark_proof_bytes_sharded_equal(mesh8):
    """Full SNARK (Spark + product trees + witness commit) under the
    mesh: byte-identical to the single-device proof, and verifies."""
    from spartan_tpu.api import SNARK, SNARKGens

    inst, vars_a, inputs_a = Instance.produce_synthetic_r1cs(
        16, 16, 3, seed=56)
    nnz = max(inst.inst.A.get_num_nz_entries(),
              inst.inst.B.get_num_nz_entries(),
              inst.inst.C.get_num_nz_entries())
    sgens = SNARKGens(16, 16, 3, nnz)

    comm, decomm = SNARK.encode(inst, sgens)
    plain = ser.snark_to_bytes(SNARK.prove(
        inst, comm, decomm, vars_a, inputs_a, sgens,
        Transcript(b"shard_eq_snark"), _tape_seed=78))
    with pctx.use_mesh(mesh8):
        comm_s, decomm_s = SNARK.encode(inst, sgens)
        sharded = ser.snark_to_bytes(SNARK.prove(
            inst, comm_s, decomm_s, vars_a, inputs_a, sgens,
            Transcript(b"shard_eq_snark"), _tape_seed=78))
    assert sharded == plain

    proof = ser.snark_from_bytes(sharded)
    proof.verify(comm, inputs_a, Transcript(b"shard_eq_snark"), sgens)
